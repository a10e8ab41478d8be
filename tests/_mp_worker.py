"""Worker process for the two-process ``jax.distributed`` test.

Run as ``python tests/_mp_worker.py <process_id> <num_processes> <port>``
inside an env produced by ``facegantts_tpu.utils.hostenv.cpu_subprocess_env``
(pure-CPU platform, N virtual devices per process).

Each process:
1. joins the jax.distributed runtime (gloo CPU collectives),
2. builds only its LOCAL block of the global batch (the BucketedLoader
   contract: identical epoch plans from the shared seed, contiguous
   per-process row blocks — data/dataset.py),
3. assembles the global sharded batch via ``shard_batch`` /
   ``jax.make_array_from_process_local_data`` with NO cross-host copies,
4. runs one jitted plain train step over the 2-process mesh,
5. prints the pmean'd metrics, which must agree across processes.

This is the executed multi-host path behind PARITY.md's distributed claim —
the TPU-native replacement for the reference's Lightning DDP process group
(train.py:132-143), exercised as two real OS processes rather than one
process faking a mesh."""

import sys


def main(process_id: int, num_processes: int, port: int) -> None:
    import jax

    # the site hook may have pre-imported jax with the axon plugin config;
    # the config value (not the env var) decides, so pin it here
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from facegantts_tpu.utils.cache import enable_compilation_cache

    # the tiny-model compile dominates the test's ~10 min cold runtime;
    # the persistent cache (keyed per process topology) makes reruns cheap
    enable_compilation_cache()
    # single-core hosts serialize the two workers, so one can trail the
    # other by many minutes under load; stretch every liveness timeout
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
        initialization_timeout=900,
        heartbeat_timeout_seconds=900,
        shutdown_timeout_seconds=1800,
    )

    import numpy as np
    import jax.numpy as jnp

    from facegantts_tpu.config import default_config
    from facegantts_tpu.parallel import create_mesh, shard_batch, shard_state
    from facegantts_tpu.train import init_state, make_plain_train_step
    from facegantts_tpu.train.state import Batch

    assert jax.process_count() == num_processes, jax.process_count()
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert n_global == n_local * num_processes

    cfg = default_config(
        env={},
        overrides=dict(
            n_enc_channels=16, filter_channels=32, filter_channels_dp=16,
            n_enc_layers=1, dec_dim=8, vid_emb_dim=32, use_gan=0,
            timesteps=2, learning_rate=1e-4, spk_emb="speech",
            syncnet_width_mult=0.125, out_size=32,
        ),
    )

    # one row per global device; every process derives the SAME global batch
    # from the shared seed, then keeps its contiguous block — exactly the
    # BucketedLoader process-sharding contract
    b_global, tx, ty = n_global, 8, 32
    rng = np.random.default_rng(0)
    x = rng.integers(1, 100, (b_global, tx)).astype(np.int32)
    y = rng.standard_normal((b_global, cfg.n_mels, ty)).astype(np.float32)
    spk = rng.standard_normal((b_global, cfg.n_mels, ty)).astype(np.float32)
    lo, hi = process_id * n_local, (process_id + 1) * n_local
    local = Batch(
        x=x[lo:hi],
        x_len=np.full(n_local, tx, np.int32),
        y=y[lo:hi],
        y_len=np.full(n_local, ty, np.int32),
        spk=spk[lo:hi],
    )

    from jax._src import distributed as _dist

    def _barrier(name: str):
        # coordination-service barrier (NOT a gloo collective): aligns the
        # processes after big single-process work (jit compiles) so the
        # FIRST gloo collective's ~30 s context-bring-up deadline isn't
        # blown by single-core serialization of the two workers
        _dist.global_state.client.wait_at_barrier(name, 1_500_000)

    mesh = create_mesh()
    # init from the local block only — params depend on shapes + seed, not
    # row values, so all processes produce identical trees
    state = init_state(cfg, jax.random.PRNGKey(0), local)
    _barrier("mp_init_done")  # shard_state's device_put is the first collective
    state = shard_state(mesh, state)
    batch = shard_batch(mesh, local)
    assert batch.x.shape[0] == b_global, batch.x.shape

    train_step, _ = make_plain_train_step(cfg, mesh)
    # AOT-compile BEFORE the first collective execution, then align at a
    # coordination-service barrier (NOT a gloo collective): gloo context
    # bring-up has a hard ~30 s key-value rendezvous deadline, and on a
    # single-core host the serialized per-process compiles (minutes cold)
    # would otherwise leave the first process stuck in gloo init while the
    # second still compiles
    compiled = train_step.lower(state, batch, jax.random.PRNGKey(1)).compile()
    _barrier("mp_compiled")
    state, metrics = compiled(state, batch, jax.random.PRNGKey(1))
    metrics = {k: float(jax.device_get(v)) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in metrics.values()), metrics
    # addressable-shard checksum of the updated params: pmean'd grads =>
    # identical updates on every device of every process
    leaves = jax.tree.leaves(state.params)
    checksum = float(
        sum(np.sum(np.abs(np.asarray(jax.device_get(l)))) for l in leaves)
    )
    line = "MPRESULT " + " ".join(
        [f"proc={process_id}", f"devices={n_global}", f"local={n_local}",
         f"checksum={checksum:.6e}"]
        + [f"{k}={metrics[k]:.6e}" for k in sorted(metrics)]
    )
    print(line, flush=True)

    # align the processes before the coordination-service Shutdown barrier:
    # the post-step host work (device_get, printing) is unsynchronized, and
    # on a serialized single-core host the laggard can otherwise arrive at
    # shutdown after the barrier deadline
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("mp_worker_done")


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
