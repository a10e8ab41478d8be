"""Worker process for the two-process ``jax.distributed`` tests.

Run as ``python tests/_mp_worker.py <process_id> <num_processes> <port>
[mode]`` inside an env produced by
``facegantts_tpu.utils.hostenv.cpu_subprocess_env`` (pure-CPU platform, N
virtual devices per process).  ``mode`` is one of:

- ``plain`` (default): one jitted plain train step (no GAN),
- ``gan``: the full fused GAN step — two optimizers, micro-batch scan,
  R1 penalty, BOTH grad trees pmean'd across the 2-process mesh,
- ``gan_fsdp``: the GAN step with cfg.fsdp=1 (ZeRO state layout).

Each process:
1. joins the jax.distributed runtime (gloo CPU collectives),
2. builds only its LOCAL block of the global batch (the BucketedLoader
   contract: identical epoch plans from the shared seed, contiguous
   per-process row blocks — data/dataset.py),
3. assembles the global sharded batch via ``shard_batch`` /
   ``jax.make_array_from_process_local_data`` with NO cross-host copies,
4. runs one jitted train step over the 2-process mesh,
5. prints the pmean'd metrics AND post-update checksums of every param
   tree (generator + discriminator in GAN modes), which must agree
   bit-for-bit across processes.

This is the executed multi-host path behind PARITY.md's distributed claim —
the TPU-native replacement for the reference's Lightning DDP process group
over BOTH its model classes (plain FaceTTS, train.py:132-143, and
FaceTTSWithDiscriminator with its two optimizers,
face_tts_w_discriminator.py:116-125) — exercised as two real OS processes
rather than one process faking a mesh."""

import sys


def main(process_id: int, num_processes: int, port: int,
         mode: str = "plain") -> None:
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
    from facegantts_tpu.train import (
        init_state,
        make_gan_train_step,
        make_plain_train_step,
    )
    from facegantts_tpu.train.state import Batch

    assert jax.process_count() == num_processes, jax.process_count()
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert n_global == n_local * num_processes

    use_gan = mode in ("gan", "gan_fsdp")
    cfg = default_config(
        env={},
        overrides=dict(
            n_enc_channels=16, filter_channels=32, filter_channels_dp=16,
            n_enc_layers=1, dec_dim=8, vid_emb_dim=32,
            use_gan=1 if use_gan else 0,
            timesteps=2, learning_rate=1e-4, spk_emb="speech",
            syncnet_width_mult=0.125, out_size=32,
            # GAN modes: tiny disc (XLA:CPU executes full-width disc
            # weight-grad convs as scalar loops — BENCH_NOTES r4), 2
            # micro-batches per device so the scan + R1 + both-tree pmean
            # all execute across the process boundary
            micro_batch_size=1, disc_base_channels=8, disc_num_layers=2,
            kernel_height=5, kernel_width=3, use_r1_penalty=1,
            fsdp=1 if mode == "gan_fsdp" else 0,
        ),
    )

    # two rows per global device in GAN modes (= 2 micro-batches of
    # micro_batch_size=1 per device); one row otherwise.  Every process
    # derives the SAME global batch from the shared seed, then keeps its
    # contiguous block — exactly the BucketedLoader process-sharding
    # contract.
    rows_per_dev = 2 if use_gan else 1
    b_global, tx, ty = n_global * rows_per_dev, 8, 32
    b_local = n_local * rows_per_dev
    rng = np.random.default_rng(0)
    x = rng.integers(1, 100, (b_global, tx)).astype(np.int32)
    y = rng.standard_normal((b_global, cfg.n_mels, ty)).astype(np.float32)
    spk = rng.standard_normal((b_global, cfg.n_mels, ty)).astype(np.float32)
    lo, hi = process_id * b_local, (process_id + 1) * b_local
    local = Batch(
        x=x[lo:hi],
        x_len=np.full(b_local, tx, np.int32),
        y=y[lo:hi],
        y_len=np.full(b_local, ty, np.int32),
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
    state = shard_state(mesh, state, fsdp=bool(cfg.fsdp))
    batch = shard_batch(mesh, local)
    assert batch.x.shape[0] == b_global, batch.x.shape

    if use_gan:
        train_step, _ = make_gan_train_step(cfg, mesh)
    else:
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

    # global checksums of the updated params: pmean'd grads => identical
    # updates on every device of every process.  GAN modes checksum BOTH
    # trees (generator + discriminator), proving the two-optimizer step's
    # two pmean'd grad trees agreed across the process boundary.  The
    # reduction runs as a jitted SPMD program: under fsdp the leaves are
    # SHARDED across both processes (non-addressable to either host), so a
    # host-side device_get cannot see them — the jitted global sum reduces
    # across the mesh and returns a fully-replicated scalar every process
    # can fetch, and which must agree bit-for-bit.
    @jax.jit
    def _tree_abs_sum(tree):
        return jax.tree.reduce(
            jnp.add,
            jax.tree.map(
                lambda l: jnp.sum(jnp.abs(l.astype(jnp.float32))), tree
            ),
        )

    def _checksum(tree) -> float:
        return float(jax.device_get(_tree_abs_sum(tree)))

    fields = [f"proc={process_id}", f"mode={mode}", f"devices={n_global}",
              f"local={n_local}", f"checksum={_checksum(state.params):.6e}"]
    if use_gan:
        fields.append(f"disc_checksum={_checksum(state.disc_params):.6e}")
    line = "MPRESULT " + " ".join(
        fields + [f"{k}={metrics[k]:.6e}" for k in sorted(metrics)]
    )
    print(line, flush=True)

    # align the processes before the coordination-service Shutdown barrier:
    # the post-step host work (device_get, printing) is unsynchronized, and
    # on a serialized single-core host the laggard can otherwise arrive at
    # shutdown after the barrier deadline
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("mp_worker_done")


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
         sys.argv[4] if len(sys.argv) > 4 else "plain")
