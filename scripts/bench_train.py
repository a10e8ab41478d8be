"""GAN train-step throughput on the current device at reference scale.

Reference scale: full model dims, per-device batch 64 (= reference per-GPU
batch at global 256 over 4 GPUs), micro-batch 16, T=10 diffusion steps,
2-second crops bucketed at Ty=128... note the reference GAN G-phase runs
full-length; we bench at Ty=436 (median LRS2 clip) to match its cost.

Usage: bench_train.py [batch] [ty] [train_bf16] [gan_sampler_bf16]

Timing note: on the axon tunnel `jax.block_until_ready` returns before
remote execution completes, so each iteration syncs by pulling one scalar
metric to the host (`float(...)` -> device_get), same as bench.py.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from facegantts_tpu.config import default_config
from facegantts_tpu.train import Batch, init_state, make_gan_train_step
from facegantts_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    ty = int(sys.argv[2]) if len(sys.argv) > 2 else 436
    bf16 = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    sampler_bf16 = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    tx = 128
    cfg = default_config(
        env={}, overrides=dict(train_bf16=bf16, gan_sampler_bf16=sampler_bf16)
    )
    rng = np.random.default_rng(0)
    batch = Batch(
        x=jnp.asarray(rng.integers(1, 148, (b, tx)), jnp.int32),
        x_len=jnp.asarray(np.full(b, tx), jnp.int32),
        y=jnp.asarray(rng.standard_normal((b, cfg.n_mels, ty)).astype(np.float32) - 5.0),
        y_len=jnp.asarray(np.full(b, ty), jnp.int32),
        spk=jnp.asarray(rng.standard_normal((b, 224, 224, 3)).astype(np.float32)),
    )
    print(f"batch {b} x (tx={tx}, ty={ty}), micro {cfg.micro_batch_size}, "
          f"T={cfg.timesteps}, train_bf16={cfg.train_bf16}, "
          f"gan_sampler_bf16={cfg.gan_sampler_bf16}, "
          f"device {jax.devices()[0]}", flush=True)
    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    step, _ = make_gan_train_step(cfg)
    t0 = time.time()
    state, m = step(state, batch, jax.random.PRNGKey(1))
    float(m["g_loss"])  # device_get sync
    print(f"compile+first step: {time.time()-t0:.0f}s", flush=True)
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        state, m = step(state, batch, jax.random.PRNGKey(2 + i))
        float(m["g_loss"])  # device_get sync
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    print(f"GAN train step: {med*1000:.0f} ms -> {1/med:.3f} steps/s, "
          f"{b/med:.1f} samples/s", flush=True)
    print({k: round(float(v), 4) for k, v in m.items()}, flush=True)


if __name__ == "__main__":
    main()
