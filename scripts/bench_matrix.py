#!/usr/bin/env python
"""GAN-step config matrix on the real chip: time each candidate config in a
fresh subprocess and print a ranked table.

Usage:  python scripts/bench_matrix.py [n_iters=5] [configs=a,b,...]

Candidates (queued perf experiments; BENCH_NOTES.md round-2):
  base               defaults (f32 master, backend auto-bf16 convs)
  train_bf16         whole step in bf16 compute (bandwidth-bound GroupNorm
                     should gain most)
  sampler_bf16       only the D/G fake-mel sampler in bf16
  both_bf16          train_bf16 + gan_sampler_bf16

Each config runs in its own process so jit caches, donation, and backend
state can't leak between timings; the winner's flags can then be flipped as
defaults after a parity check.  One config at a time — NEVER run this
concurrently with CPU-heavy work (1-core host contaminates timings).
"""

import json
import os
import subprocess
import sys

CONFIGS = {
    "base": {},
    "train_bf16": {"train_bf16": "1"},
    "sampler_bf16": {"gan_sampler_bf16": "1"},
    "both_bf16": {"train_bf16": "1", "gan_sampler_bf16": "1"},
    "unroll2": {"sampler_unroll": "2"},
    "unroll5": {"sampler_unroll": "5"},
    "sbf16_unroll2": {"gan_sampler_bf16": "1", "sampler_unroll": "2"},
    "sbf16_unroll5": {"gan_sampler_bf16": "1", "sampler_unroll": "5"},
    "micro_unroll": {"micro_unroll": "2"},
    "micro_sbf16": {"micro_unroll": "2", "gan_sampler_bf16": "1"},
    "nofused": {"fused_gn_mish": "0"},
    "fused": {"fused_gn_mish": "1"},
    "dfake_t5": {"disc_fake_timesteps": "5"},
    "dfake_t4": {"disc_fake_timesteps": "4"},
    "dfake_t5_nofused": {"disc_fake_timesteps": "5", "fused_gn_mish": "0"},
    # r4: with AUTO-4 training fakes the grad phases are ~70% of the step
    "t4_trainbf16": {"train_bf16": "1"},
    "t4_micro2": {"micro_unroll": "2"},
    "t4_discbf16": {"disc_bf16": "1"},
    "base_r4": {},
    "t4_remat": {"grad_remat": "1"},
    "t4_remat_micro2": {"grad_remat": "1", "micro_unroll": "2"},
    # r5: the lane-aligned patchify U-Net family (config.py unet_family) —
    # the architectural lever against the parity family's C=64 f32
    # lane-padding tax (BENCH_NOTES r4 conclusion)
    "tpu_opt": {"unet_family": "tpu_opt"},
    "tpu_opt_mb32": {"unet_family": "tpu_opt", "micro_batch_size": "32"},
    "tpu_opt_tbf16": {"unet_family": "tpu_opt", "train_bf16": "1"},
    "base_r5": {},
    # r5b: lane-aligned discriminator on top of the tpu_opt generator —
    # the trace showed the parity D's 64x64ch convs at ~12% of MXU peak
    "dopt": {"unet_family": "tpu_opt", "disc_family": "tpu_opt"},
    "dopt_only": {"disc_family": "tpu_opt"},
    "dopt_tbf16": {"unet_family": "tpu_opt", "disc_family": "tpu_opt",
                   "train_bf16": "1"},
    "dopt_dbf16": {"unet_family": "tpu_opt", "disc_family": "tpu_opt",
                   "disc_bf16": "1"},
    "dopt_mb8": {"unet_family": "tpu_opt", "disc_family": "tpu_opt",
                 "micro_batch_size": "8"},
    # r5c: opt-in 2-s crop for the GAN G-phase compute_loss (config.py
    # gan_g_crop) — shrinks the G-phase U-Net/SyncNet passes from the
    # bucket length to 128 frames; adv/D phases unchanged
    "dopt_gcrop": {"unet_family": "tpu_opt", "disc_family": "tpu_opt",
                   "gan_g_crop": "1"},
}

CHILD = r"""
import json, os, sys, time
import numpy as np
import jax, jax.numpy as jnp
from facegantts_tpu.config import default_config
from facegantts_tpu.train import init_state, make_gan_train_step
from facegantts_tpu.train.state import Batch
from facegantts_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
overrides = json.loads(os.environ["BM_OVERRIDES"])
n_iters = int(os.environ.get("BM_ITERS", "5"))
cfg = default_config(env={}, overrides=overrides)
b, tx, ty = cfg.micro_batch_size * 2, 128, 436
rng = np.random.default_rng(0)
batch = Batch(
    x=jnp.asarray(rng.integers(1, 148, (b, tx)), jnp.int32),
    x_len=jnp.asarray(np.full(b, tx), jnp.int32),
    y=jnp.asarray(rng.standard_normal((b, cfg.n_mels, ty)), jnp.float32),
    y_len=jnp.asarray(np.full(b, ty), jnp.int32),
    spk=jnp.asarray(rng.standard_normal((b, 224, 224, 3)), jnp.float32),
)
state = init_state(cfg, jax.random.PRNGKey(0), batch)
step, _ = make_gan_train_step(cfg)
t0 = time.perf_counter()
compiled = step.lower(state, batch, jax.random.PRNGKey(1)).compile()
print(f"compile {time.perf_counter()-t0:.1f}s", file=sys.stderr)
state, m = compiled(state, batch, jax.random.PRNGKey(1))
float(m["g_loss"])  # sync (block_until_ready is async through the tunnel)
times = []
for i in range(n_iters):
    t0 = time.perf_counter()
    state, m = compiled(state, batch, jax.random.PRNGKey(i))
    float(m["g_loss"])
    times.append(time.perf_counter() - t0)
sec = float(np.median(times))
print(json.dumps({"step_ms": round(sec * 1e3, 1),
                  "samples_per_sec": round(b / sec, 2),
                  "g_loss": round(float(m["g_loss"]), 4),
                  "diff_loss": round(float(m["diffusion_loss"]), 4)}))
"""


def main(argv=None):
    kv = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    n_iters = kv.get("n_iters", "5")
    names = kv.get("configs", ",".join(CONFIGS)).split(",")
    results = {}
    for name in names:
        env = dict(os.environ, BM_OVERRIDES=json.dumps(CONFIGS[name]),
                   BM_ITERS=n_iters)
        # optional per-run XLA flag experiments: BM_XLA_FLAGS is appended
        # to the child's XLA_FLAGS (unknown flags fail fast in the child)
        if os.environ.get("BM_XLA_FLAGS"):
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " "
                                + os.environ["BM_XLA_FLAGS"]).strip()
        print(f"=== {name}: {CONFIGS[name]}", flush=True)
        out = subprocess.run([sys.executable, "-c", CHILD], env=env,
                             capture_output=True, text=True, timeout=3600)
        sys.stderr.write(out.stderr[-2000:])
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        try:
            results[name] = json.loads(line)
        except json.JSONDecodeError:
            results[name] = {"error": f"rc={out.returncode}"}
        print(f"    -> {results[name]}", flush=True)
    print("\nconfig            step_ms   samples/s")
    for name, r in sorted(results.items(),
                          key=lambda kv: kv[1].get("step_ms", 1e9)):
        print(f"{name:16s} {r.get('step_ms', '-'):>9} {r.get('samples_per_sec', '-'):>10}")
    return results


if __name__ == "__main__":
    main()
