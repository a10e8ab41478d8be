"""Microbenchmark the U-Net score estimator and its primitive pieces at the
GAN training shape — the cost model behind kernel-fusion decisions.

Times (median of N, jax.device_get sync — block_until_ready is async on the
axon tunnel):
- full U-Net eval (B, 128, 436) in f32 and bf16 (params + inputs cast),
- a single Block chain conv3x3 -> GroupNorm(8) -> Mish -> mask at level-0
  shape, and its pieces in isolation,
- the same pieces at C=64 vs C=128 (lane-occupancy probe: TPU pads the
  minor dim to 128 lanes, so C=64 f32 tensors occupy 2x HBM bytes).

Usage: python scripts/bench_unet.py [reps] [section]
  section: "unet" (full evals + grad), "pieces" (primitive chain), "all"
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=20, warmup=2):
    """fn must return a SCALAR (or tiny) value: device_get of a large output
    pays the tunnel transfer (~200 MB/s), swamping compute time."""
    for _ in range(warmup):
        jax.device_get(jax.tree.leaves(fn(*args))[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(jax.tree.leaves(fn(*args))[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def scalarize(fn):
    """Wrap fn so every float output is reduced to one scalar on-device."""
    def wrapped(*args):
        out = fn(*args)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree.leaves(out))
    return wrapped


def main(reps=20, section="all"):
    from facegantts_tpu.config import default_config
    from facegantts_tpu.models.unet import GradLogPEstimator2d, mish
    from facegantts_tpu.utils.cache import enable_compilation_cache
    from flax import linen as nn

    enable_compilation_cache()
    cfg = default_config(env={})
    b, f, t = cfg.micro_batch_size, cfg.n_mels, 436
    print(f"device: {jax.devices()[0].device_kind}; shape B={b} F={f} T={t}",
          flush=True)

    rng = jax.random.PRNGKey(0)
    unet = GradLogPEstimator2d(
        dim=cfg.dec_dim, groups=8, multi_spks=cfg.multi_spks,
        spk_emb_dim=cfg.vid_emb_dim, n_feats=cfg.n_mels, pe_scale=1000.0,
    )
    x = jax.random.normal(rng, (b, f, t))
    mu = jax.random.normal(rng, (b, f, t))
    mask = jnp.ones((b, 1, t))
    tt = jnp.full((b,), 0.5)
    spk = jax.random.normal(rng, (b, cfg.vid_emb_dim))
    params = unet.init(rng, x, mask, mu, tt, spk)

    def cast(tree, dt):
        return jax.tree.map(
            lambda a: a.astype(dt)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, tree)

    if section in ("unet", "all"):
        eval_f32 = jax.jit(scalarize(lambda p, *a: unet.apply(p, *a)))
        eval_bf16 = jax.jit(scalarize(
            lambda p, *a: unet.apply(cast(p, jnp.bfloat16),
                                     *[cast(v, jnp.bfloat16) for v in a])))
        print(f"unet eval f32 : {timeit(eval_f32, params, x, mask, mu, tt, spk, reps=reps):8.2f} ms", flush=True)
        print(f"unet eval bf16: {timeit(eval_bf16, params, x, mask, mu, tt, spk, reps=reps):8.2f} ms", flush=True)

        # grad of a scalar loss through the U-Net (the g_grads inner shape)
        def loss(p, *a):
            return jnp.mean(jnp.square(unet.apply(p, *a)))
        grad_f32 = jax.jit(scalarize(lambda p, *a: jax.grad(loss)(p, *a)))
        print(f"unet grad f32 : {timeit(grad_f32, params, x, mask, mu, tt, spk, reps=max(5, reps // 2)):8.2f} ms", flush=True)

    if section not in ("pieces", "all"):
        return
    # ---- primitive pieces at level-0 and level-1 channel widths ----
    for c in (64, 128):
        h = jax.random.normal(rng, (b, f, t, c))
        m4 = jnp.ones((b, 1, t, 1))
        conv = nn.Conv(c, (3, 3), padding="SAME")
        cp = conv.init(rng, h)
        gn = nn.GroupNorm(num_groups=8)
        gp = gn.init(rng, h)

        conv_j = jax.jit(scalarize(lambda p, a: conv.apply(p, a)))
        gn_j = jax.jit(scalarize(lambda p, a: gn.apply(p, a)))
        mish_j = jax.jit(scalarize(mish))
        mask_j = jax.jit(scalarize(lambda a, mm: a * mm))
        chain_j = jax.jit(scalarize(
            lambda p, q, a, mm: mish(gn.apply(q, conv.apply(p, a * mm))) * mm))
        stats_j = jax.jit(scalarize(
            lambda a: (jnp.mean(a.reshape(b, -1, 8, c // 8), axis=(1, 3)),
                       jnp.mean(jnp.square(a.reshape(b, -1, 8, c // 8)), axis=(1, 3)))))

        gb = h.size * h.dtype.itemsize / 1e9
        print(f"C={c}: tensor {gb*1e3:.0f} MB", flush=True)
        print(f"  conv3x3      : {timeit(conv_j, cp, h, reps=reps):8.2f} ms", flush=True)
        print(f"  groupnorm    : {timeit(gn_j, gp, h, reps=reps):8.2f} ms", flush=True)
        print(f"  gn stats only: {timeit(stats_j, h, reps=reps):8.2f} ms", flush=True)
        print(f"  mish         : {timeit(mish_j, h, reps=reps):8.2f} ms", flush=True)
        print(f"  mask mul     : {timeit(mask_j, h, m4, reps=reps):8.2f} ms", flush=True)
        print(f"  full chain   : {timeit(chain_j, cp, gp, h, m4, reps=reps):8.2f} ms", flush=True)
        hb = h.astype(jnp.bfloat16)
        chain_bf = jax.jit(scalarize(
            lambda p, q, a, mm: mish(gn.apply(cast(q, jnp.bfloat16),
                                              conv.apply(cast(p, jnp.bfloat16), a * mm))) * mm))
        print(f"  chain bf16   : {timeit(chain_bf, cp, gp, hb, m4.astype(jnp.bfloat16), reps=reps):8.2f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20,
         sys.argv[2] if len(sys.argv) > 2 else "all")
