"""Where does the GAN train step spend its time?  Times each phase of the
step in isolation on the current device (same shapes as scripts/bench_train):

  sampler   — 10-step reverse diffusion (no grad), the D-phase's fake source
  d_grads   — discriminator loss + grad (incl. R1 grad-of-grad)
  g_grads   — generator compute_loss + grad (full-length, out_size=None)
  mas       — the monotonic-alignment DP alone at the same (B, Tx, Ty)

Usage: python scripts/profile_gan_step.py [batch] [ty] [train_bf16]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from facegantts_tpu.config import default_config
from facegantts_tpu.models.facetts import FaceTTS
from facegantts_tpu.ops.mas import maximum_path
from facegantts_tpu.train.state import Batch
from facegantts_tpu.utils.cache import enable_compilation_cache


def _sync(out):
    """Force completion: device_get a tiny slice of one leaf.  (On the axon
    tunnel jax.block_until_ready returns before execution completes; a
    device_get genuinely waits.)"""
    leaf = jax.tree.leaves(out)[0]
    jax.device_get(leaf.ravel()[:1])


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    _sync(out)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    print(f"{name:>10}: {med*1000:8.1f} ms")
    return med


def main():
    enable_compilation_cache()
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    ty = int(sys.argv[2]) if len(sys.argv) > 2 else 436
    bf16 = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    tx = 128
    cfg = default_config(env={}, overrides=dict(train_bf16=bf16))
    rng = np.random.default_rng(0)
    batch = Batch(
        x=jnp.asarray(rng.integers(1, 148, (b, tx)), jnp.int32),
        x_len=jnp.asarray(np.full(b, tx), jnp.int32),
        y=jnp.asarray(rng.standard_normal((b, cfg.n_mels, ty)).astype(np.float32) - 5.0),
        y_len=jnp.asarray(np.full(b, ty), jnp.int32),
        spk=jnp.asarray(rng.standard_normal((b, 224, 224, 3)).astype(np.float32)),
    )
    print(f"batch {b} tx={tx} ty={ty} micro={cfg.micro_batch_size} "
          f"T={cfg.timesteps} bf16={bf16} dev={jax.devices()[0]}")

    from facegantts_tpu.train.step import init_state, make_gan_train_step
    import facegantts_tpu.train.step as S

    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    model, disc = S.build_models(cfg)
    key = jax.random.PRNGKey(1)
    mb = jax.tree.map(lambda a: a[: cfg.micro_batch_size], batch)

    variables = {"params": state.params, **(state.model_state or {})}

    @jax.jit
    def sampler(params, mstate, mb, rng):
        _, dec, _, _ = model.apply(
            {"params": params, **mstate}, mb.x, mb.x_len, cfg.timesteps,
            mb.y.shape[-1], 1.0, False, mb.spk, 1.0, rng,
        )
        return dec

    fake = sampler(state.params, state.model_state, mb, key)
    timeit("sampler", sampler, state.params, state.model_state, mb, key)

    def d_loss(disc_params, y_real, f):
        _, rl = disc.apply({"params": disc_params}, y_real[..., None])
        _, fl = disc.apply({"params": disc_params}, f[..., None])
        loss = jnp.mean(jax.nn.relu(1.0 - rl)) + jnp.mean(jax.nn.relu(1.0 + fl))

        def logits_sum(y_in):
            return disc.apply({"params": disc_params}, y_in)[1].sum()

        g = jax.grad(logits_sum)(y_real[..., None])
        return loss + 0.5 * jnp.mean(jnp.sum(g**2, axis=(1, 2, 3)))

    d_grad = jax.jit(jax.grad(d_loss))
    timeit("d_grads", d_grad, state.disc_params, mb.y, fake)

    def g_loss(params, mstate, mb, rng):
        parts, _ = model.apply(
            {"params": params, **mstate}, rng, mb.x, mb.x_len, mb.y,
            mb.y_len, mb.spk, None, method=FaceTTS.compute_loss,
        )
        return parts.total

    g_grad = jax.jit(jax.grad(g_loss))
    timeit("g_grads", g_grad, state.params, state.model_state, mb, key)

    # MAS alone at micro-batch shapes
    value = jnp.asarray(rng.standard_normal((cfg.micro_batch_size, tx, ty)), jnp.float32)
    mask = jnp.ones((cfg.micro_batch_size, tx, ty), jnp.float32)
    timeit("mas", maximum_path, value, mask)

    # full step for scale (state is donated: rebuild it each call)
    step, _ = make_gan_train_step(cfg)
    s2, m = step(state, batch, key)
    _sync(m)

    def run_full(b, k):
        nonlocal s2
        s2, m = step(s2, b, k)
        return m

    timeit("full_step", run_full, batch, key, n=3)


if __name__ == "__main__":
    main()
