"""On-TPU correctness + timing for the fused GN+Mish+mask chain and the
U-Net eval with/without it.  Amortized timing: N chained applications per
dispatch (the tunnel sync floor is ~25 ms, so single-op timings are noise).

Usage: python scripts/bench_gnmish.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=10, warmup=2):
    for _ in range(warmup):
        jax.device_get(jax.tree.leaves(fn(*args))[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(jax.tree.leaves(fn(*args))[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def main(reps=10):
    from facegantts_tpu.ops.gn_mish import _fused_chain, _xla_chain
    from facegantts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    N = 10  # chain N applications per dispatch to amortize the sync floor

    for shape, dt in [((16, 128, 436, 64), jnp.float32),
                      ((16, 128, 436, 64), jnp.bfloat16),
                      ((16, 64, 218, 128), jnp.float32),
                      ((16, 32, 109, 256), jnp.float32)]:
        b, f, t, c = shape
        x = jnp.asarray(rng.standard_normal(shape), dt)
        scale = jnp.asarray(rng.standard_normal(c) * 0.5 + 1, jnp.float32)
        bias = jnp.asarray(rng.standard_normal(c), jnp.float32)
        lens = jnp.full((b,), t - 7, jnp.int32)

        # correctness on-device
        got = jax.jit(_fused_chain, static_argnums=(4, 5))(x, scale, bias, lens, 8, 1e-5)
        want = jax.jit(_xla_chain, static_argnums=(4, 5))(x, scale, bias, lens, 8, 1e-5)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
        tol = 0.05 if dt == jnp.bfloat16 else 3e-5
        status = "OK" if err < tol else "FAIL"
        print(f"{shape} {dt.__name__}: max|err| {err:.2e} [{status}]", flush=True)

        def loop(fn):
            def body(x_):
                for _ in range(N):
                    x_ = fn(x_, scale, bias, lens, 8, 1e-5) + 0.01
                return jnp.sum(x_.astype(jnp.float32))
            return jax.jit(body)

        t_fused = timed(loop(lambda *a: _fused_chain(*a[:4], 8, 1e-5)), x, reps=reps)
        t_xla = timed(loop(lambda *a: _xla_chain(*a[:4], 8, 1e-5)), x, reps=reps)
        print(f"  chain x{N}: fused {t_fused:7.2f} ms  xla {t_xla:7.2f} ms  "
              f"-> per-op fused {(t_fused-25)/N:5.2f} xla {(t_xla-25)/N:5.2f} ms",
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
