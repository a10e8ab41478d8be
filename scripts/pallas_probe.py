"""Probe Pallas/Mosaic support on the current TPU backend.

Runs a trivial VMEM kernel and a small fori_loop DP kernel; prints timings.
Used to qualify the backend before moving hot ops to Pallas.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_trivial():
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0 + 1.0

    x = jnp.ones((256, 256), jnp.float32)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    out = run(x)
    np.testing.assert_allclose(np.asarray(out), np.full((256, 256), 3.0))
    print("trivial VMEM kernel: OK")


def probe_dp_loop(b=8, tx=128, ty=256):
    """Column-scan DP in one kernel (the MAS access pattern).

    Layout (T_y, B, T_x): the scanned axis leads so dynamic indexing never
    touches the 128-lane dimension (Mosaic requires lane indices to be
    multiples of 128)."""

    def kernel(v_ref, o_ref):
        def body(y, carry):
            prev = carry  # (b, tx)
            col = v_ref[y]
            shifted = pltpu.roll(prev, 1, axis=1)
            new = col + jnp.maximum(prev, shifted)
            o_ref[y] = new
            return new

        init = jnp.zeros((v_ref.shape[1], v_ref.shape[2]), jnp.float32)
        jax.lax.fori_loop(0, v_ref.shape[0], body, init)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((ty, b, tx)), jnp.float32)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    out = run(x)
    jax.block_until_ready(out)
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x))
        times.append(time.perf_counter() - t0)
    print(f"fori_loop DP kernel ({b}x{tx}x{ty}): {np.median(times)*1e3:.2f} ms")


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    probe_trivial()
    probe_dp_loop()
