"""Fused GroupNorm statistics as a Pallas TPU kernel.

The U-Net Blocks (reference baseblock.py:42-51) run GroupNorm(8) over
(B, F, T, C) activations with C = 64/128 at the full mel resolution.  XLA's
stats reduction for this shape runs at ~240 GB/s on v5e (the C-minor lane
axis is only half occupied at C=64, and the tuple-reduce fusion adds
overhead): ~1.7 ms at (16, 27904, 128)-rows equivalent for a pass whose
plain-sum bandwidth is ~0.95 ms (measured on-chip).

The kernel reads the tensor through a FREE reshape to (B, R, 128) rows —
row-major (F, T, C) flattening packs 128/C channel vectors per 128-lane row,
so every lane l always holds channel l % C — and accumulates per-lane
sum/sum-of-squares at full VPU width.  Lane sums fold to per-channel and
then per-group statistics in a tiny XLA epilogue.

Only the statistics REDUCTION is platform-gated (lax.platform_dependent →
Pallas on TPU, jnp reductions elsewhere); the epilogue and the normalize
multiply-add stay in the caller's graph so XLA fuses them into the
following Mish/mask pass exactly as it does for the plain implementation.
The backward runs the plain-XLA reference implementation through jax.vjp —
gradients are exactly those of the reference math.

Applicability: C must divide 128 and F*T*C must be a multiple of 1024
(128 lanes × a row tile that is a multiple of 8); other shapes (and
non-TPU backends) take the pure-XLA path.

MEASURED VERDICT (axon v5e, 2026-08-17): standalone, the kernel beats XLA's
sum+sumsq reduction (0.96 vs 1.66 ms at (16, 27904, 128)) — but inside the
U-Net the per-pallas-call overhead and the fusion/pipeline break around the
kernel cost more than the reduction win at every model shape (whole U-Net
eval b=16 T=436: 41.7 ms with nn.GroupNorm vs 61.0 ms with this; b=1 T=436:
3.6 vs 6.5 ms).  The models therefore use plain nn.GroupNorm; this op stays
as tested infrastructure (models/unet.py:FusedGroupNorm) for backends or
batch regimes where a standalone stats kernel wins.
"""

import functools

import jax
import jax.numpy as jnp


def _xla_group_norm(x, scale, bias, num_groups: int, eps: float):
    """Reference implementation (identical math to flax nn.GroupNorm:
    biased variance over (F, T, C//G) per (B, G), affine per channel)."""
    b, f, t, c = x.shape
    xg = x.reshape(b, f, t, num_groups, c // num_groups).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 2, 4), keepdims=True)
    xn = (xg - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(b, f, t, c)
    return (xn * scale + bias).astype(x.dtype)


def _pick_row_tile(rows: int) -> int:
    """Largest divisor of `rows` that is a multiple of 8 and <= 4096."""
    best = 0
    for cand in range(8, 4097, 8):
        if rows % cand == 0:
            best = cand
    return best


def _vma_of(x):
    """Mesh axes `x` varies over (inside shard_map); empty set outside."""
    try:
        return jax.typeof(x).vma
    except Exception:
        return frozenset()


def _pallas_lane_sums(x2, row_tile: int, interpret: bool = False):
    """(B, R, 128) -> (B, 2, 128) per-lane (sum, sum-of-squares) over rows."""
    from jax.experimental import pallas as pl

    b, rows, _ = x2.shape

    def kernel(x_ref, out_ref):
        j = pl.program_id(1)
        tile = x_ref[0].astype(jnp.float32)

        @pl.when(j == 0)
        def _():
            out_ref[0] = jnp.zeros_like(out_ref[0])

        s = jnp.sum(tile, axis=0)
        s2 = jnp.sum(tile * tile, axis=0)
        out_ref[0] = out_ref[0] + jnp.stack([s, s2], axis=0)

    return pl.pallas_call(
        kernel,
        grid=(b, rows // row_tile),
        in_specs=[
            pl.BlockSpec((1, row_tile, 128), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, 128), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 2, 128), jnp.float32, vma=_vma_of(x2)),
        interpret=interpret,
    )(x2)


def _xla_lane_sums(x2, row_tile: int = 0):
    xf = x2.astype(jnp.float32)
    return jnp.stack(
        [jnp.sum(xf, axis=1), jnp.sum(xf * xf, axis=1)], axis=1
    )


def _shape_supported(x) -> bool:
    b, f, t, c = x.shape
    if c > 128 or 128 % c != 0 or (f * t * c) % 128 != 0:
        return False
    return _pick_row_tile(f * t * c // 128) > 0


def _fast_group_norm(x, scale, bias, num_groups: int, eps: float,
                     interpret: bool = False):
    b, f, t, c = x.shape
    n_lanes = 128 // c  # channel vectors per 128-lane row
    rows = f * t * c // 128
    row_tile = _pick_row_tile(rows)
    x2 = x.reshape(b, rows, 128)
    # Platform selection at LOWERING time: `jax.default_backend()` is
    # unreliable here (under the axon tunnel the process default stays "tpu"
    # even when computations are pinned to CPU devices), and a trace-time
    # check would bake the wrong branch into a jit that later runs on a
    # different platform.  Only the reduction is gated; everything below
    # stays in the caller's graph so XLA fuses the normalize into consumers.
    if interpret:
        sums = _pallas_lane_sums(x2, row_tile, interpret=True)
    else:
        sums = jax.lax.platform_dependent(
            x2,
            tpu=functools.partial(_pallas_lane_sums, row_tile=row_tile),
            default=functools.partial(_xla_lane_sums, row_tile=row_tile),
        )
    # lane l holds channel l % c: fold replicas, then channels -> groups
    per_chan = sums.reshape(b, 2, n_lanes, c).sum(axis=2)  # (B, 2, C)
    per_group = per_chan.reshape(b, 2, num_groups, c // num_groups).sum(-1)
    n_elems = f * t * (c // num_groups)
    mean_g = per_group[:, 0] / n_elems  # (B, G)
    var_g = per_group[:, 1] / n_elems - jnp.square(mean_g)
    inv = jax.lax.rsqrt(var_g + eps)
    # per-channel affine folded with the group stats: y = x*a + bb
    mean_c = jnp.repeat(mean_g, c // num_groups, axis=1)  # (B, C)
    inv_c = jnp.repeat(inv, c // num_groups, axis=1)
    a = inv_c * scale[None, :]
    bb = bias[None, :] - mean_c * a
    y = x * a[:, None, None, :].astype(x.dtype) + bb[:, None, None, :].astype(x.dtype)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def group_norm(x, scale, bias, num_groups: int = 8, eps: float = 1e-6):
    """GroupNorm over NHWC with per-channel affine, Pallas-accelerated stats
    on TPU, exact flax/torch GroupNorm semantics."""
    if not _shape_supported(x):
        return _xla_group_norm(x, scale, bias, num_groups, eps)
    return _fast_group_norm(x, scale, bias, num_groups, eps)


def _gn_fwd(x, scale, bias, num_groups, eps):
    return group_norm(x, scale, bias, num_groups, eps), (x, scale, bias)


def _gn_bwd(num_groups, eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _xla_group_norm(x_, s_, b_, num_groups, eps),
        x, scale, bias,
    )
    return vjp(g)


group_norm.defvjp(_gn_fwd, _gn_bwd)
