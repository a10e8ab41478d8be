"""Whole-chain fused GroupNorm -> Mish -> time-mask as one Pallas TPU kernel.

The U-Net Block (reference baseblock.py:42-51) is conv3x3 -> GroupNorm(8) ->
Mish, masked; at the full mel resolution its activations are
(B, 128, 436, 64) — C=64 on a 128-lane minor axis, so every XLA elementwise
or reduce pass over the natural NHWC form pays ~2x memory traffic for the
lane padding, and the GroupNorm tuple-reduction runs 5-8x below HBM
speed-of-light (BENCH_NOTES r3 device trace).  The round-3 stats-only Pallas
kernel (ops/groupnorm.py) beat XLA's reduction standalone but LOST inside
the model: the normalize/Mish/mask work stayed in XLA, so the kernel only
added a pipeline break.

This kernel fuses the ENTIRE post-conv chain — statistics, normalize,
per-channel affine, Mish, and the time mask — into ONE pallas_call over the
lane-packed (B, R, 128) row view (row-major (F, T, C) flattening packs
128/C channel vectors per 128-lane row, so lane occupancy is 100% for every
C dividing or divided by 128):

  grid (B, 2 phases, R/row_tile):
    phase 0: accumulate per-(lane, row-parity) sum / sum-of-squares over the
             batch item's rows into VMEM scratch (full VPU width).
    transition (first phase-1 step): fold lanes -> channels -> groups with
             ONE tiny (2,128)x(128,128) MXU matmul against a constant
             group-indicator matrix; produce per-lane scale `a` and shift
             `bb` (the GroupNorm affine folded with the group statistics).
    phase 1: re-read each tile, y = mish(x*a + bb) * (t < len), write out.

Traffic is 2 reads + 1 write of the PACKED tensor per call — XLA's separate
stats + normalize passes move the same logical bytes but over the padded
layout and split across several fusions.  The time mask is computed
in-kernel from the sequence length (t = (linear_index // C) mod T compared
against a scalar-prefetched per-batch length) — the model only ever masks
by sequence length (ops/align.py sequence_mask; reference model/utils.py:6),
so no mask tensor is read at all.

GroupNorm semantics match torch/flax exactly (biased variance over
(F, T, C//G) per (B, G), per-channel affine, eps inside rsqrt); Mish uses
the rational-exp form (models/unet.py mish, <4e-6 abs of the textbook
form).  The backward runs the plain-XLA reference chain through jax.vjp
(custom_vjp below) — gradients are exactly those of the reference math, and
the no-grad GAN fake sampler (20 forward U-Net evals per step) never runs
it.

Supported shapes: C in {64, 128, 256} (n_par = C//128 row parities when
C > 128), F*T*C a multiple of 128, and a row count with a divisor that is a
multiple of 8 (16 for bf16); anything else — and every non-TPU platform —
takes the pure-XLA path via lax.platform_dependent.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _mish_f32(x):
    """Rational-exp Mish on f32 (models/unet.py mish, same clamp/grouping)."""
    u = jnp.exp(jnp.minimum(x, 20.0))
    n = u * (u + 2.0)
    return jnp.where(x > 20.0, x, x * (n / (n + 2.0)))


def _xla_chain(x, scale, bias, lens, num_groups: int, eps: float):
    """Reference math: mish(GroupNorm(x)) * time-mask, all in XLA."""
    b, f, t, c = x.shape
    xg = x.reshape(b, f, t, num_groups, c // num_groups).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 2, 4), keepdims=True)
    xn = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(b, f, t, c)
    y = _mish_f32(xn * scale + bias)
    mask = (jnp.arange(t)[None, :] < lens[:, None]).astype(jnp.float32)
    return (y * mask[:, None, :, None]).astype(x.dtype)


def _pick_row_tile(rows: int, min_mult: int) -> int:
    # cap 1792 rows: the double-buffered in/out blocks PLUS the kernel-body
    # temporaries (f32 tile, normalized tile, iota/t-index intermediates —
    # Mosaic stack-allocates them all) must fit the 16 MB scoped-VMEM limit
    best = 0
    for cand in range(min_mult, 1793, min_mult):
        if rows % cand == 0:
            best = cand
    return best


def _vma_of(x):
    try:
        return jax.typeof(x).vma
    except Exception:
        return frozenset()


def _group_matrix(c: int, num_groups: int) -> np.ndarray:
    """(128, 128) indicator: lanes of the same (parity-local) group.

    For C <= 128 lane l holds channel l % C; for C == 256 lane l holds
    channel p*128 + l and groups never span parities (C//G >= 32 divides
    128), so the SAME lane-local matrix serves every parity."""
    lanes = np.arange(128)
    if c <= 128:
        gid = (lanes % c) // (c // num_groups)
    else:
        # groups are 32+ channels wide, so parity blocks of 128 lanes land on
        # group boundaries and the lane-local id is parity-independent
        gid = lanes // (c // num_groups)
    return (gid[:, None] == gid[None, :]).astype(np.float32)


def _lane_affine(scale, bias, c: int):
    """Per-(parity, lane) scale/bias rows: (n_par, 128) each."""
    n_par = max(1, c // 128)
    reps = max(1, 128 // c)
    s = jnp.tile(scale.astype(jnp.float32), reps).reshape(n_par, 128)
    b = jnp.tile(bias.astype(jnp.float32), reps).reshape(n_par, 128)
    return s, b


def _fused_chain(x, scale, bias, lens, num_groups: int, eps: float,
                 interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, f, t, c = x.shape
    n_par = max(1, c // 128)
    rows = f * t * c // 128
    min_mult = 16 if x.dtype == jnp.bfloat16 else 8
    row_tile = _pick_row_tile(rows, min_mult)
    n_tiles = rows // row_tile
    x2 = x.reshape(b, rows, 128)
    gmat = jnp.asarray(_group_matrix(c, num_groups))
    s_pl, b_pl = _lane_affine(scale, bias, c)
    sb = jnp.concatenate([s_pl, b_pl], axis=0)  # (2*n_par, 128)
    n_elems = float(f * t * (c // num_groups))
    lens = lens.astype(jnp.int32)

    def kernel(lens_ref, x_ref, g_ref, sb_ref, o_ref, sums_ref, ab_ref):
        bi = pl.program_id(0)
        ph = pl.program_id(1)
        ti = pl.program_id(2)
        tile = x_ref[0].astype(jnp.float32)  # (row_tile, 128)

        @pl.when(jnp.logical_and(ph == 0, ti == 0))
        def _zero():
            sums_ref[...] = jnp.zeros_like(sums_ref)

        @pl.when(ph == 0)
        def _accumulate():
            if n_par == 1:
                s = jnp.sum(tile, axis=0)
                s2 = jnp.sum(tile * tile, axis=0)
                sums_ref[0, :] = sums_ref[0, :] + s
                sums_ref[n_par, :] = sums_ref[n_par, :] + s2
            else:
                rp = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 0) % 2
                for p in range(n_par):
                    m = (rp == p).astype(jnp.float32)
                    tp = tile * m
                    sums_ref[p, :] = sums_ref[p, :] + jnp.sum(tp, axis=0)
                    sums_ref[n_par + p, :] = (
                        sums_ref[n_par + p, :] + jnp.sum(tp * tile, axis=0)
                    )

        @pl.when(jnp.logical_and(ph == 1, ti == 0))
        def _fold():
            # (2*n_par, 128) @ (128, 128): per-lane group totals (one MXU op).
            # HIGHEST precision: the default TPU matmul truncates f32 inputs
            # to bf16, and the raw sums (~1e4-1e5) lose ~0.4% — enough to put
            # 3e-3 of error on the normalized output (measured on v5e).
            g = jnp.dot(sums_ref[...], g_ref[...],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            for p in range(n_par):
                mean = g[p, :] / n_elems
                var = g[n_par + p, :] / n_elems - mean * mean
                inv = jax.lax.rsqrt(var + eps)
                a = inv * sb_ref[p, :]
                ab_ref[p, :] = a
                ab_ref[n_par + p, :] = sb_ref[n_par + p, :] - mean * a

        @pl.when(ph == 1)
        def _normalize():
            i2 = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 0)
            j2 = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1)
            if n_par == 1:
                a = ab_ref[0, :][None, :]
                bb = ab_ref[1, :][None, :]
            else:
                rp = i2 % 2
                a = jnp.where(rp == 0, ab_ref[0, :][None, :], ab_ref[1, :][None, :])
                bb = jnp.where(rp == 0, ab_ref[2, :][None, :], ab_ref[3, :][None, :])
            y = _mish_f32(tile * a + bb)
            lin = (ti * row_tile + i2) * 128 + j2
            t_idx = (lin // c) % t
            y = jnp.where(t_idx < lens_ref[bi], y, 0.0)
            o_ref[0] = y.astype(o_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, 2, n_tiles),
        in_specs=[
            # phase 0 and 1 both walk the tiles in order
            pl.BlockSpec((1, row_tile, 128), lambda bi, ph, ti, lens: (bi, ti, 0)),
            pl.BlockSpec((128, 128), lambda bi, ph, ti, lens: (0, 0)),
            pl.BlockSpec((2 * n_par, 128), lambda bi, ph, ti, lens: (0, 0)),
        ],
        # phase 0 parks the (unwritten) output block on tile 0 so nothing is
        # flushed until phase 1 rewrites it; phase 1 walks tiles in order
        out_specs=pl.BlockSpec(
            (1, row_tile, 128), lambda bi, ph, ti, lens: (bi, ti * ph, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * n_par, 128), jnp.float32),
            pltpu.VMEM((2 * n_par, 128), jnp.float32),
        ],
    )
    y2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, rows, 128), x.dtype, vma=_vma_of(x2)),
        interpret=interpret,
    )(lens, x2, gmat, sb)
    return y2.reshape(b, f, t, c)


def _shape_supported(x) -> bool:
    b, f, t, c = x.shape
    if c not in (64, 128, 256):
        return False
    if (f * t * c) % 128 != 0:
        return False
    min_mult = 16 if x.dtype == jnp.bfloat16 else 8
    rows = f * t * c // 128
    rt = _pick_row_tile(rows, min_mult)
    if rt == 0:
        return False
    if c == 256 and rt % 2 != 0:
        return False  # parity accounting needs whole row pairs per tile
    return True


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def gn_mish_mask(x, scale, bias, lens, num_groups: int = 8,
                 eps: float = 1e-5):
    """mish(GroupNorm(x; scale, bias)) * (t < lens) over NHWC.

    x: (B, F, T, C); scale/bias: (C,); lens: (B,) int32 frame lengths.
    Pallas-fused on TPU, exact reference math elsewhere."""
    if not _shape_supported(x):
        return _xla_chain(x, scale, bias, lens, num_groups, eps)
    return jax.lax.platform_dependent(
        x, scale, bias, lens,
        tpu=functools.partial(_fused_chain, num_groups=num_groups, eps=eps),
        default=functools.partial(_xla_chain, num_groups=num_groups, eps=eps),
    )


def _fwd(x, scale, bias, lens, num_groups, eps):
    return gn_mish_mask(x, scale, bias, lens, num_groups, eps), (x, scale, bias, lens)


def _bwd(num_groups, eps, res, g):
    x, scale, bias, lens = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _xla_chain(x_, s_, b_, lens, num_groups, eps),
        x, scale, bias,
    )
    dx, ds, db = vjp(g)
    return dx, ds, db, None


gn_mish_mask.defvjp(_fwd, _bwd)
