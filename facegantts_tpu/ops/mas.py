"""Monotonic Alignment Search (MAS).

The reference implements this as a Cython/OpenMP CPU kernel with a
device→host→device round-trip per training step
(model/monotonic_align/core.pyx:9-45, monotonic_align/__init__.py:8-23).

Here the default is an **on-device** formulation that lives inside the jitted
train step: the Viterbi DP has a strict column-to-column dependency, so we
scan over mel frames (t_y) with the whole (B, T_x) wavefront updated as one
vector op per column — batch and text dims ride the VPU, only t_y is
sequential, and no host transfer ever happens.  A C++/OpenMP host kernel with
identical semantics is provided for CPU-side tooling and cross-checking
(facegantts_tpu/native/mas.cpp).

Semantics match the reference DP exactly: value[x, y] accumulates
log_prior[x, y] + max(value[x, y-1], value[x-1, y-1]) inside the feasibility
band, then backtracking walks y from t_y-1 to 0 emitting a 0/1 path.
"""

from functools import partial

import jax
import jax.numpy as jnp

_NEG = -1e9

#: scan unroll for the two T_y-length MAS scans.  Each iteration is a tiny
#: (B, T_x) vector op, so While-loop bookkeeping (condition, input
#: dynamic-slice, carry aliasing) rivals the math; unrolling amortizes it
#: across k columns without changing the DP.  Measured on v5e at the bench
#: shape (16, 128, 436): standalone maximum_path is tunnel-sync-floor bound
#: either way (28.8 ms at unroll 1 vs 26.6 at 8, floor ~32 ms round trip;
#: paths bit-identical) — kept at 8 for the small real saving inside the
#: fused step where no sync floor hides it.
MAS_UNROLL = 8


@partial(jax.jit, static_argnames=("unroll",))
def maximum_path(value: jnp.ndarray, mask: jnp.ndarray,
                 unroll: int = MAS_UNROLL) -> jnp.ndarray:
    """Max-likelihood monotonic alignment path.

    Args:
      value: (B, T_x, T_y) log-prior matrix.
      mask:  (B, T_x, T_y) attention mask (outer product of text/mel masks).

    Returns:
      (B, T_x, T_y) float 0/1 path, same dtype as ``value``.
    """
    dtype = value.dtype
    value = value.astype(jnp.float32)
    maskf = mask.astype(jnp.float32)
    b, t_x, t_y = value.shape

    tx = jnp.maximum(maskf[:, :, 0].sum(-1).astype(jnp.int32), 1)  # (B,)
    ty = jnp.maximum(maskf[:, 0, :].sum(-1).astype(jnp.int32), 1)
    x_idx = jnp.arange(t_x, dtype=jnp.int32)

    value = jnp.where(maskf > 0, value, 0.0)
    cols = jnp.moveaxis(value, 2, 0)  # (T_y, B, T_x)

    # ---- forward DP: one vectorized wavefront per mel column ----
    def fwd(v_prev, inputs):
        col, y = inputs
        same = jnp.where(x_idx[None, :] == y, _NEG, v_prev)
        diag_head = jnp.where(y == 0, 0.0, _NEG)
        diag = jnp.concatenate(
            [jnp.full((b, 1), 1.0) * diag_head, v_prev[:, :-1]], axis=1
        )
        v = col + jnp.maximum(same, diag)
        lo = jnp.maximum(0, tx + y - ty)  # feasibility band per sample
        hi = jnp.minimum(tx - 1, y)
        valid = (x_idx[None, :] >= lo[:, None]) & (x_idx[None, :] <= hi[:, None])
        v = jnp.where(valid, v, _NEG)
        return v, v

    # derive the initial carry from the input so its varying-axes type
    # matches inside shard_map (see shard_map scan-vma docs)
    v0 = jnp.full_like(cols[0], _NEG)
    _, vals = jax.lax.scan(
        fwd, v0, (cols, jnp.arange(t_y, dtype=jnp.int32)),
        unroll=max(1, min(unroll, t_y)),
    )
    # vals: (T_y, B, T_x); prev-column view for backtracking comparisons
    vals_prev = jnp.concatenate([jnp.full_like(vals[:1], _NEG), vals[:-1]], axis=0)

    # ---- backtracking: reverse scan carrying the current text index ----
    batch_idx = jnp.arange(b)

    def bwd(index, inputs):
        vprev, y = inputs
        active = y < ty
        emit = jax.nn.one_hot(index, t_x, dtype=jnp.float32) * active[:, None]
        v_same = vprev[batch_idx, index]
        v_diag = vprev[batch_idx, jnp.maximum(index - 1, 0)]
        step_down = active & (y > 0) & (index != 0) & ((index == y) | (v_same < v_diag))
        return index - step_down.astype(jnp.int32), emit

    ys = jnp.arange(t_y - 1, -1, -1, dtype=jnp.int32)
    _, path_rev = jax.lax.scan(
        bwd, tx - 1, (vals_prev[::-1], ys),
        unroll=max(1, min(unroll, t_y)),
    )
    path = jnp.moveaxis(path_rev[::-1], 0, 2)  # (B, T_x, T_y)
    return (path * maskf).astype(dtype)


def maximum_path_numpy(value, mask, max_neg_val=-1e9):
    """Reference-semantics numpy implementation (slow; tests/tools only).

    Direct transcription of the DP described in SURVEY.md §2 C1."""
    import numpy as np

    value = np.array(value, dtype=np.float32, copy=True)
    mask = np.asarray(mask)
    b, t_x_max, t_y_max = value.shape
    paths = np.zeros_like(value, dtype=np.int32)
    t_xs = mask[:, :, 0].sum(-1).astype(np.int32)
    t_ys = mask[:, 0, :].sum(-1).astype(np.int32)

    for i in range(b):
        v = value[i]
        t_x, t_y = int(t_xs[i]), int(t_ys[i])
        if t_x == 0 or t_y == 0:
            continue
        for y in range(t_y):
            for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
                v_cur = max_neg_val if x == y else v[x, y - 1]
                if x == 0:
                    v_prev = 0.0 if y == 0 else max_neg_val
                else:
                    v_prev = v[x - 1, y - 1]
                v[x, y] += max(v_cur, v_prev)
        index = t_x - 1
        for y in range(t_y - 1, -1, -1):
            paths[i, index, y] = 1
            if index != 0 and (index == y or v[index, y - 1] < v[index - 1, y - 1]):
                index -= 1
    return paths
