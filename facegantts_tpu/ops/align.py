"""Alignment / masking utilities (reference model/utils.py:6-45), in JAX.

All functions take static max lengths so they trace to fixed shapes under jit.
"""

import math

import jax.numpy as jnp


def sequence_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_length) bool mask (reference model/utils.py:6-11)."""
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def fix_len_compatibility(length: int, num_downsamplings_in_unet: int = 2) -> int:
    """Round up to a multiple of 2**levels for the U-Net (model/utils.py:14-18)."""
    factor = 2**num_downsamplings_in_unet
    return int(math.ceil(length / factor) * factor)


def generate_path(duration: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Durations -> hard monotonic alignment path (model/utils.py:27-40).

    duration: (B, T_x) non-negative; mask: (B, T_x, T_y).
    Returns (B, T_x, T_y) 0/1 path where row x covers mel frames
    [cumsum[x-1], cumsum[x])."""
    b, t_x, t_y = mask.shape
    cum = jnp.cumsum(duration, axis=1)  # (B, T_x)
    pos = jnp.arange(t_y, dtype=cum.dtype)
    upper = (pos[None, None, :] < cum[:, :, None]).astype(mask.dtype)
    lower = jnp.pad(upper, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    return (upper - lower) * mask


def duration_loss(logw: jnp.ndarray, logw_: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """MSE in the log-duration domain, normalized by total text length
    (model/utils.py:43-45)."""
    return jnp.sum((logw - logw_) ** 2) / jnp.sum(lengths)
