"""Transposed convolution with PyTorch semantics.

Needed because reference checkpoints (U-Net Upsample, HiFi-GAN upsamplers)
were trained with torch ConvTranspose{1,2}d: output = (in-1)*s - 2p + k with
torch's kernel orientation.  Implemented as a fractionally-strided regular
conv (lhs_dilation) so XLA lowers it to one MXU convolution.
"""

from typing import Sequence, Tuple

import jax.numpy as jnp
from jax import lax


def conv_transpose(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    stride: Sequence[int],
    padding: Sequence[int],
) -> jnp.ndarray:
    """Torch-semantics N-D transposed conv.

    Args:
      x: (B, *spatial, C_in)  (NHWC-style).
      kernel: (*k_spatial, C_in, C_out) — flax HWIO layout.
      stride, padding: per spatial dim (torch ConvTranspose stride/padding).
    """
    nd = len(stride)
    kernel = kernel.astype(x.dtype)
    k_spatial = kernel.shape[:nd]
    # transposed conv == conv with input dilated by stride, padded k-1-p,
    # kernel flipped spatially
    kernel = jnp.flip(kernel, axis=tuple(range(nd)))
    pads: Tuple[Tuple[int, int], ...] = tuple(
        (k - 1 - p, k - 1 - p) for k, p in zip(k_spatial, padding)
    )
    if nd == 1:
        dn = lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHC", "HIO", "NHC"))
    elif nd == 2:
        dn = lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    else:
        raise ValueError(f"unsupported spatial rank {nd}")
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,) * nd,
        padding=pads,
        lhs_dilation=tuple(stride),
        rhs_dilation=(1,) * nd,
        dimension_numbers=dn,
    )
