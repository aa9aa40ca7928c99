"""Separable Gaussian blur with half-sample-symmetric boundary handling.

TPU-native equivalent of the reference's convolution kernels
(Sources/MetalShaders/Metal/Convolution.metal, ConvolutionSeries.metal) and
the tap builder (Sources/SIFTMetal/Metal Compute/GaussianKernel.swift:19-43).

Design notes (TPU-first):
  * Taps are computed host-side (radius = ceil(4*sigma), normalized
    exp(-k^2 / (2 sigma^2))) and baked into the traced program as constants —
    the analogue of the reference pre-baking weights into a
    ``ConvolutionParameters`` buffer at init (ConvolutionSeriesKernel.swift:41-54).
  * The convolution itself is expressed as symmetric-pad + depthwise
    ``lax.conv_general_dilated`` over the last two axes, which XLA lowers to
    efficient fused TPU code; arbitrary leading axes are folded into the conv
    batch dimension, so this vmaps over frame batches for free.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_taps(sigma: float) -> np.ndarray:
    """Normalized taps, radius ceil(4*sigma) (GaussianKernel.swift:19-43)."""
    radius = int(math.ceil(4.0 * sigma))
    k = np.arange(-radius, radius + 1, dtype=np.float64)
    w = np.exp(-0.5 * (k * k) / (sigma * sigma))
    w /= w.sum()
    return w.astype(np.float32)


def _conv1d_sym(image: jnp.ndarray, taps: np.ndarray, axis: int) -> jnp.ndarray:
    """1-D convolution along ``axis`` (-1 or -2) with symmetric padding."""
    radius = len(taps) // 2
    pad = [(0, 0)] * image.ndim
    pad[axis] = (radius, radius)
    x = jnp.pad(image, pad, mode="symmetric")

    lead = x.shape[:-2]
    h, w = x.shape[-2], x.shape[-1]
    x4 = x.reshape((-1, 1, h, w))  # NCHW
    if axis == -1 or axis == image.ndim - 1:
        kernel = jnp.asarray(taps, dtype=image.dtype).reshape(1, 1, 1, -1)
    else:
        kernel = jnp.asarray(taps, dtype=image.dtype).reshape(1, 1, -1, 1)
    y = jax.lax.conv_general_dilated(
        x4, kernel, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=image.dtype,
        # True fp32 accumulation. The TPU default would multiply in
        # bf16-ish precision, which empirically inflates fine-scale DoG
        # extrema 2.5x vs the IPOL fixtures (CPU/HIGHEST reproduces the
        # extra_NES fixture exactly: 3073 vs 3068).
        precision=jax.lax.Precision.HIGHEST,
    )
    return y.reshape(lead + y.shape[-2:])


def blur(image: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of [..., H, W] with symmetric boundary."""
    if sigma <= 0.0:
        return image
    taps = gaussian_taps(sigma)
    return _conv1d_sym(_conv1d_sym(image, taps, axis=-1), taps, axis=-2)
