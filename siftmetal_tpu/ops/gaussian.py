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


def _conv1d_sym(
    image: jnp.ndarray, taps: np.ndarray, axis: int, out_dtype=None
) -> jnp.ndarray:
    """1-D convolution along ``axis`` (-1 or -2) with symmetric padding.

    Implemented as an unrolled shift-and-add (pad + sum of tap-weighted
    static slices) rather than ``lax.conv_general_dilated``:

      * exact fp32 VPU math — the TPU conv op in fp32/HIGHEST costs ~50 ms
        for one 960x1280 blur (measured, v5e) vs ~1 ms for shift-add, and
        its default-precision path computes in bf16, which empirically
        inflates fine-scale DoG extrema 2.5x vs the IPOL fixtures;
      * XLA fuses the whole tap sum into one pass over memory;
      * batches/vmaps/shards over any leading axes with no special cases
        (the Pallas variant in ops/pallas/blur.py is equivalent and tiled
        explicitly; it benches the same 1 ms — kept for the single-image
        fast path and as the kernel-authoring reference).
    """
    radius = len(taps) // 2
    pad = [(0, 0)] * image.ndim
    pad[axis] = (radius, radius)
    x = jnp.pad(image, pad, mode="symmetric")

    n = image.shape[axis]
    # Reduced-precision inputs (bf16 fast mode): accumulate the tap sum in
    # fp32 and round ONCE at the end — accumulating in bf16 compounds
    # ~sqrt(n_taps) rounding errors per pass, which lands directly on the
    # tiny DoG differences downstream. The upcast fuses into the same
    # HBM pass, so the bandwidth saving of bf16 storage is kept.
    if out_dtype is None:
        out_dtype = image.dtype
    upcast = image.dtype != jnp.float32
    acc = None
    for k in range(2 * radius + 1):
        sl = [slice(None)] * image.ndim
        sl[axis] = slice(k, k + n)
        v = x[tuple(sl)]
        if upcast:
            v = v.astype(jnp.float32)
        term = float(taps[k]) * v
        acc = term if acc is None else acc + term
    return acc.astype(out_dtype)


def blur(image: jnp.ndarray, sigma: float, out_dtype=None) -> jnp.ndarray:
    """Separable Gaussian blur of [..., H, W] with symmetric boundary.

    ``out_dtype`` overrides the output dtype: the bf16 fast-mode pyramid
    reads a bf16 chain but takes the SECOND pass's fp32 accumulator
    un-rounded (out_dtype=float32) — quantizing the stored Gaussians
    makes neighboring DoG samples collide into plateaus and the strict
    extrema test drops ~1/3 of keypoints (measured on the butterfly)."""
    if sigma <= 0.0:
        return image if out_dtype is None else image.astype(out_dtype)
    taps = gaussian_taps(sigma)
    first = _conv1d_sym(image, taps, axis=-1)
    if out_dtype is not None:
        return _conv1d_sym(first, taps, axis=-2, out_dtype=out_dtype)
    return _conv1d_sym(first, taps, axis=-2)
