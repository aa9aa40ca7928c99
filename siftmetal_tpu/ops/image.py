"""Elementary image ops: grayscale, 2x bilinear upsample, 2x decimation.

TPU-native equivalents of the reference's Metal kernels
(Sources/MetalShaders/Metal/ConvertSRGBToGrayscale.metal,
BilinearUpScale.metal, NearestNeighborDownScale.metal). All functions are
pure, jittable, and operate on [..., H, W] float32 arrays so they vmap over
leading batch axes for free (the reference is strictly one-image-at-a-time,
Sources/SIFTMetal/SIFT/SIFT.swift:147).
"""

from __future__ import annotations

import jax.numpy as jnp

# BT.709 luma coefficients, exactly the constants the reference uses
# (ConvertSRGBToGrayscale.metal:17-20). Deliberately applied in gamma space to
# match the IPOL reference implementation (DifferenceOfGaussians.swift:242-243).
_LUMA_R = 0.212639005871510
_LUMA_G = 0.715168678767756
_LUMA_B = 0.072192315360734


def rgb_to_gray(image: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 3|4] (gamma-space sRGB, 0..1) -> [..., H, W] luma."""
    r, g, b = image[..., 0], image[..., 1], image[..., 2]
    return _LUMA_R * r + _LUMA_G * g + _LUMA_B * b


def symmetrize_index(i: jnp.ndarray, length: int) -> jnp.ndarray:
    """Half-sample symmetric boundary index (Common.hpp:15-22).

    -1 -> 0, -2 -> 1, L -> L-1, L+1 -> L-2 (mirror including the edge pixel).
    """
    ll = 2 * length
    i = (i + ll) % ll
    return jnp.where(i > length - 1, ll - 1 - i, i)


def upsample_bilinear_2x(image: jnp.ndarray) -> jnp.ndarray:
    """IPOL-style 2x bilinear oversampling (BilinearUpScale.metal:12-64).

    output[i, j] samples the input at (i/2, j/2) with symmetric extension
    at the bottom/right border. Input [..., H, W] -> output [..., 2H, 2W].

    Gather-free: even outputs copy the input, odd outputs are neighbor
    midpoints; interleaving via stack+reshape keeps this pure slicing
    (index-array gathers are slow on TPU).
    """

    def interleave(a, b, axis):
        stacked = jnp.stack([a, b], axis=a.ndim + axis + 1)
        shape = list(a.shape)
        shape[axis] = 2 * shape[axis]
        return stacked.reshape(shape)

    right = jnp.concatenate(
        [image[..., :, 1:], image[..., :, -1:]], axis=-1
    )
    cols = interleave(image, 0.5 * (image + right), axis=-1)
    down = jnp.concatenate([cols[..., 1:, :], cols[..., -1:, :]], axis=-2)
    return interleave(cols, 0.5 * (cols + down), axis=-2)


def decimate_2x(image: jnp.ndarray, out_shape: tuple[int, int]) -> jnp.ndarray:
    """Keep every 2nd pixel (NearestNeighborDownScale.metal:15-22).

    ``out_shape`` is passed explicitly because octave sizes come from
    successive integer halving and may not be exactly H//2.
    """
    oh, ow = out_shape
    return image[..., : 2 * oh : 2, : 2 * ow : 2]
