"""Perspective warping and quad transforms.

Covers the reference's ``Quad`` + CoreImage perspective-transform utilities
(/root/reference Sources/SIFTMetal/Utilities/Quad.swift:12-56,
Extensions/CoreImageExtensions.swift:10-25) with a jittable bilinear
homography warp — also the workhorse for the repeatability benchmark
(warp an image with a known H, check keypoints reproject).

Convention: points are (row, col); a homography H maps source (row, col, 1)
homogeneous coordinates to destination.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def inv3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form adjugate inverse of a 3x3 matrix.

    ``jnp.linalg.inv`` lowers to matmul-backed LU which runs at the TPU's
    default (bf16) matmul precision — measured ~1e-2 relative error on a
    homography, enough to shift warp sampling by whole pixels. The
    adjugate form is exact f32 arithmetic.
    """
    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    g, h_, i = m[2, 0], m[2, 1], m[2, 2]
    det = a * (e * i - f * h_) - b * (d * i - f * g) + c * (d * h_ - e * g)
    adj = jnp.array(
        [
            [e * i - f * h_, c * h_ - b * i, b * f - c * e],
            [f * g - d * i, a * i - c * g, c * d - a * f],
            [d * h_ - e * g, b * g - a * h_, a * e - b * d],
        ]
    )
    return adj / det


def apply_homography(h: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """[N, 2] (row, col) -> transformed [N, 2]."""
    p = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    q = p @ h.T
    return q[..., :2] / jnp.where(
        jnp.abs(q[..., 2:]) > 1e-12, q[..., 2:], 1e-12
    )


def warp_perspective(
    image: jnp.ndarray, h: jnp.ndarray, out_shape: Tuple[int, int]
) -> jnp.ndarray:
    """Inverse-warp ``image`` [H, W] by homography ``h`` (src->dst) with
    bilinear sampling; out-of-bounds samples are 0."""
    oh, ow = out_shape
    hi = inv3x3(h)
    rr, cc = jnp.meshgrid(
        jnp.arange(oh, dtype=jnp.float32),
        jnp.arange(ow, dtype=jnp.float32),
        indexing="ij",
    )
    dst = jnp.stack([rr.ravel(), cc.ravel()], axis=-1)
    src = apply_homography(hi, dst)
    r, c = src[:, 0], src[:, 1]

    hh, ww = image.shape[-2], image.shape[-1]
    r0 = jnp.floor(r).astype(jnp.int32)
    c0 = jnp.floor(c).astype(jnp.int32)
    fr = r - r0
    fc = c - c0

    def sample(ri, ci):
        inside = (ri >= 0) & (ri < hh) & (ci >= 0) & (ci < ww)
        v = image[jnp.clip(ri, 0, hh - 1), jnp.clip(ci, 0, ww - 1)]
        return jnp.where(inside, v, 0.0)

    v = (
        sample(r0, c0) * (1 - fr) * (1 - fc)
        + sample(r0, c0 + 1) * (1 - fr) * fc
        + sample(r0 + 1, c0) * fr * (1 - fc)
        + sample(r0 + 1, c0 + 1) * fr * fc
    )
    return v.reshape(oh, ow)


def similarity_homography(
    angle: float, scale: float, center: Tuple[float, float],
    translation: Tuple[float, float] = (0.0, 0.0),
) -> np.ndarray:
    """Rotation(+scale) about ``center`` (row, col) as a 3x3 homography."""
    ca, sa = np.cos(angle) * scale, np.sin(angle) * scale
    cr, cc = center
    tr, tc = translation
    # (row, col) rotation.
    a = np.array(
        [
            [ca, -sa, cr - ca * cr + sa * cc + tr],
            [sa, ca, cc - sa * cr - ca * cc + tc],
            [0.0, 0.0, 1.0],
        ],
        dtype=np.float32,
    )
    return a


def quad_corners(h: int, w: int) -> np.ndarray:
    """Image corner quad [(0,0), (0,w), (h,w), (h,0)] (rows, cols)."""
    return np.array(
        [[0, 0], [0, w], [h, w], [h, 0]], dtype=np.float32
    )
