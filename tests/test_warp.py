"""Perspective warp + keypoint repeatability under known homographies.

The warp covers the reference's Quad/perspective utilities
(Utilities/Quad.swift, CoreImageExtensions.swift); the repeatability test
is the committed, asserted version of the detector-stability property the
reference never measured.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from siftmetal_tpu.config import SiftConfig
from siftmetal_tpu.ops.warp import (
    apply_homography,
    quad_corners,
    similarity_homography,
    warp_perspective,
)
from siftmetal_tpu.ops.image import rgb_to_gray
from siftmetal_tpu.sift.extract import SIFT

from conftest import load_image


def test_warp_identity():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (40, 56)).astype(np.float32))
    out = np.asarray(warp_perspective(img, jnp.eye(3), (40, 56)))
    np.testing.assert_allclose(out, np.asarray(img), atol=1e-6)


def test_warp_translation():
    img = np.zeros((32, 32), dtype=np.float32)
    img[10, 12] = 1.0
    h = np.eye(3, dtype=np.float32)
    h[0, 2] = 3.0  # +3 rows
    h[1, 2] = -2.0  # -2 cols
    out = np.asarray(warp_perspective(jnp.asarray(img), jnp.asarray(h), (32, 32)))
    assert out[13, 10] == pytest.approx(1.0, abs=1e-5)


def test_apply_homography_matches_quad():
    h = similarity_homography(0.3, 1.2, center=(16.0, 16.0))
    q = quad_corners(32, 32)
    out = np.asarray(apply_homography(jnp.asarray(h), jnp.asarray(q)))
    # Center is a fixed point.
    c = np.asarray(
        apply_homography(jnp.asarray(h), jnp.asarray([[16.0, 16.0]]))
    )
    np.testing.assert_allclose(c, [[16.0, 16.0]], atol=1e-4)
    # Corners move; scale preserved pairwise around center.
    d0 = np.linalg.norm(q - [16, 16], axis=1)
    d1 = np.linalg.norm(out - [16, 16], axis=1)
    np.testing.assert_allclose(d1 / d0, 1.2, atol=1e-4)


@pytest.mark.slow
def test_repeatability_under_rotation(butterfly):
    cfg = SiftConfig()
    gray = np.asarray(rgb_to_gray(butterfly))
    h_img, w_img = gray.shape
    hmat = similarity_homography(
        np.deg2rad(15.0), 1.0, center=(h_img / 2, w_img / 2)
    )
    warped = np.asarray(
        warp_perspective(jnp.asarray(gray), jnp.asarray(hmat), gray.shape)
    )

    sift = SIFT(h_img, w_img, cfg)
    k0, _, _ = sift.extract(gray)
    k1, _, _ = sift.extract(warped)

    v0 = np.asarray(k0.valid)
    pts0 = np.stack([np.asarray(k0.x)[v0], np.asarray(k0.y)[v0]], 1)
    sig0 = np.asarray(k0.sigma)[v0]
    v1 = np.asarray(k1.valid)
    pts1 = np.stack([np.asarray(k1.x)[v1], np.asarray(k1.y)[v1]], 1)

    proj = np.asarray(apply_homography(jnp.asarray(hmat), jnp.asarray(pts0)))
    margin = 10.0
    inside = (
        (proj[:, 0] > margin) & (proj[:, 0] < h_img - margin)
        & (proj[:, 1] > margin) & (proj[:, 1] < w_img - margin)
    )
    d = np.sqrt(
        ((proj[inside][:, None, :] - pts1[None, :, :]) ** 2).sum(-1)
    ).min(1)
    # Tolerance scales with keypoint blur (sub-pixel at fine scales).
    tol = np.maximum(1.5, 0.3 * sig0[inside])
    repeat = (d < tol).mean()
    assert repeat > 0.5, repeat
