"""Keypoint repeatability harness under known homographies.

The committed, asserted version of the detector-stability property the
reference never measures (its tests render overlays for manual review,
Tests/SIFTMetalTests/KeypointTests.swift:15-87). BASELINE.md asks for
>= 90% repeatability vs reference keypoints on Oxford/HPatches; with no
network egress in the build environment the battery runs on committed
images (the IPOL butterfly + procedural fixtures with natural-image
spectra, tests/fixtures/make_procedural.py) under a deterministic warp
battery — rotation, scale, and perspective tilt.

Also the validation harness for reduced-precision / fast pyramid modes:
``repeatability(...)`` between a baseline config's keypoints and a fast
mode's keypoints on the SAME image measures what the mode loses.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from ..config import SiftConfig
from ..ops.warp import (
    apply_homography,
    similarity_homography,
    warp_perspective,
)


def keypoint_array(kps) -> Tuple[np.ndarray, np.ndarray]:
    """Extract valid (x, y) points + sigmas from a Keypoints pytree."""
    v = np.asarray(kps.valid)
    pts = np.stack([np.asarray(kps.x)[v], np.asarray(kps.y)[v]], axis=1)
    return pts, np.asarray(kps.sigma)[v]


def repeatability(
    pts_a: np.ndarray,
    sig_a: np.ndarray,
    pts_b: np.ndarray,
    hmat: np.ndarray,
    shape: Tuple[int, int],
    margin: float = 10.0,
    base_tol: float = 1.5,
    sigma_tol: float = 0.3,
) -> float:
    """Fraction of A-keypoints (projected by ``hmat`` into B's frame,
    landing inside the margin) with a B-keypoint within a blur-scaled
    tolerance. Returns NaN when no projected point lands inside."""
    h_img, w_img = shape
    proj = np.asarray(
        apply_homography(jnp.asarray(hmat), jnp.asarray(pts_a))
    )
    inside = (
        (proj[:, 0] > margin)
        & (proj[:, 0] < h_img - margin)
        & (proj[:, 1] > margin)
        & (proj[:, 1] < w_img - margin)
    )
    if not np.any(inside) or len(pts_b) == 0:
        return float("nan")
    d = np.sqrt(
        ((proj[inside][:, None, :] - pts_b[None, :, :]) ** 2).sum(-1)
    ).min(1)
    tol = np.maximum(base_tol, sigma_tol * sig_a[inside])
    return float((d < tol).mean())


def standard_warp_battery(shape: Tuple[int, int]) -> List[Tuple[str, np.ndarray]]:
    """Deterministic named homographies: rotations, scales, a tilt."""
    h_img, w_img = shape
    c = (h_img / 2.0, w_img / 2.0)
    warps = [
        ("rot15", similarity_homography(np.deg2rad(15.0), 1.0, center=c)),
        ("rot30", similarity_homography(np.deg2rad(30.0), 1.0, center=c)),
        ("scale0.8", similarity_homography(0.0, 0.8, center=c)),
        ("scale1.25", similarity_homography(0.0, 1.25, center=c)),
    ]
    # Mild perspective tilt around the center.
    tilt = np.eye(3, dtype=np.float64)
    tilt[2, 0] = 2e-4
    shift = np.eye(3)
    shift[0, 2], shift[1, 2] = -c[0], -c[1]
    unshift = np.eye(3)
    unshift[0, 2], unshift[1, 2] = c[0], c[1]
    warps.append(("tilt", (unshift @ tilt @ shift).astype(np.float32)))
    return warps


def run_battery(
    sift,
    gray: np.ndarray,
    warps: Sequence[Tuple[str, np.ndarray]] | None = None,
) -> Dict[str, float]:
    """Repeatability of ``sift`` (a compiled SIFT object) on one image
    under each warp. Returns {warp_name: repeatability}."""
    shape = gray.shape
    if warps is None:
        warps = standard_warp_battery(shape)
    k0, _, _ = sift.extract(gray)
    pts0, sig0 = keypoint_array(k0)
    out: Dict[str, float] = {}
    for name, hmat in warps:
        warped = np.asarray(
            warp_perspective(jnp.asarray(gray), jnp.asarray(hmat), shape)
        )
        k1, _, _ = sift.extract(warped)
        pts1, _ = keypoint_array(k1)
        out[name] = repeatability(pts0, sig0, pts1, hmat, shape)
    return out
