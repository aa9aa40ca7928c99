"""Two-view geometry: homography / fundamental / essential estimation,
triangulation, pose recovery.

New functionality relative to the reference, which only ships the heuristic
``matchGeometry`` pre-filter (/root/reference
Sources/SIFTMetal/SIFT/SIFTDescriptor.swift:104-296 — kept in this
framework as ``match.matcher.geometry_score``); SURVEY.md §7 step 5 calls
for real RANSAC + triangulation as the bridge from matching to SfM.

All solvers are batched (leading hypothesis axis via vmap) and jittable:
RANSAC evaluates every hypothesis in parallel instead of looping — the
TPU-native formulation (no data-dependent trip counts).

Conventions: points are [N, 2] (row, col) = (y_img, x_img) in pixels,
matching the detector's output; homogeneous math uses (u, v, 1) with
u = col, v = row internally where a camera matrix is involved.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _normalize_points(pts: jnp.ndarray, w: jnp.ndarray):
    """Hartley normalization with validity weights w [N]."""
    cnt = jnp.maximum(w.sum(), 1.0)
    mean = (pts * w[:, None]).sum(0) / cnt
    d = jnp.sqrt(((pts - mean) ** 2).sum(-1))
    scale = jnp.sqrt(2.0) / jnp.maximum((d * w).sum() / cnt, 1e-12)
    T = jnp.array(
        [
            [scale, 0.0, -scale * mean[0]],
            [0.0, scale, -scale * mean[1]],
            [0.0, 0.0, 1.0],
        ]
    )
    return (pts - mean) * scale, T


def _homog(pts: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)


def homography_from_points(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """DLT homography from >= 4 correspondences ([K, 2] each): dst ~ H src.

    Solved via SVD of the 2K x 9 design matrix; returns H normalized to
    H[2,2] = 1 when possible.
    """
    w = jnp.ones(src.shape[0])
    # Hartley normalization: raw pixel coordinates in f32 cost ~0.1 px of
    # SVD accuracy; normalized they recover the f64 answer to ~1e-4 px.
    s_n, ts = _normalize_points(src, w)
    d_n, td = _normalize_points(dst, w)
    x, y = s_n[:, 0], s_n[:, 1]
    u, v = d_n[:, 0], d_n[:, 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([x, y, o, z, z, z, -u * x, -u * y, -u], axis=-1)
    r2 = jnp.stack([z, z, z, x, y, o, -v * x, -v * y, -v], axis=-1)
    a = jnp.concatenate([r1, r2], axis=0)
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    h = vt[-1].reshape(3, 3)
    h = jnp.linalg.inv(td) @ h @ ts
    return h / jnp.where(jnp.abs(h[2, 2]) > 1e-12, h[2, 2], 1.0)


def homography_transfer_error(
    h: jnp.ndarray, src: jnp.ndarray, dst: jnp.ndarray
) -> jnp.ndarray:
    """Forward transfer error |dst - H src| per correspondence [N]."""
    p = _homog(src) @ h.T
    proj = p[:, :2] / jnp.where(jnp.abs(p[:, 2:]) > 1e-12, p[:, 2:], 1e-12)
    return jnp.sqrt(((proj - dst) ** 2).sum(-1))


def fundamental_from_points(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Normalized 8-point fundamental matrix from >= 8 correspondences:
    dst^T F src = 0, with the rank-2 projection."""
    w = jnp.ones(src.shape[0])
    s_n, ts = _normalize_points(src, w)
    d_n, td = _normalize_points(dst, w)
    x1, y1 = s_n[:, 0], s_n[:, 1]
    x2, y2 = d_n[:, 0], d_n[:, 1]
    a = jnp.stack(
        [
            x2 * x1, x2 * y1, x2,
            y2 * x1, y2 * y1, y2,
            x1, y1, jnp.ones_like(x1),
        ],
        axis=-1,
    )
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    f = vt[-1].reshape(3, 3)
    u, s, v2 = jnp.linalg.svd(f)
    f = (u * jnp.array([s[0], s[1], 0.0])) @ v2
    f = td.T @ f @ ts
    return f / jnp.maximum(jnp.linalg.norm(f), 1e-12)


def sampson_error(
    f: jnp.ndarray, src: jnp.ndarray, dst: jnp.ndarray
) -> jnp.ndarray:
    """First-order geometric (Sampson) error of dst^T F src = 0, [N]."""
    p1 = _homog(src)
    p2 = _homog(dst)
    fp1 = p1 @ f.T
    ftp2 = p2 @ f
    num = jnp.sum(p2 * fp1, axis=-1) ** 2
    den = fp1[:, 0] ** 2 + fp1[:, 1] ** 2 + ftp2[:, 0] ** 2 + ftp2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def essential_from_fundamental(
    f: jnp.ndarray, k1: jnp.ndarray, k2: jnp.ndarray
) -> jnp.ndarray:
    """E = K2^T F K1, projected onto the essential manifold (equal
    singular values)."""
    e = k2.T @ f @ k1
    u, s, vt = jnp.linalg.svd(e)
    sm = (s[0] + s[1]) / 2.0
    return (u * jnp.array([sm, sm, 0.0])) @ vt


def triangulate(
    p1: jnp.ndarray, p2: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray
) -> jnp.ndarray:
    """Linear (DLT) two-view triangulation.

    p1/p2: [3, 4] projection matrices; x1/x2: [N, 2] pixel points (u, v).
    Returns [N, 3] world points. Batched over N via vmap.
    """

    def one(a1, a2):
        # (SVD under HIGHEST — TPU default matmul precision is bf16.)
        rows = jnp.stack(
            [
                a1[0] * p1[2] - p1[0],
                a1[1] * p1[2] - p1[1],
                a2[0] * p2[2] - p2[0],
                a2[1] * p2[2] - p2[1],
            ]
        )
        _, _, vt = jnp.linalg.svd(rows, full_matrices=True)
        x = vt[-1]
        return x[:3] / jnp.where(jnp.abs(x[3]) > 1e-12, x[3], 1e-12)

    with jax.default_matmul_precision("highest"):
        return jax.vmap(one)(x1, x2)


def decompose_essential(
    e: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The four (R, t) candidates of an essential matrix:
    returns (rs [4, 3, 3], ts [4, 3])."""
    u, _, vt = jnp.linalg.svd(e)
    # Enforce proper rotations.
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    w = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    r1 = u @ w @ vt
    r2 = u @ w.T @ vt
    t = u[:, 2]
    rs = jnp.stack([r1, r1, r2, r2])
    ts = jnp.stack([t, -t, t, -t])
    return rs, ts


def recover_pose(
    e: jnp.ndarray,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    weights: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Cheirality-tested pose from an essential matrix.

    x1/x2 are [N, 2] points in NORMALIZED camera coordinates (K^-1 applied),
    ``weights`` masks valid correspondences. Returns (R, t, n_in_front):
    the candidate with most triangulated points in front of both cameras.
    """
    rs, ts = decompose_essential(e)
    p1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)

    def score(r, t):
        p2 = jnp.concatenate([r, t[:, None]], axis=1)
        pts = triangulate(p1, p2, x1, x2)
        z1 = pts[:, 2]
        z2 = (pts @ r.T + t)[:, 2]
        return jnp.sum(((z1 > 0) & (z2 > 0)) * weights)

    scores = jax.vmap(score)(rs, ts)
    best = jnp.argmax(scores)
    return rs[best], ts[best], scores[best]
