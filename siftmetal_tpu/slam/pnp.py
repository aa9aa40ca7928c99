"""Perspective-n-Point: camera pose from 2D-3D correspondences.

New capability (SURVEY.md §7 step 6 — needed by the incremental SfM driver
to register new keyframes against the map). Solver: DLT estimation of the
[3,4] projection matrix from >= 6 points, decomposed against known
intrinsics with an orthonormal (SVD-polar) rotation projection, optionally
refined by a few damped Gauss-Newton steps on reprojection error; RANSAC
wrapper reuses geometry.ransac's parallel-hypothesis machinery.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..geometry.ransac import RansacResult, _sample_indices
from .camera import project, so3_log


def pnp_dlt(
    points3d: jnp.ndarray, uv: jnp.ndarray, k: jnp.ndarray
) -> jnp.ndarray:
    """[S,3] world points + [S,2] pixels + intrinsics -> camera params [6].

    DLT on normalized rays, then polar projection of the leading 3x3 onto
    SO(3). Needs S >= 6; degenerate samples produce garbage poses that
    RANSAC scoring discards naturally.
    """
    kinv = jnp.linalg.inv(k)
    rays = (
        jnp.concatenate([uv, jnp.ones_like(uv[:, :1])], axis=1) @ kinv.T
    )
    x, y = rays[:, 0], rays[:, 1]
    xw = points3d
    z = jnp.zeros_like(xw)
    o = jnp.ones_like(x)[:, None]
    r1 = jnp.concatenate(
        [xw, o, z, jnp.zeros_like(o), -x[:, None] * xw, -x[:, None]], axis=1
    )
    r2 = jnp.concatenate(
        [z, jnp.zeros_like(o), xw, o, -y[:, None] * xw, -y[:, None]], axis=1
    )
    a = jnp.concatenate([r1, r2], axis=0)  # [2S, 12]
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    p = vt[-1].reshape(3, 4)

    m = p[:, :3]
    # Scale and sign: det(R) > 0 and points in front.
    sign = jnp.sign(jnp.linalg.det(m))
    sign = jnp.where(sign == 0, 1.0, sign)
    u, s, v2 = jnp.linalg.svd(m * sign)
    r = u @ v2
    scale = jnp.mean(s)
    t = sign * p[:, 3] / jnp.maximum(scale, 1e-12)
    w = so3_log(r)
    cam = jnp.concatenate([w, t])

    # Cheirality: most sample points should have positive depth; flip if not.
    depth = (points3d @ r.T + t)[:, 2]
    flipped = jnp.concatenate([so3_log(r), -t])  # heuristic fallback
    return jnp.where(jnp.mean(depth) > 0, cam, flipped)


def pnp_refine(
    cam: jnp.ndarray,
    points3d: jnp.ndarray,
    uv: jnp.ndarray,
    k: jnp.ndarray,
    weights: jnp.ndarray,
    n_iterations: int = 5,
    damping: float = 1e-3,
) -> jnp.ndarray:
    """Damped GN refinement of one camera pose on weighted reprojection."""

    def res(c):
        r = jax.vmap(lambda p, o: project(c, k, p) - o)(points3d, uv)
        return (r * weights[:, None]).reshape(-1)

    def body(_, c):
        r = res(c)
        j = jax.jacfwd(res)(c)          # [2S, 6]
        h = j.T @ j + damping * jnp.eye(6)
        d = jnp.linalg.solve(h, -(j.T @ r))
        c_new = c + d
        better = jnp.sum(res(c_new) ** 2) < jnp.sum(r ** 2)
        return jnp.where(better, c_new, c)

    return lax.fori_loop(0, n_iterations, body, cam)


def pnp_ransac(
    key: jax.Array,
    points3d: jnp.ndarray,
    uv: jnp.ndarray,
    valid: jnp.ndarray,
    k: jnp.ndarray,
    n_hypotheses: int = 256,
    sample_size: int = 6,
    inlier_threshold: float = 3.0,
    refine: bool = True,
) -> RansacResult:
    """Parallel-hypothesis PnP RANSAC over padded correspondences."""
    idx = _sample_indices(key, n_hypotheses, sample_size, valid)
    with jax.default_matmul_precision("highest"):
        models = jax.vmap(lambda i: pnp_dlt(points3d[i], uv[i], k))(idx)

    def count_inliers(cam):
        err = jax.vmap(lambda p, o: jnp.linalg.norm(project(cam, k, p) - o))(
            points3d, uv
        )
        inl = (err < inlier_threshold) & valid
        return inl, jnp.sum(inl.astype(jnp.int32))

    inls, counts = jax.vmap(count_inliers)(models)
    best = jnp.argmax(counts)
    cam = models[best]
    inliers = inls[best]
    n_in = counts[best]

    if refine:
        with jax.default_matmul_precision("highest"):
            cam_r = pnp_refine(
                cam, points3d, uv, k, inliers.astype(jnp.float32)
            )
        inl_r, n_r = count_inliers(cam_r)
        better = n_r >= n_in
        cam = jnp.where(better, cam_r, cam)
        inliers = jnp.where(better, inl_r, inliers)
        n_in = jnp.where(better, n_r, n_in)

    ok = jnp.sum(valid.astype(jnp.int32)) >= sample_size
    return RansacResult(
        model=cam, inliers=inliers & ok, n_inliers=n_in * ok, ok=ok
    )
