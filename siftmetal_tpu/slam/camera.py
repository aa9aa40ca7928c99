"""Camera parameterization and projection for the SfM/SLAM back-end.

New capability relative to the reference (which stops at descriptor
matching; SURVEY.md §7 steps 5-6). Cameras are 6-vectors
[axis-angle rotation (3), translation (3)] mapping WORLD -> CAMERA:
x_cam = R(w) @ x_world + t. Pixels are (u, v) = (col, row).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def rodrigues(w: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [3] -> rotation matrix [3,3] (Taylor-safe near 0)."""
    theta2 = jnp.sum(w * w)
    theta = jnp.sqrt(theta2 + 1e-24)
    k = w / theta
    kx = jnp.array(
        [
            [0.0, -k[2], k[1]],
            [k[2], 0.0, -k[0]],
            [-k[1], k[0], 0.0],
        ]
    )
    s = jnp.sin(theta)
    c = jnp.cos(theta)
    r = jnp.eye(3) + s * kx + (1.0 - c) * (kx @ kx)
    # Near-zero fallback: first-order I + [w]x.
    wx = jnp.array(
        [
            [0.0, -w[2], w[1]],
            [w[2], 0.0, -w[0]],
            [-w[1], w[0], 0.0],
        ]
    )
    return jnp.where(theta2 > 1e-12, r, jnp.eye(3) + wx)


def so3_log(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> axis-angle [3]."""
    cos_t = jnp.clip((jnp.trace(r) - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    v = jnp.array(
        [r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1]]
    )
    scale = jnp.where(
        theta > 1e-6, theta / (2.0 * jnp.sin(theta) + 1e-24), 0.5
    )
    return v * scale


def transform(cam: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """World point [3] -> camera frame [3] for camera params [6]."""
    return rodrigues(cam[:3]) @ x + cam[3:]


def project(cam: jnp.ndarray, k: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """World point [3] -> pixel (u, v) [2] through intrinsics k [3,3]."""
    p = transform(cam, x)
    z = jnp.where(jnp.abs(p[2]) > 1e-9, p[2], 1e-9)
    uv1 = k @ (p / z)
    return uv1[:2]


def compose(cam_a: jnp.ndarray, cam_b: jnp.ndarray) -> jnp.ndarray:
    """Pose composition (a then b as world->cam maps): c = b ∘ a."""
    ra, rb = rodrigues(cam_a[:3]), rodrigues(cam_b[:3])
    r = rb @ ra
    t = rb @ cam_a[3:] + cam_b[3:]
    return jnp.concatenate([so3_log(r), t])


def inverse(cam: jnp.ndarray) -> jnp.ndarray:
    r = rodrigues(cam[:3])
    return jnp.concatenate([so3_log(r.T), -(r.T @ cam[3:])])


def relative(cam_i: jnp.ndarray, cam_j: jnp.ndarray) -> jnp.ndarray:
    """T_ij such that x_j = T_ij(x_i): T_j ∘ T_i^-1."""
    return compose(inverse(cam_i), cam_j)
