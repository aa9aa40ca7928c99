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
    """Rotation matrix -> axis-angle [3], stable for all angles incl. pi.

    Goes through a branchless (jnp.select) Shepperd quaternion extraction —
    the naive theta/(2 sin theta) formula blows up at theta = pi, which
    real pose graphs do hit (e.g. a keyframe loop crossing yaw = pi).
    """
    m00, m01, m02 = r[0, 0], r[0, 1], r[0, 2]
    m10, m11, m12 = r[1, 0], r[1, 1], r[1, 2]
    m20, m21, m22 = r[2, 0], r[2, 1], r[2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-24))

    # Four Shepperd cases: trace-dominant or one of the diagonal elements.
    s0 = safe_sqrt(1.0 + tr) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0,
                    (m10 - m01) / s0])
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1,
                    (m02 + m20) / s1])
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2,
                    (m12 + m21) / s2])
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3,
                    0.25 * s3])

    c0 = tr > 0.0
    c1 = (m00 >= m11) & (m00 >= m22)
    c2 = m11 >= m22
    q = jnp.where(
        c0, q0, jnp.where(c1, q1, jnp.where(c2, q2, q3))
    )
    q = q / jnp.linalg.norm(q)
    q = q * jnp.sign(jnp.where(jnp.abs(q[0]) > 1e-12, q[0], 1.0))

    vn = jnp.linalg.norm(q[1:])
    theta = 2.0 * jnp.arctan2(vn, q[0])
    axis = q[1:] / jnp.maximum(vn, 1e-24)
    return jnp.where(vn > 1e-12, axis * theta, 2.0 * q[1:])


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
