"""Pose-graph optimization over SE(3) keyframe poses.

New capability (SURVEY.md §7 step 6): given relative-pose constraints
(odometry + loop closures), refine absolute keyframe poses by damped
Gauss-Newton on the residual log(T_ij_measured^-1 ∘ T_i^-1 ∘ T_j).
Everything static-shape: padded edge lists with validity masks; the
[6N, 6N] normal system is dense (keyframe counts are small relative to
landmark counts; sharding across hosts splits edge sets — psum-reducible).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .camera import compose, inverse, relative, rodrigues, so3_log


class PoseGraph(NamedTuple):
    poses: jnp.ndarray     # [N, 6] world->cam (axis-angle, translation)
    edge_i: jnp.ndarray    # [E] int32
    edge_j: jnp.ndarray    # [E] int32
    rel_ij: jnp.ndarray    # [E, 6] measured T_ij (x_j = T_ij(x_i))
    weight: jnp.ndarray    # [E] f32 (0 masks a padding edge)
    fixed: int = 1         # first N poses held fixed (gauge)


def edge_residual(pose_i, pose_j, rel_ij) -> jnp.ndarray:
    """[6] log-residual of one constraint."""
    pred = relative(pose_i, pose_j)
    err = compose(pred, inverse(rel_ij))
    return err


def graph_residuals(g: PoseGraph) -> jnp.ndarray:
    r = jax.vmap(
        lambda i, j, m: edge_residual(g.poses[i], g.poses[j], m)
    )(g.edge_i, g.edge_j, g.rel_ij)
    return r * g.weight[:, None]


def graph_cost(g: PoseGraph) -> jnp.ndarray:
    r = graph_residuals(g)
    return 0.5 * jnp.sum(r * r)


def _step(g: PoseGraph, lam: jnp.ndarray) -> jnp.ndarray:
    n = g.poses.shape[0]

    def jac_one(i, j, m, w):
        ji = jax.jacfwd(
            lambda p: edge_residual(p, g.poses[j], m)
        )(g.poses[i])
        jj = jax.jacfwd(
            lambda p: edge_residual(g.poses[i], p, m)
        )(g.poses[j])
        r = edge_residual(g.poses[i], g.poses[j], m)
        return ji * w, jj * w, r * w

    ji, jj, r = jax.vmap(jac_one)(g.edge_i, g.edge_j, g.rel_ij, g.weight)

    # Dense [6N, 6N] normal equations assembled with segment sums.
    def outer(a, b):
        return jnp.einsum("eia,eib->eab", a, b)

    h_ii = jax.ops.segment_sum(outer(ji, ji), g.edge_i, n)
    h_jj = jax.ops.segment_sum(outer(jj, jj), g.edge_j, n)
    h = jnp.zeros((n, 6, n, 6))
    h = h.at[jnp.arange(n), :, jnp.arange(n), :].add(h_ii + h_jj)
    flat_ij = g.edge_i * n + g.edge_j
    h_cross = jax.ops.segment_sum(outer(ji, jj), flat_ij, n * n).reshape(
        n, n, 6, 6
    )
    h = h + jnp.moveaxis(h_cross, 1, 2)
    h = h + jnp.moveaxis(jnp.moveaxis(h_cross, 1, 2), (0, 1), (2, 3))

    b = -(
        jax.ops.segment_sum(jnp.einsum("eia,ei->ea", ji, r), g.edge_i, n)
        + jax.ops.segment_sum(jnp.einsum("eia,ei->ea", jj, r), g.edge_j, n)
    )

    hm = h.reshape(n * 6, n * 6) + lam * jnp.eye(n * 6)
    fixed_mask = (jnp.arange(n * 6) < g.fixed * 6).astype(jnp.float32)
    hm = (
        hm * (1 - fixed_mask)[:, None] * (1 - fixed_mask)[None, :]
        + jnp.diag(fixed_mask)
    )
    bv = b.reshape(-1) * (1 - fixed_mask)
    return jnp.linalg.solve(hm, bv).reshape(n, 6)


def robust_edge_weights(
    g: PoseGraph, huber_delta
) -> jnp.ndarray:
    """IRLS Huber weights per edge: w = min(1, delta / ||r||).

    Applied ON TOP of the static edge weights so a bad measurement (e.g.
    a loop closure verified by an ill-conditioned PnP) is downweighted
    instead of dragging the whole chain toward its wrong constraint.
    ``huber_delta`` may be a scalar or a per-edge [E] array — verified
    loop-closure edges are typically passed jnp.inf (trusted: a CORRECT
    closure's residual at the start of a drift repair is as large as
    the drift itself, and a scalar threshold IRLS-crushes it)."""
    r = jax.vmap(
        lambda i, j, m: edge_residual(g.poses[i], g.poses[j], m)
    )(g.edge_i, g.edge_j, g.rel_ij)
    norm = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-24)
    return jnp.minimum(1.0, huber_delta / norm)


def optimize_pose_graph(
    g: PoseGraph,
    n_iterations: int = 20,
    damping: float = 1e-4,
    huber_delta=0.1,
) -> Tuple[PoseGraph, jnp.ndarray]:
    """Jittable robust-LM pose-graph optimization; returns
    (graph, final_cost). ``huber_delta`` is the residual norm (rad/units
    mixed 6-vector) beyond which an edge is treated as an outlier and
    IRLS-downweighted — scalar or per-edge [E] array; pass ``inf``
    (per edge or globally) for pure least squares."""

    def body(_, state):
        poses, lam = state
        gg = g._replace(poses=poses)
        w = g.weight * robust_edge_weights(gg, huber_delta)
        gw = gg._replace(weight=w)
        # Keep the normal equations off the TPU's bf16 matmul path.
        with jax.default_matmul_precision("highest"):
            d = _step(gw, lam)
        new_poses = poses + d
        c0 = graph_cost(gw)
        c1 = graph_cost(gw._replace(poses=new_poses))
        accept = c1 < c0
        poses = jnp.where(accept, new_poses, poses)
        lam = jnp.clip(
            jnp.where(accept, lam * 0.5, lam * 10.0), 1e-8, 1e6
        )
        return poses, lam

    poses, _ = lax.fori_loop(
        0, n_iterations, body, (g.poses, jnp.float32(damping))
    )
    out = g._replace(poses=poses)
    return out, graph_cost(out)
