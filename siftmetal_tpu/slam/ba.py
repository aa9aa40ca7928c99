"""Bundle adjustment: Gauss-Newton/LM with Schur complement, TPU-native.

New capability (SURVEY.md §7 step 6; the reference has no optimization
back-end). Design choices for TPU:

  * Observations are a padded SoA (cam_idx, lm_idx, uv, valid) — static
    shapes, masked semantics, like every other stage of this framework.
  * Jacobians come from ``jax.jacfwd`` of the per-observation residual,
    vmapped over observations — no hand-derived derivative code.
  * The normal equations are reduced with ``segment_sum`` into block
    diagonals (Hcc [C,6,6], Hll [L,3,3]) and a dense landmark-camera
    coupling tensor W [L,C,6,3]; the camera system after eliminating
    landmarks (Schur complement) is a dense [6C,6C] solve — cameras are
    few, landmarks are many, so this is the standard BA factorization laid
    out for MXU einsums instead of sparse triangular solves.
  * The landmark axis is embarrassingly shardable: Hll/W/b_l partition by
    landmark, the Schur reduction becomes a psum — see
    parallel/distributed_ba.py for the multi-chip version.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .camera import project


class BAProblem(NamedTuple):
    cameras: jnp.ndarray    # [C, 6] axis-angle + translation (world->cam)
    landmarks: jnp.ndarray  # [L, 3]
    k: jnp.ndarray          # [3, 3] shared intrinsics
    cam_idx: jnp.ndarray    # [O] int32
    lm_idx: jnp.ndarray     # [O] int32
    uv: jnp.ndarray         # [O, 2] observed pixels (u=col, v=row)
    valid: jnp.ndarray      # [O] bool
    fixed_cameras: int = 1  # first N cameras held fixed (gauge freedom)


class BAStats(NamedTuple):
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    n_observations: jnp.ndarray


def _residual(cam, lm, k, uv):
    return project(cam, k, lm) - uv


def residuals(problem: BAProblem) -> jnp.ndarray:
    """[O, 2] masked reprojection residuals."""
    r = jax.vmap(
        lambda c, l, uv: _residual(
            problem.cameras[c], problem.landmarks[l], problem.k, uv
        )
    )(problem.cam_idx, problem.lm_idx, problem.uv)
    return r * problem.valid[:, None]


def cost(problem: BAProblem, huber_delta: float = 0.0) -> jnp.ndarray:
    """Total objective; Huber rho when ``huber_delta`` > 0."""
    r = residuals(problem)
    if huber_delta <= 0:
        return 0.5 * jnp.sum(r * r)
    norm = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12) * problem.valid
    d = huber_delta
    rho = jnp.where(
        norm <= d, 0.5 * norm * norm, d * (norm - 0.5 * d)
    )
    return jnp.sum(rho)


def _huber_weight(r: jnp.ndarray, delta: float) -> jnp.ndarray:
    """Per-observation IRLS weight for the Huber loss, [O]."""
    norm = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12)
    return jnp.where(norm <= delta, 1.0, delta / norm)


def _gauss_newton_step(
    cameras, landmarks, problem: BAProblem, damping, huber_delta
):
    c_n = cameras.shape[0]
    l_n = landmarks.shape[0]

    def jac_one(c, l, uv):
        cam = cameras[c]
        lm = landmarks[l]
        r = _residual(cam, lm, problem.k, uv)
        jc = jax.jacfwd(lambda cc: _residual(cc, lm, problem.k, uv))(cam)
        jl = jax.jacfwd(lambda ll: _residual(cam, ll, problem.k, uv))(lm)
        return r, jc, jl

    r, jc, jl = jax.vmap(jac_one)(problem.cam_idx, problem.lm_idx, problem.uv)
    w = _huber_weight(r, huber_delta) * problem.valid
    # Fixed cameras (gauge): zero their Jacobian so their update is 0.
    free = (problem.cam_idx >= problem.fixed_cameras).astype(jnp.float32)
    jc = jc * free[:, None, None]
    jc_w = jc * w[:, None, None]
    jl_w = jl * w[:, None, None]

    # Block-diagonal normal equations via segment_sum (H = sum w J^T J,
    # b = -sum w J^T r).
    hcc = jax.ops.segment_sum(
        jnp.einsum("oia,oib->oab", jc_w, jc), problem.cam_idx, c_n
    ) + damping * jnp.eye(6)
    hll = jax.ops.segment_sum(
        jnp.einsum("oia,oib->oab", jl_w, jl), problem.lm_idx, l_n
    ) + damping * jnp.eye(3)
    b_c = -jax.ops.segment_sum(
        jnp.einsum("oia,oi->oa", jc_w, r), problem.cam_idx, c_n
    )
    b_l = -jax.ops.segment_sum(
        jnp.einsum("oia,oi->oa", jl_w, r), problem.lm_idx, l_n
    )

    # Landmark-camera coupling W [L, C, 6, 3] via flat segment ids.
    w_blocks = jnp.einsum("oia,oib->oab", jc_w, jl)
    flat = problem.lm_idx * c_n + problem.cam_idx
    wd = jax.ops.segment_sum(w_blocks, flat, l_n * c_n).reshape(
        l_n, c_n, 6, 3
    )

    hll_inv = jnp.linalg.inv(hll)                       # [L,3,3]
    t1 = jnp.einsum("lcab,lbd->lcad", wd, hll_inv)      # [L,C,6,3]
    # Schur complement S = blockdiag(Hcc) - sum_l W_l Hll_l^-1 W_l^T,
    # assembled as a dense [6C, 6C] system.
    s = jnp.zeros((c_n, 6, c_n, 6))
    s = s.at[jnp.arange(c_n), :, jnp.arange(c_n), :].add(hcc)
    cross = jnp.einsum("lcad,lebd->caeb", t1, wd)       # [C,6,C,6]
    s = s - cross
    rhs = b_c - jnp.einsum("lcad,ld->ca", t1, b_l)      # [C,6]

    s_mat = s.reshape(c_n * 6, c_n * 6)
    # Keep fixed cameras exactly fixed: identity rows/cols.
    fixed_mask = (
        jnp.arange(c_n * 6) < problem.fixed_cameras * 6
    ).astype(jnp.float32)
    s_mat = (
        s_mat * (1 - fixed_mask)[:, None] * (1 - fixed_mask)[None, :]
        + jnp.diag(fixed_mask)
    )
    rhs_vec = rhs.reshape(-1) * (1 - fixed_mask)

    d_cam = jnp.linalg.solve(s_mat, rhs_vec).reshape(c_n, 6)
    # Back-substitute landmarks: dl = Hll^-1 (b_l - W^T dc).
    wt_dc = jnp.einsum("lcab,ca->lb", wd, d_cam)        # [L,3]
    d_lm = jnp.einsum("lab,lb->la", hll_inv, b_l - wt_dc)
    return d_cam, d_lm


def bundle_adjust(
    problem: BAProblem,
    n_iterations: int = 10,
    damping: float = 1e-4,
    huber_delta: float = 0.0,
) -> Tuple[BAProblem, BAStats]:
    """Fixed-iteration damped Gauss-Newton BA (jittable).

    ``huber_delta`` <= 0 selects plain least squares; > 0 enables Huber
    IRLS weights with that pixel threshold. Levenberg-Marquardt trust
    control in jit-safe form: a rejected step leaves the state unchanged
    and inflates the damping 10x; an accepted step relaxes it 2x.
    """
    hd = huber_delta if huber_delta > 0 else 1e12

    def body(_, state):
        cameras, landmarks, lam = state
        p = problem._replace(cameras=cameras, landmarks=landmarks)
        # HIGHEST: the normal-equation einsums and the [6C,6C] solve must
        # not run through the TPU's default bf16 matmul path.
        with jax.default_matmul_precision("highest"):
            d_cam, d_lm = _gauss_newton_step(cameras, landmarks, p, lam, hd)
        new_cams = cameras + d_cam
        new_lms = landmarks + d_lm
        # Accept/reject on the SAME (robust) objective the step minimizes.
        c0 = cost(p, huber_delta)
        c1 = cost(
            p._replace(cameras=new_cams, landmarks=new_lms), huber_delta
        )
        accept = c1 < c0
        cameras = jnp.where(accept, new_cams, cameras)
        landmarks = jnp.where(accept, new_lms, landmarks)
        lam = jnp.where(accept, lam * 0.5, lam * 10.0)
        lam = jnp.clip(lam, 1e-8, 1e6)
        return cameras, landmarks, lam

    c_init = cost(problem)
    cameras, landmarks, _ = lax.fori_loop(
        0,
        n_iterations,
        body,
        (problem.cameras, problem.landmarks, jnp.float32(damping)),
    )
    out = problem._replace(cameras=cameras, landmarks=landmarks)
    stats = BAStats(
        initial_cost=c_init,
        final_cost=cost(out),
        n_observations=jnp.sum(problem.valid.astype(jnp.int32)),
    )
    return out, stats
