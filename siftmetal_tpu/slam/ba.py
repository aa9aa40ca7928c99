"""Bundle adjustment: Gauss-Newton/LM with Schur complement, TPU-native.

New capability (SURVEY.md §7 step 6; the reference has no optimization
back-end). Design choices for TPU:

  * Observations are a padded SoA (cam_idx, lm_idx, uv, valid) — static
    shapes, masked semantics, like every other stage of this framework.
  * Jacobians come from ``jax.jacfwd`` of the per-observation residual,
    vmapped over observations — no hand-derived derivative code.
  * The normal equations are reduced with ``segment_sum`` into block
    diagonals (Hcc [C,6,6], Hll [L,3,3]); the landmark-camera coupling is
    NEVER materialized as a dense [L,C,6,3] tensor (the r1 design — O(L*C)
    memory regardless of sparsity, VERDICT r1 #5). Instead observations
    are grouped by landmark into [L, M] slots (M = max observations per
    landmark) and the Schur cross term sum_l W_l Hll_l^-1 W_l^T is
    accumulated from OBSERVED camera pairs only: for each landmark, its
    <= M*M slot pairs scatter [6,6] blocks into the [C*C] reduced system
    via segment_sum, chunked over landmarks to bound the transient.
    Memory: O(L*M^2) transient per chunk + O(C^2) output — independent of
    the landmark-camera product.
  * The camera system after eliminating landmarks is a dense [6C, 6C]
    solve — cameras are few, landmarks are many (standard BA
    factorization, laid out for the MXU instead of sparse triangular
    solves).
  * The landmark axis is embarrassingly shardable: each device owns a
    landmark shard + its grouped observations; the reduced system is
    combined with ONE psum — see parallel/distributed_ba.py.
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
    # Observations dropped because a landmark exceeded max_obs_per_landmark
    # slots (counted, never silent — repo invariant).
    obs_dropped: jnp.ndarray


class GroupedObs(NamedTuple):
    """Observations grouped by landmark into [L, M] padded slots."""

    cam: jnp.ndarray      # [L, M] int32 — camera index (0 for padding)
    uv: jnp.ndarray       # [L, M, 2]
    valid: jnp.ndarray    # [L, M] bool
    dropped: jnp.ndarray  # scalar int32


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
    """Per-observation IRLS weight for the Huber loss, [..., 2] -> [...]."""
    norm = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12)
    return jnp.where(norm <= delta, 1.0, delta / norm)


def group_by_landmark(
    cam_idx: jnp.ndarray,
    lm_idx: jnp.ndarray,
    uv: jnp.ndarray,
    valid: jnp.ndarray,
    n_landmarks: int,
    max_obs_per_landmark: int,
) -> GroupedObs:
    """Jit-safe regrouping of flat observations into [L, M] slots.

    Stable-sorts by landmark, derives each observation's slot as its rank
    within the landmark's run, and scatters into the padded grid.
    Overflowing observations (landmark degree > M) are dropped AND
    counted.
    """
    o = lm_idx.shape[0]
    m = max_obs_per_landmark
    key = jnp.where(valid, lm_idx, n_landmarks)  # invalid -> overflow bucket
    order = jnp.argsort(key, stable=True)
    skey = key[order]
    first = jnp.searchsorted(skey, skey, side="left")
    slot = jnp.arange(o) - first
    keep = (skey < n_landmarks) & (slot < m)
    tgt = jnp.where(keep, skey * m + slot, n_landmarks * m)

    cam_g = jnp.zeros((n_landmarks * m,), jnp.int32).at[tgt].set(
        cam_idx[order], mode="drop"
    )
    uv_g = jnp.zeros((n_landmarks * m, 2), uv.dtype).at[tgt].set(
        uv[order], mode="drop"
    )
    val_g = jnp.zeros((n_landmarks * m,), bool).at[tgt].set(
        keep, mode="drop"
    )
    dropped = jnp.sum(((skey < n_landmarks) & (slot >= m)).astype(jnp.int32))
    return GroupedObs(
        cam=cam_g.reshape(n_landmarks, m),
        uv=uv_g.reshape(n_landmarks, m, 2),
        valid=val_g.reshape(n_landmarks, m),
        dropped=dropped,
    )


def _pair_chunk(m: int) -> int:
    """Landmarks per Schur-pair chunk: bounds the [chunk, M, M, 6, 6]
    transient to ~32 MB."""
    return max(128, (1 << 23) // max(1, m * m * 144))


def grouped_cost(cameras, landmarks, k, g: GroupedObs, huber_delta):
    r = jax.vmap(
        jax.vmap(
            lambda c, l, uv: _residual(cameras[c], landmarks[l], k, uv),
            in_axes=(0, None, 0),
        )
    )(g.cam, jnp.arange(landmarks.shape[0]), g.uv)
    norm = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12) * g.valid
    if huber_delta > 0:
        d = huber_delta
        rho = jnp.where(norm <= d, 0.5 * norm * norm, d * (norm - 0.5 * d))
    else:
        rho = 0.5 * norm * norm
    return jnp.sum(rho)


def schur_pieces(
    cameras, landmarks, k, g: GroupedObs, n_cameras, lam, hd, fixed_cameras
):
    """Per-shard reduced-system pieces from grouped observations.

    Returns (hcc [C,6,6], cross [C*C,6,6], rhs [C,6], hll_inv [L,3,3],
    coupling G [L,M,6,3], b_l [L,3]) — everything needed to finish a
    Gauss-Newton step after (an optional psum of) the first three.
    """
    c_n = n_cameras
    l_n, m = g.cam.shape
    lm_f = jnp.repeat(jnp.arange(l_n, dtype=jnp.int32), m)
    cam_f = g.cam.reshape(-1)
    uv_f = g.uv.reshape(-1, 2)

    def jac_one(c, l, uv):
        cam = cameras[c]
        lm = landmarks[l]
        r = _residual(cam, lm, k, uv)
        jc = jax.jacfwd(lambda cc: _residual(cc, lm, k, uv))(cam)
        jl = jax.jacfwd(lambda ll: _residual(cam, ll, k, uv))(lm)
        return r, jc, jl

    r, jc, jl = jax.vmap(jac_one)(cam_f, lm_f, uv_f)
    w = _huber_weight(r, hd) * g.valid.reshape(-1)
    # Fixed cameras (gauge): zero their Jacobian so their update is 0.
    free = (cam_f >= fixed_cameras).astype(jnp.float32)
    jc = jc * free[:, None, None]
    jc_w = jc * w[:, None, None]
    jl_w = jl * w[:, None, None]

    hcc = jax.ops.segment_sum(
        jnp.einsum("oia,oib->oab", jc_w, jc), cam_f, c_n
    )
    b_c = -jax.ops.segment_sum(
        jnp.einsum("oia,oi->oa", jc_w, r), cam_f, c_n
    )

    jcg = jc_w.reshape(l_n, m, 2, 6)
    jlg = jl.reshape(l_n, m, 2, 3)
    jl_wg = jl_w.reshape(l_n, m, 2, 3)
    rg = (r * w[:, None]).reshape(l_n, m, 2)
    rg_raw = r.reshape(l_n, m, 2)

    hll = jnp.einsum("lmia,lmib->lab", jl_wg, jlg) + lam * jnp.eye(3)
    b_l = -jnp.einsum("lmia,lmi->la", jl_wg, rg_raw)
    # Coupling blocks per OBSERVATION slot (the w weight rides on jc_w):
    # W_l's camera-c block is the sum of G over that landmark's slots
    # observed by c — but we never materialize it; pairs below do.
    G = jnp.einsum("lmia,lmib->lmab", jcg, jlg)          # [L, M, 6, 3]
    hll_inv = jnp.linalg.inv(hll)
    y = jnp.einsum("lab,lb->la", hll_inv, b_l)           # [L, 3]
    rhs = b_c - jax.ops.segment_sum(
        jnp.einsum("lmab,lb->lma", G, y).reshape(-1, 6), cam_f, c_n
    )

    # Schur cross term from observed camera PAIRS only, chunked over
    # landmarks: blocks[l, m, n] = G_{lm} Hll_l^-1 G_{ln}^T scattered at
    # (cam_{lm}, cam_{ln}).
    P = jnp.einsum("lmab,lbd->lmad", G, hll_inv)          # [L, M, 6, 3]
    chunk = _pair_chunk(m)
    n_chunks = (l_n + chunk - 1) // chunk
    lp = n_chunks * chunk

    def padl(a):
        return jnp.pad(a, ((0, lp - l_n),) + ((0, 0),) * (a.ndim - 1))

    pc = padl(P).reshape(n_chunks, chunk, m, 6, 3)
    gc = padl(G).reshape(n_chunks, chunk, m, 6, 3)
    camc = padl(g.cam).reshape(n_chunks, chunk, m)

    def body(acc, inp):
        p_c, g_c, c_c = inp
        blocks = jnp.einsum("lmad,lnbd->lmnab", p_c, g_c)
        fid = (c_c[:, :, None] * c_n + c_c[:, None, :]).reshape(-1)
        acc = acc + jax.ops.segment_sum(
            blocks.reshape(-1, 6, 6), fid, c_n * c_n
        )
        return acc, None

    cross, _ = lax.scan(
        body, jnp.zeros((c_n * c_n, 6, 6)), (pc, gc, camc)
    )
    return hcc, cross, rhs, hll_inv, G, b_l


def finish_step(
    hcc, cross, rhs, hll_inv, G, b_l, cam_g, n_cameras, lam, fixed_cameras
):
    """Solve the reduced camera system and back-substitute landmarks."""
    c_n = n_cameras
    s = jnp.zeros((c_n, 6, c_n, 6))
    s = s.at[jnp.arange(c_n), :, jnp.arange(c_n), :].add(
        hcc + lam * jnp.eye(6)
    )
    s = s - cross.reshape(c_n, c_n, 6, 6).transpose(0, 2, 1, 3)
    s_mat = s.reshape(c_n * 6, c_n * 6)
    fixed_mask = (
        jnp.arange(c_n * 6) < fixed_cameras * 6
    ).astype(jnp.float32)
    s_mat = (
        s_mat * (1 - fixed_mask)[:, None] * (1 - fixed_mask)[None, :]
        + jnp.diag(fixed_mask)
    )
    rhs_vec = rhs.reshape(-1) * (1 - fixed_mask)
    d_cam = jnp.linalg.solve(s_mat, rhs_vec).reshape(c_n, 6)

    # Back-substitute landmarks: dl = Hll^-1 (b_l - W^T dc), with
    # W^T dc = sum_m G_{lm}^T dc[cam_{lm}].
    dc_g = d_cam[cam_g]                                   # [L, M, 6]
    wt_dc = jnp.einsum("lmab,lma->lb", G, dc_g)           # [L, 3]
    d_lm = jnp.einsum("lab,lb->la", hll_inv, b_l - wt_dc)
    return d_cam, d_lm


def _gauss_newton_step(cameras, landmarks, k, g, n_cameras, lam, hd, fixed):
    hcc, cross, rhs, hll_inv, G, b_l = schur_pieces(
        cameras, landmarks, k, g, n_cameras, lam, hd, fixed
    )
    return finish_step(
        hcc, cross, rhs, hll_inv, G, b_l, g.cam, n_cameras, lam, fixed
    )


def bundle_adjust(
    problem: BAProblem,
    n_iterations: int = 10,
    damping: float = 1e-4,
    huber_delta: float = 0.0,
    max_obs_per_landmark: int = 16,
) -> Tuple[BAProblem, BAStats]:
    """Fixed-iteration damped Gauss-Newton BA (jittable).

    ``huber_delta`` <= 0 selects plain least squares; > 0 enables Huber
    IRLS weights with that pixel threshold. Levenberg-Marquardt trust
    control in jit-safe form: a rejected step leaves the state unchanged
    and inflates the damping 10x; an accepted step relaxes it 2x.
    ``max_obs_per_landmark`` bounds the grouped layout; observations past
    it are dropped and counted in ``stats.obs_dropped``.
    """
    hd = huber_delta if huber_delta > 0 else 1e12
    l_n = problem.landmarks.shape[0]
    c_n = problem.cameras.shape[0]
    g = group_by_landmark(
        problem.cam_idx, problem.lm_idx, problem.uv, problem.valid,
        l_n, max_obs_per_landmark,
    )

    def body(_, state):
        cameras, landmarks, lam = state
        # HIGHEST: the normal-equation einsums and the [6C,6C] solve must
        # not run through the TPU's default bf16 matmul path.
        with jax.default_matmul_precision("highest"):
            d_cam, d_lm = _gauss_newton_step(
                cameras, landmarks, problem.k, g, c_n, lam,
                hd, problem.fixed_cameras,
            )
        new_cams = cameras + d_cam
        new_lms = landmarks + d_lm
        # Accept/reject on the SAME (robust) objective the step minimizes.
        c0 = grouped_cost(cameras, landmarks, problem.k, g, huber_delta)
        c1 = grouped_cost(new_cams, new_lms, problem.k, g, huber_delta)
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
        obs_dropped=g.dropped,
    )
    return out, stats
