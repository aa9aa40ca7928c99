"""Multi-chip bundle adjustment: landmarks sharded over the device mesh.

The distributed Schur-complement design from SURVEY.md §2c/§7: landmark
blocks (Hll, b_l, the coupling tensor W and the back-substitution) are
embarrassingly parallel in the landmark index, so each device owns a
contiguous landmark shard plus exactly the observations that reference it;
the reduced camera system S = Hcc - sum_l W_l Hll_l^-1 W_l^T and its
right-hand side are formed locally and combined with ONE psum over ICI;
every device then solves the small replicated [6C, 6C] system and
back-substitutes its own landmarks. Per iteration the only communication
is psum(S) + psum(rhs) + psum(cost) — O(C^2) floats, independent of L.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..slam.ba import BAProblem, _huber_weight
from ..slam.camera import project


class ShardedBA(NamedTuple):
    """Host-prepared landmark-sharded BA problem (leading axis = device)."""

    cameras: jnp.ndarray    # [C, 6] replicated
    landmarks: jnp.ndarray  # [D, L/D, 3]
    k: jnp.ndarray          # [3, 3]
    cam_idx: jnp.ndarray    # [D, O/D] int32
    lm_idx: jnp.ndarray     # [D, O/D] int32 — LOCAL landmark index
    uv: jnp.ndarray         # [D, O/D, 2]
    valid: jnp.ndarray      # [D, O/D] bool
    fixed_cameras: int


def shard_ba_problem(problem: BAProblem, n_devices: int) -> ShardedBA:
    """Partition landmarks contiguously and group observations by owning
    shard (host-side, numpy)."""
    l_n = problem.landmarks.shape[0]
    assert l_n % n_devices == 0, (l_n, n_devices)
    per = l_n // n_devices

    lm_idx = np.asarray(problem.lm_idx)
    cam_idx = np.asarray(problem.cam_idx)
    uv = np.asarray(problem.uv)
    valid = np.asarray(problem.valid)

    shard_of = lm_idx // per
    max_obs = 0
    groups = []
    for d in range(n_devices):
        sel = np.nonzero((shard_of == d) & valid)[0]
        groups.append(sel)
        max_obs = max(max_obs, len(sel))
    max_obs = max(1, (max_obs + 7) // 8 * 8)

    def pad(arr, sel, fill=0):
        out = np.full((max_obs,) + arr.shape[1:], fill, dtype=arr.dtype)
        out[: len(sel)] = arr[sel]
        return out

    return ShardedBA(
        cameras=problem.cameras,
        landmarks=problem.landmarks.reshape(n_devices, per, 3),
        k=problem.k,
        cam_idx=jnp.asarray(
            np.stack([pad(cam_idx, g) for g in groups])
        ),
        lm_idx=jnp.asarray(
            np.stack([pad(lm_idx % per, g) for g in groups])
        ),
        uv=jnp.asarray(np.stack([pad(uv, g) for g in groups])),
        valid=jnp.asarray(
            np.stack(
                [
                    np.arange(max_obs) < len(g)
                    for g in groups
                ]
            )
        ),
        fixed_cameras=problem.fixed_cameras,
    )


def _residual(cam, lm, k, uv):
    return project(cam, k, lm) - uv


def make_distributed_ba(
    mesh: Mesh,
    n_iterations: int = 10,
    damping: float = 1e-4,
    huber_delta: float = 0.0,
    axis: str = "batch",
):
    """Compiled landmark-sharded BA: ShardedBA -> (cameras, landmarks[D,L/D,3],
    (initial_cost, final_cost))."""
    hd = huber_delta if huber_delta > 0 else 1e12

    def local_cost(cameras, landmarks, s: ShardedBA, delta):
        r = jax.vmap(
            lambda c, l, uv: _residual(cameras[c], landmarks[l], s.k, uv)
        )(s.cam_idx, s.lm_idx, s.uv)
        norm = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12) * s.valid
        if huber_delta > 0:
            rho = jnp.where(
                norm <= delta, 0.5 * norm * norm, delta * (norm - 0.5 * delta)
            )
        else:
            rho = 0.5 * norm * norm
        return lax.psum(jnp.sum(rho), axis)

    def step(cameras, landmarks, s: ShardedBA, lam):
        c_n = cameras.shape[0]
        l_n = landmarks.shape[0]

        def jac_one(c, l, uv):
            cam = cameras[c]
            lm = landmarks[l]
            r = _residual(cam, lm, s.k, uv)
            jc = jax.jacfwd(lambda cc: _residual(cc, lm, s.k, uv))(cam)
            jl = jax.jacfwd(lambda ll: _residual(cam, ll, s.k, uv))(lm)
            return r, jc, jl

        r, jc, jl = jax.vmap(jac_one)(s.cam_idx, s.lm_idx, s.uv)
        w = _huber_weight(r, hd) * s.valid
        free = (s.cam_idx >= s.fixed_cameras).astype(jnp.float32)
        jc = jc * free[:, None, None]
        jc_w = jc * w[:, None, None]
        jl_w = jl * w[:, None, None]

        hcc_local = jax.ops.segment_sum(
            jnp.einsum("oia,oib->oab", jc_w, jc), s.cam_idx, c_n
        )
        hll = jax.ops.segment_sum(
            jnp.einsum("oia,oib->oab", jl_w, jl), s.lm_idx, l_n
        ) + lam * jnp.eye(3)
        b_c_local = -jax.ops.segment_sum(
            jnp.einsum("oia,oi->oa", jc_w, r), s.cam_idx, c_n
        )
        b_l = -jax.ops.segment_sum(
            jnp.einsum("oia,oi->oa", jl_w, r), s.lm_idx, l_n
        )

        w_blocks = jnp.einsum("oia,oib->oab", jc_w, jl)
        flat = s.lm_idx * c_n + s.cam_idx
        wd = jax.ops.segment_sum(w_blocks, flat, l_n * c_n).reshape(
            l_n, c_n, 6, 3
        )
        hll_inv = jnp.linalg.inv(hll)
        t1 = jnp.einsum("lcab,lbd->lcad", wd, hll_inv)
        cross_local = jnp.einsum("lcad,lebd->caeb", t1, wd)
        rhs_local = b_c_local - jnp.einsum("lcad,ld->ca", t1, b_l)

        # ONE psum each for the reduced system pieces (O(C^2), not O(L)).
        hcc = lax.psum(hcc_local, axis) + lam * jnp.eye(6)
        cross = lax.psum(cross_local, axis)
        rhs = lax.psum(rhs_local, axis)

        sm = jnp.zeros((c_n, 6, c_n, 6))
        sm = sm.at[jnp.arange(c_n), :, jnp.arange(c_n), :].add(hcc)
        sm = (sm - cross).reshape(c_n * 6, c_n * 6)
        fixed_mask = (
            jnp.arange(c_n * 6) < s.fixed_cameras * 6
        ).astype(jnp.float32)
        sm = (
            sm * (1 - fixed_mask)[:, None] * (1 - fixed_mask)[None, :]
            + jnp.diag(fixed_mask)
        )
        rhs_vec = rhs.reshape(-1) * (1 - fixed_mask)
        d_cam = jnp.linalg.solve(sm, rhs_vec).reshape(c_n, 6)

        wt_dc = jnp.einsum("lcab,ca->lb", wd, d_cam)
        d_lm = jnp.einsum("lab,lb->la", hll_inv, b_l - wt_dc)
        return d_cam, d_lm

    def run_shard(cameras, landmarks, cam_idx, lm_idx, uv, valid, k):
        s = ShardedBA(
            cameras=cameras,
            landmarks=landmarks,
            k=k,
            cam_idx=cam_idx,
            lm_idx=lm_idx,
            uv=uv,
            valid=valid,
            fixed_cameras=fixed_cameras_static[0],
        )

        def body(_, state):
            cams, lms, lam = state
            with jax.default_matmul_precision("highest"):
                d_cam, d_lm = step(cams, lms, s, lam)
            new_c = cams + d_cam
            new_l = lms + d_lm
            c0 = local_cost(cams, lms, s, hd)
            c1 = local_cost(new_c, new_l, s, hd)
            accept = c1 < c0
            cams = jnp.where(accept, new_c, cams)
            lms = jnp.where(accept, new_l, lms)
            lam = jnp.clip(
                jnp.where(accept, lam * 0.5, lam * 10.0), 1e-8, 1e6
            )
            return cams, lms, lam

        c_init = local_cost(cameras, landmarks, s, hd)
        cams, lms, _ = lax.fori_loop(
            0, n_iterations, body,
            (cameras, landmarks, jnp.float32(damping)),
        )
        c_fin = local_cost(cams, lms, s, hd)
        return cams, lms, c_init, c_fin

    fixed_cameras_static = [1]

    def run(sharded: ShardedBA):
        fixed_cameras_static[0] = sharded.fixed_cameras
        f = jax.shard_map(
            run_shard,
            mesh=mesh,
            in_specs=(
                P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(),
            ),
            out_specs=(P(), P(axis), P(), P()),
            check_vma=False,
        )
        # shard_map consumes the leading device axis of sharded arrays.
        d = sharded.landmarks.shape[0]

        def merge(a):
            return a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])

        cams, lms, c0, c1 = jax.jit(f)(
            sharded.cameras,
            merge(sharded.landmarks),
            merge(sharded.cam_idx),
            merge(sharded.lm_idx),
            merge(sharded.uv),
            merge(sharded.valid),
            sharded.k,
        )
        return cams, lms.reshape(sharded.landmarks.shape), (c0, c1)

    return run
