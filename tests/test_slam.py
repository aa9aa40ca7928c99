"""Bundle adjustment + camera math on synthetic scenes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from siftmetal_tpu.slam.ba import BAProblem, bundle_adjust, cost, residuals
from siftmetal_tpu.slam.camera import (
    compose,
    inverse,
    project,
    relative,
    rodrigues,
    so3_log,
)


def test_rodrigues_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        w = rng.uniform(-1.5, 1.5, 3).astype(np.float32)
        r = np.asarray(rodrigues(jnp.asarray(w)))
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        w2 = np.asarray(so3_log(jnp.asarray(r)))
        np.testing.assert_allclose(w, w2, atol=1e-4)


def test_compose_inverse():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(-0.5, 0.5, 6).astype(np.float32))
    b = jnp.asarray(rng.uniform(-0.5, 0.5, 6).astype(np.float32))
    ident = np.asarray(compose(a, inverse(a)))
    np.testing.assert_allclose(ident, np.zeros(6), atol=1e-5)
    rel = relative(a, b)
    # x_b == rel(x_a) for a random point.
    x = jnp.asarray(rng.uniform(-1, 1, 3).astype(np.float32))
    from siftmetal_tpu.slam.camera import transform

    np.testing.assert_allclose(
        np.asarray(transform(rel, transform(a, x))),
        np.asarray(transform(b, x)),
        atol=1e-5,
    )


@pytest.fixture
def ba_scene():
    rng = np.random.default_rng(42)
    n_cam, n_lm = 6, 256
    k = np.array([[400, 0, 320], [0, 400, 240], [0, 0, 1]], dtype=np.float32)
    lms = rng.uniform([-3, -3, 6], [3, 3, 12], (n_lm, 3)).astype(np.float32)
    cams = np.zeros((n_cam, 6), dtype=np.float32)
    cams[:, 3] = np.linspace(-1, 1, n_cam)          # tx baseline
    cams[:, :3] = rng.uniform(-0.05, 0.05, (n_cam, 3))

    cam_idx = np.repeat(np.arange(n_cam), n_lm).astype(np.int32)
    lm_idx = np.tile(np.arange(n_lm), n_cam).astype(np.int32)
    uv = np.stack(
        [
            np.asarray(
                project(jnp.asarray(cams[c]), jnp.asarray(k), jnp.asarray(lms[l]))
            )
            for c, l in zip(cam_idx, lm_idx)
        ]
    ).astype(np.float32)
    valid = np.ones(len(uv), dtype=bool)
    return cams, lms, k, cam_idx, lm_idx, uv, valid


def test_ba_converges(ba_scene):
    cams, lms, k, cam_idx, lm_idx, uv, valid = ba_scene
    rng = np.random.default_rng(0)
    noisy_cams = cams + rng.normal(0, 0.01, cams.shape).astype(np.float32)
    noisy_cams[:2] = cams[:2]  # gauge: first two cameras fixed
    noisy_lms = lms + rng.normal(0, 0.05, lms.shape).astype(np.float32)

    problem = BAProblem(
        cameras=jnp.asarray(noisy_cams),
        landmarks=jnp.asarray(noisy_lms),
        k=jnp.asarray(k),
        cam_idx=jnp.asarray(cam_idx),
        lm_idx=jnp.asarray(lm_idx),
        uv=jnp.asarray(uv),
        valid=jnp.asarray(valid),
        fixed_cameras=2,
    )
    out, stats = jax.jit(
        lambda p: bundle_adjust(p, n_iterations=8, damping=1e-4)
    )(problem)
    assert float(stats.initial_cost) > 1e3
    assert float(stats.final_cost) < 1e-2 * float(stats.initial_cost)
    rms = np.sqrt(
        2 * float(stats.final_cost) / float(stats.n_observations)
    )
    assert rms < 0.05, rms  # sub-0.05px mean reprojection after BA
    # Fixed cameras untouched.
    np.testing.assert_array_equal(np.asarray(out.cameras[:2]), noisy_cams[:2])


def test_ba_huber_rejects_outliers(ba_scene):
    cams, lms, k, cam_idx, lm_idx, uv, valid = ba_scene
    rng = np.random.default_rng(5)
    uv_bad = uv.copy()
    n_out = 100
    out_sel = rng.choice(len(uv), n_out, replace=False)
    uv_bad[out_sel] += rng.uniform(30, 80, (n_out, 2)).astype(np.float32)

    noisy_lms = lms + rng.normal(0, 0.05, lms.shape).astype(np.float32)
    problem = BAProblem(
        cameras=jnp.asarray(cams),
        landmarks=jnp.asarray(noisy_lms),
        k=jnp.asarray(k),
        cam_idx=jnp.asarray(cam_idx),
        lm_idx=jnp.asarray(lm_idx),
        uv=jnp.asarray(uv_bad),
        valid=jnp.asarray(valid),
        fixed_cameras=2,
    )
    out_plain, _ = jax.jit(
        lambda p: bundle_adjust(p, n_iterations=25, damping=1e-4)
    )(problem)
    out_huber, _ = jax.jit(
        lambda p: bundle_adjust(
            p, n_iterations=25, damping=1e-4, huber_delta=2.0
        )
    )(problem)
    # Landmarks not touched by any outlier observation must be recovered;
    # plain least squares lets the outliers poison the whole solution.
    hit = np.zeros(len(lms), dtype=bool)
    hit[lm_idx[out_sel]] = True
    err_plain = np.linalg.norm(
        np.asarray(out_plain.landmarks) - lms, axis=1
    )[~hit].mean()
    err_huber = np.linalg.norm(
        np.asarray(out_huber.landmarks) - lms, axis=1
    )[~hit].mean()
    assert err_huber < 0.1 * err_plain, (err_huber, err_plain)
    assert err_huber < 0.05, err_huber
    # Free cameras stay near ground truth under the robust loss.
    assert np.abs(np.asarray(out_huber.cameras) - cams).max() < 0.05


def test_pose_graph_closes_loop():
    from siftmetal_tpu.slam.pose_graph import (
        PoseGraph,
        graph_cost,
        optimize_pose_graph,
    )
    from siftmetal_tpu.slam.camera import relative

    rng = np.random.default_rng(9)
    n = 12
    # Ground truth: poses around a circle.
    angles = np.linspace(0, 2 * np.pi, n, endpoint=False)
    gt = np.zeros((n, 6), dtype=np.float32)
    gt[:, 2] = angles                      # yaw about z
    gt[:, 3] = np.cos(angles) * 2.0
    gt[:, 4] = np.sin(angles) * 2.0

    # Odometry edges (i -> i+1) + loop closure (n-1 -> 0), exact
    # measurements, noisy initial poses.
    ei = np.arange(n, dtype=np.int32)
    ej = np.roll(np.arange(n, dtype=np.int32), -1)
    rel = np.stack(
        [
            np.asarray(relative(jnp.asarray(gt[i]), jnp.asarray(gt[j])))
            for i, j in zip(ei, ej)
        ]
    ).astype(np.float32)

    noisy = gt + rng.normal(0, 0.05, gt.shape).astype(np.float32)
    noisy[0] = gt[0]
    g = PoseGraph(
        poses=jnp.asarray(noisy),
        edge_i=jnp.asarray(ei),
        edge_j=jnp.asarray(ej),
        rel_ij=jnp.asarray(rel),
        weight=jnp.ones(n),
        fixed=1,
    )
    c0 = float(graph_cost(g))
    out, c1 = jax.jit(lambda x: optimize_pose_graph(x, n_iterations=30))(g)
    assert float(c1) < 1e-6 * c0, (c0, float(c1))
    # With edges exact and pose 0 fixed, ground truth is recovered.
    assert np.abs(np.asarray(out.poses) - gt).max() < 1e-2


def test_pnp_ransac_recovers_pose():
    from siftmetal_tpu.slam.pnp import pnp_ransac

    rng = np.random.default_rng(11)
    n = 128
    k = np.array([[450, 0, 320], [0, 450, 240], [0, 0, 1]], dtype=np.float32)
    pts = rng.uniform([-2, -2, 5], [2, 2, 10], (n, 3)).astype(np.float32)
    cam_true = np.array([0.1, -0.05, 0.2, 0.3, -0.1, 0.4], dtype=np.float32)
    uv = np.asarray(
        jax.vmap(lambda p: project(jnp.asarray(cam_true), jnp.asarray(k), p))(
            jnp.asarray(pts)
        )
    )
    uv_bad = uv.copy()
    uv_bad[:30] += rng.uniform(40, 120, (30, 2)).astype(np.float32)  # outliers
    res = jax.jit(
        lambda key, p, o, v: pnp_ransac(key, p, o, v, jnp.asarray(k))
    )(jax.random.PRNGKey(2), jnp.asarray(pts), jnp.asarray(uv_bad),
      jnp.ones(n, dtype=bool))
    assert bool(res.ok)
    inl = np.asarray(res.inliers)
    assert inl[30:].mean() > 0.97, inl[30:].mean()
    assert inl[:30].mean() < 0.05
    cam = np.asarray(res.model)
    assert np.abs(cam - cam_true).max() < 5e-3, cam - cam_true


def test_ba_scales_to_mapping_size():
    """256 cameras / 65,536 landmarks / ~200k observations on one device:
    the grouped Schur path must run without materializing any
    O(L*C)-sized tensor (the r1 dense coupling would want
    256*65536*18*4 bytes = 1.2 GB for W alone, plus einsum transients;
    VERDICT r1 #5). Convergence on a clean synthetic problem is asserted
    loosely (few iterations — this is a capacity test)."""
    from siftmetal_tpu.slam.camera import project

    rng = np.random.default_rng(0)
    n_cam, n_lm, deg = 256, 65536, 3
    k = np.array([[400, 0, 320], [0, 400, 240], [0, 0, 1]], np.float32)
    lms = rng.uniform([-8, -8, 6], [8, 8, 30], (n_lm, 3)).astype(np.float32)
    cams = np.zeros((n_cam, 6), np.float32)
    cams[:, 3] = np.linspace(-4, 4, n_cam)
    cams[:, 1] = np.linspace(0, 0.2, n_cam)

    # Each landmark observed by `deg` consecutive cameras.
    first = rng.integers(0, n_cam - deg, n_lm)
    cam_idx = (first[:, None] + np.arange(deg)[None, :]).reshape(-1)
    lm_idx = np.repeat(np.arange(n_lm), deg)
    uv = np.asarray(
        jax.vmap(
            lambda c, l: project(
                jnp.asarray(cams)[c], jnp.asarray(k), jnp.asarray(lms)[l]
            )
        )(jnp.asarray(cam_idx.astype(np.int32)),
          jnp.asarray(lm_idx.astype(np.int32)))
    )
    noisy_cams = cams + rng.normal(0, 0.002, cams.shape).astype(np.float32)
    noisy_cams[:2] = cams[:2]
    noisy_lms = lms + rng.normal(0, 0.01, lms.shape).astype(np.float32)
    problem = BAProblem(
        cameras=jnp.asarray(noisy_cams),
        landmarks=jnp.asarray(noisy_lms),
        k=jnp.asarray(k),
        cam_idx=jnp.asarray(cam_idx.astype(np.int32)),
        lm_idx=jnp.asarray(lm_idx.astype(np.int32)),
        uv=jnp.asarray(uv),
        valid=jnp.ones(len(cam_idx), bool),
        fixed_cameras=2,
    )
    out, stats = jax.jit(
        lambda p: bundle_adjust(
            p, n_iterations=3, damping=1e-4, max_obs_per_landmark=4
        )
    )(problem)
    assert int(stats.obs_dropped) == 0
    assert float(stats.final_cost) < 0.5 * float(stats.initial_cost)


def test_ba_counts_dropped_observations():
    """Landmarks with degree > max_obs_per_landmark must DROP and COUNT."""
    from siftmetal_tpu.slam.camera import project

    rng = np.random.default_rng(1)
    n_cam, n_lm = 6, 8
    k = np.array([[100, 0, 32], [0, 100, 24], [0, 0, 1]], np.float32)
    lms = rng.uniform([-1, -1, 4], [1, 1, 8], (n_lm, 3)).astype(np.float32)
    cams = np.zeros((n_cam, 6), np.float32)
    cams[:, 3] = np.linspace(0, 0.5, n_cam)
    cam_idx = np.tile(np.arange(n_cam), n_lm).astype(np.int32)
    lm_idx = np.repeat(np.arange(n_lm), n_cam).astype(np.int32)
    uv = np.asarray(
        jax.vmap(
            lambda c, l: project(
                jnp.asarray(cams)[c], jnp.asarray(k), jnp.asarray(lms)[l]
            )
        )(jnp.asarray(cam_idx), jnp.asarray(lm_idx))
    )
    problem = BAProblem(
        cameras=jnp.asarray(cams + 0.01),
        landmarks=jnp.asarray(lms),
        k=jnp.asarray(k),
        cam_idx=jnp.asarray(cam_idx),
        lm_idx=jnp.asarray(lm_idx),
        uv=jnp.asarray(uv),
        valid=jnp.ones(len(cam_idx), bool),
        fixed_cameras=1,
    )
    # degree 6 > M=4: 2 dropped per landmark.
    _, stats = bundle_adjust(problem, n_iterations=1, max_obs_per_landmark=4)
    assert int(stats.obs_dropped) == n_lm * 2
