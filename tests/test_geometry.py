"""Two-view geometry: RANSAC homography/fundamental, triangulation, pose.

All-synthetic tests (the reference has no geometry layer to compare to;
this is new capability per SURVEY.md §7 step 5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from siftmetal_tpu.geometry.ransac import find_fundamental, find_homography
from siftmetal_tpu.geometry.twoview import (
    decompose_essential,
    essential_from_fundamental,
    fundamental_from_points,
    homography_from_points,
    homography_transfer_error,
    recover_pose,
    sampson_error,
    triangulate,
)


def _rot(rx, ry, rz):
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    mx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    my = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    mz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return (mz @ my @ mx).astype(np.float32)


@pytest.fixture
def stereo_scene():
    rng = np.random.default_rng(7)
    n = 200
    pts3 = rng.uniform([-2, -2, 4], [2, 2, 8], (n, 3)).astype(np.float32)
    k = np.array([[500, 0, 320], [0, 500, 240], [0, 0, 1]], dtype=np.float32)
    r = _rot(0.05, -0.1, 0.02)
    t = np.array([0.5, 0.05, 0.02], dtype=np.float32)

    def project(p, rr, tt):
        c = p @ rr.T + tt
        uv = c @ k.T
        return (uv[:, :2] / uv[:, 2:]).astype(np.float32)

    x1 = project(pts3, np.eye(3, dtype=np.float32), np.zeros(3))
    x2 = project(pts3, r, t)
    return pts3, k, r, t, x1, x2


def test_homography_exact():
    rng = np.random.default_rng(0)
    h_true = np.array(
        [[1.1, 0.02, 5.0], [-0.03, 0.95, -3.0], [1e-4, -2e-4, 1.0]],
        dtype=np.float32,
    )
    src = rng.uniform(0, 400, (32, 2)).astype(np.float32)
    p = np.c_[src, np.ones(32)] @ h_true.T
    dst = (p[:, :2] / p[:, 2:]).astype(np.float32)
    h = np.asarray(homography_from_points(jnp.asarray(src), jnp.asarray(dst)))
    err = np.asarray(
        homography_transfer_error(jnp.asarray(h), jnp.asarray(src), jnp.asarray(dst))
    )
    assert err.max() < 0.1, err.max()


def test_ransac_homography_with_outliers():
    rng = np.random.default_rng(1)
    n = 256
    h_true = np.array(
        [[0.9, 0.1, 10.0], [-0.05, 1.05, 20.0], [0, 0, 1.0]], dtype=np.float32
    )
    src = rng.uniform(0, 400, (n, 2)).astype(np.float32)
    p = np.c_[src, np.ones(n)] @ h_true.T
    dst = (p[:, :2] / p[:, 2:]).astype(np.float32)
    n_out = 100
    dst[:n_out] = rng.uniform(0, 400, (n_out, 2))  # 39% outliers
    valid = np.ones(n, dtype=bool)
    valid[-16:] = False  # padding slots

    res = jax.jit(find_homography)(
        jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(valid),
    )
    inl = np.asarray(res.inliers)
    assert bool(res.ok)
    # All true inliers recovered, no outliers admitted.
    assert inl[n_out : n - 16].mean() > 0.98
    assert inl[:n_out].mean() < 0.05


def test_ransac_refit_ignores_gross_outlier_at_index_0():
    """The refit pads its gathered inlier list by repeating the FIRST
    INLIER; a gross outlier sitting at array index 0 must not poison the
    refit (regression: fill_value=0 padding used to inject point 0 into
    most refit rows, VERDICT r1 #6)."""
    from siftmetal_tpu.geometry.ransac import ransac
    from siftmetal_tpu.geometry.twoview import (
        homography_from_points as solver,
        homography_transfer_error as err_fn,
    )

    rng = np.random.default_rng(5)
    n = 64
    h_true = np.array(
        [[1.05, 0.05, 8.0], [-0.02, 0.98, -5.0], [0, 0, 1.0]], np.float32
    )
    src = rng.uniform(0, 400, (n, 2)).astype(np.float32)
    p = np.c_[src, np.ones(n)] @ h_true.T
    dst = (p[:, :2] / p[:, 2:]).astype(np.float32)
    dst[1:24] += rng.normal(0, 0.5, (23, 2))  # noisy inliers
    dst[0] = [9000.0, -9000.0]                # gross outlier at index 0
    dst[24:40] = rng.uniform(0, 400, (16, 2))  # more outliers
    valid = np.ones(n, bool)
    valid[40:] = False                         # padding slots

    run = jax.jit(lambda refit: ransac(
        jax.random.PRNGKey(3), jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(valid), solver, err_fn, sample_size=4,
        n_hypotheses=64, inlier_threshold=3.0, refit=refit,
    ), static_argnums=0)
    res_no = run(False)
    res = run(True)

    true_inl = np.zeros(n, bool)
    true_inl[1:24] = True

    def mean_err(model):
        e = np.asarray(err_fn(model, jnp.asarray(src), jnp.asarray(dst)))
        return e[true_inl].mean()

    assert not bool(np.asarray(res.inliers)[0])  # outlier 0 rejected
    assert int(res.n_inliers) >= int(res_no.n_inliers)
    # The all-inlier refit must not be worse than the minimal-sample model.
    assert mean_err(np.asarray(res.model)) <= mean_err(
        np.asarray(res_no.model)
    ) + 1e-3
    assert mean_err(np.asarray(res.model)) < 1.5


def test_fundamental_and_pose(stereo_scene):
    pts3, k, r_true, t_true, x1, x2 = stereo_scene
    f = fundamental_from_points(jnp.asarray(x1), jnp.asarray(x2))
    err = np.asarray(sampson_error(f, jnp.asarray(x1), jnp.asarray(x2)))
    assert np.median(err) < 0.5, np.median(err)

    e = essential_from_fundamental(f, jnp.asarray(k), jnp.asarray(k))
    kinv = np.linalg.inv(k)
    n1 = (np.c_[x1, np.ones(len(x1))] @ kinv.T)[:, :2]
    n2 = (np.c_[x2, np.ones(len(x2))] @ kinv.T)[:, :2]
    r, t, n_front = recover_pose(
        e, jnp.asarray(n1), jnp.asarray(n2), jnp.ones(len(x1))
    )
    r, t = np.asarray(r), np.asarray(t)
    assert int(n_front) > 0.95 * len(x1)
    # Rotation recovered (up to E's scale ambiguity on t).
    assert np.abs(r - r_true).max() < 0.02, np.abs(r - r_true).max()
    t_dir = t / np.linalg.norm(t)
    t_true_dir = t_true / np.linalg.norm(t_true)
    assert min(
        np.linalg.norm(t_dir - t_true_dir), np.linalg.norm(t_dir + t_true_dir)
    ) < 0.05


def test_ransac_fundamental_with_outliers(stereo_scene):
    _, k, _, _, x1, x2 = stereo_scene
    rng = np.random.default_rng(3)
    x2n = x2.copy()
    x2n[:60] = rng.uniform(0, 640, (60, 2))
    res = jax.jit(find_fundamental)(
        jax.random.PRNGKey(1), jnp.asarray(x1), jnp.asarray(x2n),
        jnp.ones(len(x1), dtype=bool),
    )
    inl = np.asarray(res.inliers)
    assert inl[60:].mean() > 0.95, inl[60:].mean()
    assert inl[:60].mean() < 0.1


def test_triangulation(stereo_scene):
    pts3, k, r, t, x1, x2 = stereo_scene
    p1 = k @ np.c_[np.eye(3), np.zeros(3)]
    p2 = k @ np.c_[r, t]
    rec = np.asarray(
        triangulate(
            jnp.asarray(p1.astype(np.float32)),
            jnp.asarray(p2.astype(np.float32)),
            jnp.asarray(x1),
            jnp.asarray(x2),
        )
    )
    assert np.abs(rec - pts3).max() < 0.01, np.abs(rec - pts3).max()


def test_decompose_essential_orthonormal(stereo_scene):
    _, k, _, _, x1, x2 = stereo_scene
    f = fundamental_from_points(jnp.asarray(x1), jnp.asarray(x2))
    e = essential_from_fundamental(f, jnp.asarray(k), jnp.asarray(k))
    rs, ts = decompose_essential(e)
    for i in range(4):
        r = np.asarray(rs[i])
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-4)
        assert np.linalg.det(r) > 0.99
