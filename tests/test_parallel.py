"""Multi-chip sharding on the virtual 8-device CPU mesh.

The reference has no distributed layer at all (SURVEY.md §2c); these tests
validate the new framework's SPMD story: data-parallel batched extraction
and target-sharded matching whose results are bit-identical to the
single-device path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from siftmetal_tpu.config import SiftConfig
from siftmetal_tpu.match.matcher import match_bruteforce
from siftmetal_tpu.parallel.extraction import (
    make_batch_extractor,
    make_mesh,
    make_sharded_matcher,
)
from siftmetal_tpu.sift.extract import SIFT

CFG = SiftConfig(
    max_extrema_per_octave=512, max_keypoints=256, max_descriptors=512
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "tests require the 8-device CPU mesh"
    return make_mesh(8)


@pytest.fixture(scope="module")
def frames(butterfly):
    # 8 distinct crops of the butterfly image.
    crops = [
        np.asarray(butterfly[i * 8 : i * 8 + 96, i * 16 : i * 16 + 128, :3])
        @ np.array([0.2126, 0.7152, 0.0722], dtype=np.float32)
        for i in range(8)
    ]
    return jnp.asarray(np.stack(crops).astype(np.float32))


def test_data_parallel_extraction_matches_single_device(mesh, frames):
    extractor = make_batch_extractor(mesh, 96, 128, CFG)
    kb, db, _ = extractor(frames)

    sift = SIFT(96, 128, CFG)
    k1, d1, _ = sift.extract(np.asarray(frames[3]))
    np.testing.assert_array_equal(np.asarray(db.valid[3]), np.asarray(d1.valid))
    np.testing.assert_array_equal(
        np.asarray(db.features[3]), np.asarray(d1.features)
    )
    np.testing.assert_allclose(
        np.asarray(kb.x[3]), np.asarray(k1.x), rtol=0, atol=0
    )


def test_sharded_matcher_equals_bruteforce(mesh, frames):
    extractor = make_batch_extractor(mesh, 96, 128, CFG)
    _, db, _ = extractor(frames)
    qf, qv = db.features[0], db.valid[0]
    tf = db.features.reshape(-1, 128)
    tv = db.valid.reshape(-1)

    matcher = make_sharded_matcher(mesh)
    m_sharded = matcher(qf, qv, tf, tv)
    m_exact = match_bruteforce(qf, tf, qv, tv)

    np.testing.assert_array_equal(
        np.asarray(m_sharded.valid), np.asarray(m_exact.valid)
    )
    ok = np.asarray(m_exact.valid)
    np.testing.assert_array_equal(
        np.asarray(m_sharded.target_idx)[ok],
        np.asarray(m_exact.target_idx)[ok],
    )


def test_distributed_ba_matches_single_device():
    import numpy as np
    from siftmetal_tpu.slam.ba import BAProblem, bundle_adjust
    from siftmetal_tpu.slam.camera import project
    from siftmetal_tpu.parallel.distributed_ba import (
        make_distributed_ba,
        shard_ba_problem,
    )

    rng = np.random.default_rng(42)
    n_cam, n_lm = 5, 256
    k = np.array([[400, 0, 320], [0, 400, 240], [0, 0, 1]], dtype=np.float32)
    lms = rng.uniform([-3, -3, 6], [3, 3, 12], (n_lm, 3)).astype(np.float32)
    cams = np.zeros((n_cam, 6), dtype=np.float32)
    cams[:, 3] = np.linspace(-1, 1, n_cam)
    cam_idx = np.repeat(np.arange(n_cam), n_lm).astype(np.int32)
    lm_idx = np.tile(np.arange(n_lm), n_cam).astype(np.int32)
    uv = np.asarray(
        jax.vmap(
            lambda c, l: project(
                jnp.asarray(cams)[c], jnp.asarray(k), jnp.asarray(lms)[l]
            )
        )(cam_idx, lm_idx)
    )
    noisy_cams = cams + rng.normal(0, 0.01, cams.shape).astype(np.float32)
    noisy_cams[:2] = cams[:2]
    noisy_lms = lms + rng.normal(0, 0.05, lms.shape).astype(np.float32)
    problem = BAProblem(
        cameras=jnp.asarray(noisy_cams),
        landmarks=jnp.asarray(noisy_lms),
        k=jnp.asarray(k),
        cam_idx=jnp.asarray(cam_idx),
        lm_idx=jnp.asarray(lm_idx),
        uv=jnp.asarray(uv),
        valid=jnp.ones(len(uv), dtype=bool),
        fixed_cameras=2,
    )

    single, stats = jax.jit(
        lambda p: bundle_adjust(p, n_iterations=8, damping=1e-4)
    )(problem)

    mesh = make_mesh(8)
    sharded = shard_ba_problem(problem, 8)
    run = make_distributed_ba(mesh, n_iterations=8, damping=1e-4)
    cams_d, lms_d, (c0, c1) = run(sharded)

    assert float(c0) == pytest.approx(float(stats.initial_cost), rel=1e-4)
    # Both converge to (essentially) zero cost on this clean problem.
    assert float(c1) < 1e-2
    assert float(stats.final_cost) < 1e-2
    np.testing.assert_allclose(
        np.asarray(cams_d), np.asarray(single.cameras), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(lms_d).reshape(-1, 3),
        np.asarray(single.landmarks),
        atol=1e-3,
    )
