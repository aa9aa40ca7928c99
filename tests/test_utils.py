"""Utilities: IO round-trips, viz rendering, profiling, checkpointing."""

import numpy as np
import pytest

from siftmetal_tpu.utils import io as sio
from siftmetal_tpu.utils.profiling import measure, reset_timings, timings

from conftest import FIXTURES


def test_descriptor_io_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 17
    x = rng.uniform(0, 300, n).astype(np.float32)
    y = rng.uniform(0, 500, n).astype(np.float32)
    sigma = rng.uniform(1, 20, n).astype(np.float32)
    theta = rng.uniform(-3, 3, n).astype(np.float32)
    feats = rng.integers(0, 255, (n, 128)).astype(np.uint8)
    valid = rng.uniform(size=n) > 0.3

    p = str(tmp_path / "desc.txt")
    wrote = sio.write_descriptors(p, x, y, sigma, theta, feats, valid)
    keys, f2 = sio.read_descriptors(p)
    assert wrote == valid.sum() == len(keys)
    np.testing.assert_allclose(keys[:, 0], x[valid], atol=1e-5)
    np.testing.assert_array_equal(f2, feats[valid])


def test_reads_reference_fixture_format():
    keys, feats = sio.read_descriptors(
        str(FIXTURES / "butterfly-descriptors.txt")
    )
    assert keys.shape == (1609, 4)
    assert feats.shape == (1609, 128)
    assert feats.max() <= 255


def test_keypoint_io_roundtrip(tmp_path):
    p = str(tmp_path / "kp.txt")
    x = np.array([1.5, 2.5], dtype=np.float32)
    sio.write_keypoints(p, x, x * 2, x * 3, x * 0.1)
    back = sio.read_keypoints(p)
    np.testing.assert_allclose(back[:, 0], x, atol=1e-5)
    np.testing.assert_allclose(back[:, 2], x * 3, atol=1e-5)


def test_viz_renders(tmp_path):
    from siftmetal_tpu.utils.viz import draw_keypoints, draw_matches

    img = np.random.default_rng(0).uniform(0, 1, (60, 80)).astype(np.float32)
    out = draw_keypoints(
        img,
        x=np.array([10.0, 30.0]),
        y=np.array([20.0, 60.0]),
        sigma=np.array([3.0, 6.0]),
        theta=np.array([0.0, 1.2]),
        path=str(tmp_path / "kp.png"),
    )
    assert out.shape == (60, 80, 3)
    assert (tmp_path / "kp.png").exists()

    out2 = draw_matches(
        img, np.array([[10.0, 20.0]]), img, np.array([[30.0, 40.0]]),
        [(0, 0)], path=str(tmp_path / "m.png"),
    )
    assert out2.shape[1] == 160

    from siftmetal_tpu.utils.viz import draw_descriptors

    out3 = draw_descriptors(
        img,
        x=np.array([10.0, 30.0]),
        y=np.array([20.0, 60.0]),
        sigma=np.array([1.0, 2.0]),
        theta=np.array([0.0, 1.2]),
        valid=np.array([True, True]),
        path=str(tmp_path / "d.png"),
    )
    assert out3.shape == (60, 80, 3)
    assert (tmp_path / "d.png").exists()
    # The grid must actually mark pixels (differs from an empty render).
    empty = draw_descriptors(img, np.array([]), np.array([]),
                             np.array([]), np.array([]))
    assert (out3 != empty).any()


def test_measure_accumulates():
    reset_timings()
    with measure("phase_x"):
        _ = sum(range(1000))
    with measure("phase_x"):
        _ = sum(range(1000))
    t = timings()
    assert t["phase_x"]["count"] == 2
    assert t["phase_x"]["total_s"] > 0


def test_map_checkpoint_roundtrip(tmp_path):
    from siftmetal_tpu.slam.sfm import SfmConfig, SfmMap
    from siftmetal_tpu.utils.checkpoint import load_map, save_map

    k = np.array([[400, 0, 320], [0, 400, 240], [0, 0, 1]], dtype=np.float32)
    smap = SfmMap(k, SfmConfig(max_cameras=4, max_landmarks=64,
                               max_observations=128))
    smap.cameras[0] = np.arange(6)
    smap.n_cameras = 1
    smap.landmarks[:3] = np.eye(3)
    smap.lm_desc[:3] = 7
    smap.n_landmarks = 3
    smap.obs_cam[:3] = [0, 0, 0]
    smap.obs_lm[:3] = [0, 1, 2]
    smap.obs_uv[:3] = [[1, 2], [3, 4], [5, 6]]
    smap.n_obs = 3

    p = str(tmp_path / "map.npz")
    save_map(p, smap)
    back = load_map(p)
    assert back.n_cameras == 1 and back.n_landmarks == 3 and back.n_obs == 3
    np.testing.assert_array_equal(back.cameras, smap.cameras)
    np.testing.assert_array_equal(back.lm_desc, smap.lm_desc)
    np.testing.assert_array_equal(back.obs_uv, smap.obs_uv)
    assert back.reprojection_rms() == smap.reprojection_rms()


def test_trajectory_tum_roundtrip(tmp_path):
    from siftmetal_tpu.slam.trajectory import load_tum_trajectory
    from siftmetal_tpu.utils.checkpoint import save_trajectory_tum

    cams = np.zeros((3, 6), dtype=np.float32)
    cams[:, 3] = [0.0, 1.0, 2.0]
    p = str(tmp_path / "traj.txt")
    save_trajectory_tum(p, [0.0, 0.1, 0.2], cams)
    ts, pos = load_tum_trajectory(p)
    assert len(ts) == 3
    # world->cam t=(x,0,0) => center = -R^T t = (-x, 0, 0)
    np.testing.assert_allclose(pos[:, 0], [0.0, -1.0, -2.0], atol=1e-5)


def test_quaternion_extraction_near_180_degrees():
    """Shepperd branch selection: qw ~ 0 rotations (180 deg about an
    arbitrary axis) must still produce a quaternion that reconstructs the
    rotation (ADVICE r1: trace-only formula wrote garbage here)."""
    from siftmetal_tpu.utils.checkpoint import rotation_to_quaternion

    def quat_to_rot(q):
        x, y, z, w = q
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ])

    rng = np.random.default_rng(11)
    axes = rng.normal(size=(8, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    for axis in axes:
        for angle in (np.pi, np.pi - 1e-7, 2.2, 0.0):
            k = np.array([
                [0, -axis[2], axis[1]],
                [axis[2], 0, -axis[0]],
                [-axis[1], axis[0], 0],
            ])
            r = np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * (k @ k)
            q = rotation_to_quaternion(r)
            np.testing.assert_allclose(quat_to_rot(q), r, atol=1e-6)


def test_structured_logging(caplog):
    import logging

    import jax.numpy as jnp

    from siftmetal_tpu.utils.logging import get_logger, log_counters

    counters = {
        "n_extrema": jnp.int32(100),
        "overflow": jnp.int32(3),
        "descriptor_overflow": jnp.int32(0),
    }
    with caplog.at_level(logging.INFO, logger="siftmetal_tpu"):
        plain = log_counters(counters)
    assert plain == {"n_extrema": 100, "overflow": 3, "descriptor_overflow": 0}
    assert any("dropped" in r.message for r in caplog.records)
    assert get_logger("x").name == "siftmetal_tpu.x"
