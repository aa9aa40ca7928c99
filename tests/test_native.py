"""Native frame-ingest library (C++/ctypes): build, decode, threaded loader."""

import numpy as np
import pytest

from siftmetal_tpu.utils import frame_loader as fl


@pytest.fixture(scope="module", autouse=True)
def built():
    if not fl.native_available():
        assert fl.build(), "failed to build native/libframeloader.so"


def test_rgb_to_gray_matches_python():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (37, 53, 3)).astype(np.uint8)
    native = fl.rgb_to_gray(rgb)
    w = np.array(
        [0.212639005871510, 0.715168678767756, 0.072192315360734],
        dtype=np.float32,
    )
    ref = (rgb.astype(np.float32) / 255.0) @ w
    np.testing.assert_allclose(native, ref, atol=1e-6)


def test_bgra_and_yuv():
    rng = np.random.default_rng(1)
    bgra = rng.integers(0, 255, (16, 16, 4)).astype(np.uint8)
    g1 = fl.bgra_to_gray(bgra)
    g2 = fl.rgb_to_gray(bgra[..., [2, 1, 0]])
    np.testing.assert_allclose(g1, g2, atol=1e-6)

    y = rng.integers(0, 255, (16, 16)).astype(np.uint8)
    full = fl.yuv420_to_gray(y, video_range=False)
    np.testing.assert_allclose(full, y / 255.0, atol=1e-6)
    vid = fl.yuv420_to_gray(y, video_range=True)
    np.testing.assert_allclose(
        vid, np.clip((y.astype(np.float32) - 16) / 219.0, 0, 1), atol=1e-6
    )


def _write_ppm(path, arr):
    h, w, _ = arr.shape
    with open(path, "wb") as f:
        f.write(b"P6\n# comment\n%d %d\n255\n" % (w, h))
        f.write(arr.tobytes())


def test_pnm_decode(tmp_path):
    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 255, (24, 32, 3)).astype(np.uint8)
    p = str(tmp_path / "img.ppm")
    _write_ppm(p, rgb)
    gray = fl.load_pnm_gray(p)
    np.testing.assert_allclose(gray, fl.rgb_to_gray(rgb), atol=1e-6)


def test_threaded_loader(tmp_path):
    rng = np.random.default_rng(3)
    paths, refs = [], []
    for i in range(12):
        rgb = rng.integers(0, 255, (24, 32, 3)).astype(np.uint8)
        p = str(tmp_path / f"f{i}.ppm")
        _write_ppm(p, rgb)
        paths.append(p)
        refs.append(fl.rgb_to_gray(rgb))

    loader = fl.FrameLoader(24, 32, n_threads=4)
    loader.submit_all(paths)
    batch = loader.next_batch(12)
    assert loader.error_count == 0
    # Frames come back in submission order.
    for i in range(12):
        np.testing.assert_allclose(batch[i], refs[i], atol=1e-6)
    loader.close()
