"""Scale-space parity vs the IPOL golden fixtures.

The reference only eyeballed these comparisons (its numeric
DifferenceOfGaussiansTests are commented out,
Tests/SIFTMetalTests/DifferenceOfGaussiansTests.swift:15-270); here they are
asserted: every saved octave/scale of the Gaussian pyramid must match the
IPOL-generated PNG to within quantization error.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from siftmetal_tpu.config import SiftConfig
from siftmetal_tpu.ops.gaussian import gaussian_taps
from siftmetal_tpu.ops.image import rgb_to_gray, upsample_bilinear_2x
from siftmetal_tpu.sift.pyramid import build_pyramid

from conftest import load_image


CFG = SiftConfig()


def test_gaussian_taps_normalized():
    taps = gaussian_taps(1.2489996)
    assert taps.shape == (11,)  # radius ceil(4 * 1.249) = 5
    np.testing.assert_allclose(taps.sum(), 1.0, atol=1e-6)
    np.testing.assert_allclose(taps, taps[::-1])  # symmetric


def test_upsample_shape_and_corners():
    img = np.arange(12, dtype=np.float32).reshape(3, 4)
    up = np.asarray(upsample_bilinear_2x(img))
    assert up.shape == (6, 8)
    # Even output pixels sample the input grid exactly.
    np.testing.assert_allclose(up[::2, ::2], img)
    # Odd pixels are midpoints of their neighbors (interior).
    np.testing.assert_allclose(up[0, 1], 0.5 * (img[0, 0] + img[0, 1]))
    np.testing.assert_allclose(up[1, 0], 0.5 * (img[0, 0] + img[1, 0]))


@pytest.fixture(scope="module")
def pyramid(butterfly):
    import jax

    gray = rgb_to_gray(butterfly)
    n_oct = CFG.num_octaves(*gray.shape)
    fn = jax.jit(build_pyramid, static_argnums=(1, 2))
    gaussians, dogs = fn(gray, CFG, n_oct)
    return [np.asarray(g) for g in gaussians], [np.asarray(d) for d in dogs]


def nn_zoom_to(img: np.ndarray, shape) -> np.ndarray:
    """Nearest-neighbor zoom, matching how the IPOL demo renders octave
    images at seed resolution for its fixture dumps."""
    h, w = img.shape
    oh, ow = shape
    ii = np.floor(np.arange(oh) * h / oh).astype(np.int64)
    jj = np.floor(np.arange(ow) * w / ow).astype(np.int64)
    return img[ii][:, jj]


def test_octave_count_and_shapes(butterfly):
    h, w = butterfly.shape[:2]
    assert (h, w) == (340, 512)
    n_oct = CFG.num_octaves(h, w)
    assert n_oct == 6
    shapes = CFG.octave_shapes(h, w, n_oct)
    assert shapes[0] == (680, 1024)
    assert shapes[1] == (340, 512)


@pytest.mark.parametrize("o", range(5))
def test_scalespace_matches_ipol(pyramid, o):
    gaussians, _ = pyramid
    for s in range(6):
        # Fixtures are saved NN-zoomed to seed resolution by the IPOL demo.
        ref = load_image(f"scalespace_butterfly_o{o:03d}_s{s:03d}.png")
        got = nn_zoom_to(gaussians[o][s], ref.shape)
        # Fixtures are 8-bit quantized; allow ~1.5 quantization steps.
        err = np.abs(got - ref)
        assert err.mean() < 1.5 / 255.0, (o, s, err.mean())
        assert np.quantile(err, 0.999) < 4.0 / 255.0, (o, s)


@pytest.mark.parametrize("o", range(5))
def test_dog_consistency(pyramid, o):
    # The DoG PNG fixtures are a saturated nonlinear visualization (mostly
    # white, mean ~0.96), not raw values, so DoG numerics are asserted as the
    # difference of two *fixture-validated* Gaussian slices here; exact DoG
    # values are further pinned down by the extrema-count fixtures in
    # test_detect.py.
    gaussians, dogs = pyramid
    assert dogs[o].shape[0] == CFG.n_dogs_per_octave
    np.testing.assert_allclose(
        dogs[o], gaussians[o][1:] - gaussians[o][:-1], atol=1e-7
    )
    # DoG magnitudes are small and signed.
    assert np.abs(dogs[o]).max() < 0.5
    assert dogs[o].min() < 0 < dogs[o].max()


@pytest.mark.parametrize("sigma", [0.67, 1.6, 2.2])
@pytest.mark.parametrize("shape", [(3, 64, 80), (17, 24)])
def test_blur_mxu_matches_shift_add(sigma, shape):
    """The MXU banded-matmul blur must reproduce the shift-add reference
    (identical taps + boundary folding; on CPU both are fp32, so only
    summation order differs)."""
    from siftmetal_tpu.ops.gaussian import blur, blur_mxu

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))
    ref = np.asarray(blur(x, sigma))
    got = np.asarray(blur_mxu(x, sigma))
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-6)


def test_blur_mxu_multi_reflection_tiny_image():
    """Radius > n (tiny top octaves) exercises the period-2n triangle
    reflection in the band matrix; the shift-add path's symmetric pad
    covers the same case."""
    from siftmetal_tpu.ops.gaussian import blur, blur_mxu

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(0, 1, (6, 7)).astype(np.float32))
    sigma = 2.5  # radius 10 > 6
    ref = np.asarray(blur(x, sigma))
    got = np.asarray(blur_mxu(x, sigma))
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-6)


def test_blur_mxu_bf16_contract():
    """bf16 fast-mode inputs: output is the fp32 accumulator (not a
    rounded bf16), matching the shift-add fast-mode contract."""
    from siftmetal_tpu.ops.gaussian import blur, blur_mxu

    rng = np.random.default_rng(5)
    x32 = rng.uniform(0, 1, (32, 48)).astype(np.float32)
    x = jnp.asarray(x32).astype(jnp.bfloat16)
    got = blur_mxu(x, 1.1, out_dtype=jnp.float32)
    assert got.dtype == jnp.float32
    ref = np.asarray(blur(x, 1.1, out_dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=0, atol=4e-3)


@pytest.mark.parametrize("shape,sigma", [((3, 64, 80), 1.6), ((97, 130), 2.2),
                                         ((17, 24), 0.67), ((6, 7), 2.5)])
def test_blur_mxu_banded_matches_shift_add(shape, sigma):
    """Blocked band-matmul blur == shift-add reference (window-local
    reflection folding; includes tiny shapes and big radii)."""
    from siftmetal_tpu.ops.gaussian import blur, blur_mxu_banded

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))
    ref = np.asarray(blur(x, sigma))
    got = np.asarray(blur_mxu_banded(x, sigma))
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-6)


def test_seed_blur_mxu_matches_two_step():
    """Fused upsample+blur seed (one rectangular matmul per axis) ==
    upsample_bilinear_2x followed by the shift-add blur."""
    from siftmetal_tpu.ops.gaussian import blur, seed_blur_mxu

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.uniform(0, 1, (2, 48, 64)).astype(np.float32))
    sigma = 1.2489996
    ref = np.asarray(blur(upsample_bilinear_2x(x), sigma))
    got = np.asarray(seed_blur_mxu(x, sigma))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0, atol=4e-6)
