"""Pallas kernels vs their XLA reference implementations (interpret mode —
the compiled path is exercised on real TPU by bench.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from siftmetal_tpu.ops.gaussian import blur
from siftmetal_tpu.ops.pallas.blur import blur_pallas, blur_stack_pallas


@pytest.mark.parametrize(
    "shape,sigma",
    [((340, 512), 1.6), ((333, 470), 2.2), ((96, 128), 1.2489996)],
)
def test_blur_pallas_matches_xla(shape, sigma):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))
    ref = np.asarray(blur(img, sigma))
    got = np.asarray(blur_pallas(img, sigma, interpret=True))
    assert np.abs(ref - got).max() < 1e-6


def test_blur_stack_pallas():
    rng = np.random.default_rng(1)
    stack = jnp.asarray(rng.uniform(0, 1, (3, 64, 96)).astype(np.float32))
    ref = np.asarray(blur(stack, 1.6))
    got = np.asarray(blur_stack_pallas(stack, 1.6, interpret=True))
    assert np.abs(ref - got).max() < 1e-6
