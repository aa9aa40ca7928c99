"""Gaussian scale-space pyramid and Difference-of-Gaussians stacks.

TPU-native redesign of the reference's ``DifferenceOfGaussians`` orchestrator
(Sources/SIFTMetal/SIFT/DifferenceOfGaussians.swift:20-407). Instead of Metal
texture arrays and per-octave command encodings, each octave is one
``[S, H_o, W_o]`` float32 array produced inside a single traced program; the
octave loop is unrolled at trace time because octave shapes differ (they
cannot be vmapped — frames can).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import SiftConfig
from ..ops.gaussian import blur
from ..ops.image import decimate_2x, rgb_to_gray, upsample_bilinear_2x


def seed_image(gray: jnp.ndarray, config: SiftConfig) -> jnp.ndarray:
    """Grayscale input -> blurred 2x-oversampled seed v(0, 0).

    Mirrors DifferenceOfGaussians.encodeSeedTexture
    (DifferenceOfGaussians.swift:357-389): bilinear 2x upsample (when
    delta_min = 0.5; the FAST preset's delta_min = 1 skips oversampling,
    standard Lowe-style) then blur by
    sqrt(sigma_min^2 - sigma_input^2) / delta_min.
    """
    if config.delta_min == 1.0:
        scaled = gray
    elif config.delta_min == 0.5:
        scaled = upsample_bilinear_2x(gray)
    else:
        raise ValueError(f"unsupported delta_min {config.delta_min}")
    return blur(scaled, config.seed_blur_sigma())


def build_gaussian_octave(
    first: jnp.ndarray, o: int, config: SiftConfig
) -> jnp.ndarray:
    """Stack [S, H, W] of progressively blurred images for octave ``o``.

    The blur cascade applies incremental sigmas rho[s-1 -> s]
    (GaussianSeriesKernel: DifferenceOfGaussians.swift:91-110).
    """
    rhos = config.incremental_sigmas(o)
    slices = [first]
    for rho in rhos:
        slices.append(blur(slices[-1], rho))
    return jnp.stack(slices, axis=0)


def build_pyramid(
    gray: jnp.ndarray,
    config: SiftConfig,
    n_octaves: int,
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """Full scale space: per-octave Gaussian stacks and DoG stacks.

    Returns ``(gaussians, dogs)`` where ``gaussians[o]`` is [S, H_o, W_o]
    (S = n_scales_per_octave + 3) and ``dogs[o]`` is [S-1, H_o, W_o].
    Octave o > 0 is seeded by 2x decimation of slice ``n_scales_per_octave``
    of octave o-1 (DifferenceOfGaussians.swift:190-200, subtract kernel
    Sources/MetalShaders/Metal/Subtract.metal:12-23).
    """
    h, w = gray.shape[-2], gray.shape[-1]
    shapes = config.octave_shapes(h, w, n_octaves)

    use_cascade = (
        config.use_pallas_pyramid and jax.default_backend() == "tpu"
    )
    gaussians: List[jnp.ndarray] = []
    dogs: List[jnp.ndarray] = []
    first = seed_image(gray, config)
    for o in range(n_octaves):
        if o > 0:
            prev = gaussians[o - 1][config.n_scales_per_octave]
            first = decimate_2x(prev, shapes[o])
        # The fused kernel wins on large octaves; small ones are dominated
        # by fixed kernel overhead and stay on the XLA shift-add path
        # (measured crossover ~256 rows on v5e).
        if use_cascade and shapes[o][0] >= 256:
            from ..ops.pallas.cascade import octave_cascade_pallas

            stack, dog = octave_cascade_pallas(first, config)
        else:
            stack = build_gaussian_octave(first, o, config)
            dog = stack[1:] - stack[:-1]
        gaussians.append(stack)
        dogs.append(dog)
    return gaussians, dogs


def pyramid_from_rgb(
    image: jnp.ndarray, config: SiftConfig, n_octaves: int
):
    """Convenience: [H, W, 3] gamma-space RGB in 0..1 -> (gaussians, dogs)."""
    return build_pyramid(rgb_to_gray(image), config, n_octaves)
