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
from ..ops.gaussian import blur, blur_mxu_banded
from ..ops.image import decimate_2x, rgb_to_gray, upsample_bilinear_2x


def _blur_fn(config: SiftConfig):
    """Pick the blur backend: MXU tile-conv or banded-matmul on TPU
    (config gated), VPU shift-add (the numeric reference) elsewhere."""
    if config.use_mxu_pyramid and jax.default_backend() == "tpu":
        import functools

        if config.use_conv_blur:
            from ..ops.gaussian import blur_mxu_conv

            return functools.partial(
                blur_mxu_conv, precision=config.mxu_blur_precision
            )
        return functools.partial(
            blur_mxu_banded, precision=config.mxu_blur_precision
        )
    return blur


def seed_image(
    gray: jnp.ndarray, config: SiftConfig, out_dtype=None
) -> jnp.ndarray:
    """Grayscale input -> blurred 2x-oversampled seed v(0, 0).

    Mirrors DifferenceOfGaussians.encodeSeedTexture
    (DifferenceOfGaussians.swift:357-389): bilinear 2x upsample (when
    delta_min = 0.5; the FAST preset's delta_min = 1 skips oversampling,
    standard Lowe-style) then blur by
    sqrt(sigma_min^2 - sigma_input^2) / delta_min. ``out_dtype`` is
    forwarded to the blur (bf16 fast mode reads a bf16 input but emits
    the fp32 accumulator).
    """
    mxu = config.use_mxu_pyramid and jax.default_backend() == "tpu"
    if config.delta_min == 0.5 and mxu:
        # The upsample and blur are both linear: fold them into ONE
        # rectangular matmul per axis (never materializes the 2x
        # image; ops/gaussian.seed_blur_mxu).
        from ..ops.gaussian import seed_blur_mxu

        return seed_blur_mxu(
            gray,
            config.seed_blur_sigma(),
            out_dtype=out_dtype,
            precision=config.mxu_blur_precision,
        )
    if config.delta_min == 1.0:
        scaled = gray
    elif config.delta_min == 0.5:
        scaled = upsample_bilinear_2x(gray)
    else:
        raise ValueError(f"unsupported delta_min {config.delta_min}")
    return _blur_fn(config)(
        scaled, config.seed_blur_sigma(), out_dtype=out_dtype
    )


def cascade_slices(
    first: jnp.ndarray, o: int, config: SiftConfig
) -> List[jnp.ndarray]:
    """Progressively blurred fp32 slices for octave ``o`` (the blur
    cascade applies incremental sigmas rho[s-1 -> s];
    GaussianSeriesKernel: DifferenceOfGaussians.swift:91-110).

    bf16 fast mode: the chain each blur READS is stored bf16 (half the
    cascade's HBM read traffic), but every EMITTED slice is the blur's
    fp32 accumulator, un-rounded — storing quantized Gaussians collides
    neighboring DoG samples into plateaus and the strict extrema test
    then drops ~1/3 of keypoints (measured; see ops/gaussian.blur)."""
    bf16 = config.pyramid_dtype == "bfloat16"
    blur_ = _blur_fn(config)
    slices = [first.astype(jnp.float32) if bf16 else first]
    chain = first.astype(jnp.bfloat16) if bf16 else first
    for rho in config.incremental_sigmas(o):
        if bf16:
            out = blur_(chain, rho, out_dtype=jnp.float32)
            chain = out.astype(jnp.bfloat16)
            slices.append(out)
        else:
            chain = blur_(chain, rho)
            slices.append(chain)
    return slices


def build_gaussian_octave(
    first: jnp.ndarray, o: int, config: SiftConfig
) -> jnp.ndarray:
    """Stack [S, H, W] of progressively blurred images for octave ``o``."""
    return jnp.stack(cascade_slices(first, o, config), axis=0)


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

    bf16 = config.pyramid_dtype == "bfloat16"
    use_cascade = (
        config.use_pallas_pyramid
        and not bf16
        and jax.default_backend() == "tpu"
    )
    gaussians: List[jnp.ndarray] = []
    dogs: List[jnp.ndarray] = []
    # bf16 fast mode: the seed's upsample+blur reads bf16 too (the seed
    # blur at 2x resolution is the largest single blur in the pipeline).
    if bf16:
        gray = gray.astype(jnp.bfloat16)
    first = seed_image(gray, config, out_dtype=jnp.float32)
    for o in range(n_octaves):
        if o > 0:
            prev = gaussians[o - 1][config.n_scales_per_octave]
            if bf16:
                prev = prev.astype(jnp.bfloat16)
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
