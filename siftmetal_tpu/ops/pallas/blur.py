"""Fused separable Gaussian blur as a Pallas TPU kernel.

The pyramid's convolution cascade is the extraction pipeline's main
HBM-bandwidth consumer (SURVEY.md §3.1 marks it HOT: 2 passes x 5 scales x
octaves). The XLA path (ops/gaussian.py) runs X and Y passes as separate
convolutions with an HBM round-trip between them; this kernel tiles the
image over rows, DMAs each input tile + halo into VMEM once, applies BOTH
1-D passes in VMEM, and writes each output element exactly once — halving
HBM traffic for the cascade.

Equivalent of the reference's ConvolutionSeries kernels
(/root/reference Sources/MetalShaders/Metal/ConvolutionSeries.metal:16-53 +
GaussianSeriesKernel.swift:100-115) with VMEM blocking in place of
threadgroup tiling. Numerics: float32 taps/accumulation, half-sample
symmetric boundary — bit-compatible with ops.gaussian.blur up to float
reassociation (validated to ~1e-6).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..gaussian import gaussian_taps


def _blur_kernel(x_hbm, out_ref, scratch, sem, *, taps, tile_h, width):
    """One row-tile: DMA [tile_rows, W_pad] to VMEM, conv X then Y.
    tile_rows = tile_h + 2r rounded up to the sublane multiple (8) —
    Mosaic requires DMA slice extents aligned to the tiling."""
    r = len(taps) // 2
    tile_rows = (tile_h + 2 * r + 7) // 8 * 8
    i = pl.program_id(0)

    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * tile_h, tile_rows), :],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    x = scratch[:]
    acc_x = x[:, 0:width] * taps[0]
    for k in range(1, 2 * r + 1):
        acc_x = acc_x + x[:, k:k + width] * taps[k]
    acc = acc_x[0:tile_h, :] * taps[0]
    for k in range(1, 2 * r + 1):
        acc = acc + acc_x[k:k + tile_h, :] * taps[k]
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("sigma", "tile_h", "interpret"))
def blur_pallas(
    image: jnp.ndarray,
    sigma: float,
    tile_h: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Gaussian blur of [H, W] float32 with symmetric boundary (fused)."""
    taps = tuple(float(t) for t in gaussian_taps(sigma))
    r = len(taps) // 2
    h, w = image.shape

    n_tiles = pl.cdiv(h, tile_h)
    h_pad = n_tiles * tile_h
    tile_rows = (tile_h + 2 * r + 7) // 8 * 8
    w_pad = (w + 2 * r + 127) // 128 * 128

    # Symmetric halo + zero fill to tile/lane multiples (host-side XLA pad;
    # the zeros land outside the [k : k+W/TH) windows or past H and are
    # sliced away). Rows are padded so the LAST tile's aligned
    # [i*tile_h, i*tile_h + tile_rows) DMA window stays in bounds.
    x = jnp.pad(image, ((r, r), (r, r)), mode="symmetric")
    rows_needed = (n_tiles - 1) * tile_h + tile_rows
    x = jnp.pad(
        x,
        ((0, rows_needed - (h + 2 * r)), (0, w_pad - (w + 2 * r))),
        mode="constant",
    )

    out = pl.pallas_call(
        functools.partial(
            _blur_kernel, taps=taps, tile_h=tile_h, width=w_pad - 2 * r
        ),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (tile_h, w_pad - 2 * r),
            lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((h_pad, w_pad - 2 * r), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_rows, w_pad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x)
    return out[:h, :w]


def blur_stack_pallas(
    stack: jnp.ndarray, sigma: float, interpret: bool = False
) -> jnp.ndarray:
    """Blur each [H, W] slice of a [..., H, W] stack (vmapped kernel)."""
    lead = stack.shape[:-2]
    flat = stack.reshape((-1,) + stack.shape[-2:])
    out = jax.vmap(
        lambda im: blur_pallas(im, sigma, interpret=interpret)
    )(flat)
    return out.reshape(lead + stack.shape[-2:])
