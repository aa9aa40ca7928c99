"""Fused per-octave Gaussian cascade + DoG as one Pallas kernel.

The pyramid is the extraction pipeline's last multi-millisecond XLA stage
(~8 ms/frame at 640x480): ~30 separate blur passes, each a round-trip
through HBM. This kernel computes an ENTIRE octave per row-tile: the G0
tile (+ halo for the total cascade radius) is DMA'd to VMEM once, all
n+2 incremental blurs run in VMEM (roll-based shift-add — circular wrap
garbage stays inside the halo padding), and every Gaussian slice and DoG
slice is written exactly once.

Correctness: half-sample symmetric extension commutes with symmetric
convolution, so padding G0 once by the total radius is EXACTLY equivalent
to the sequential per-stage symmetric pads of ops.gaussian.blur (validated
to float epsilon). The incremental sigmas are octave-independent
(delta_o cancels in rho = sqrt(sigma_s^2 - sigma_{s-1}^2)/delta_o), so one
tap schedule serves every octave.

Reference analogue: GaussianSeriesKernel's in-place cascade
(/root/reference Sources/SIFTMetal/Metal Compute/GaussianSeriesKernel.swift:100-115)
+ the subtract kernel (Metal/Subtract.metal:12) — fused.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..gaussian import gaussian_taps
from ...config import SiftConfig

ROW_PAD = 48   # >= total cascade radius (43 w/ defaults), multiple of 8
COL_PAD = 128  # >= total cascade radius, multiple of 128


def _shift_add(x: jnp.ndarray, taps: Sequence[float], axis: int) -> jnp.ndarray:
    """1-D symmetric-tap convolution via rolls (wrap garbage stays in the
    halo padding; centers are exact)."""
    r = len(taps) // 2
    n = x.shape[axis]
    acc = None
    for k, t in enumerate(taps):
        term = t * pltpu.roll(x, (r - k) % n, axis)  # roll wants shift >= 0
        acc = term if acc is None else acc + term
    return acc


def _cascade_kernel(
    g0_hbm,
    gauss_ref,
    dog_ref,
    scratch,
    sem,
    *,
    taps_list,
    tile_h,
    rows,
    w_out,
):
    t = pl.program_id(0)
    dma = pltpu.make_async_copy(
        g0_hbm.at[pl.ds(t * tile_h, rows), :], scratch, sem
    )
    dma.start()
    dma.wait()

    def center(a):
        return a[ROW_PAD:ROW_PAD + tile_h, COL_PAD:COL_PAD + w_out]

    g_prev = scratch[:]
    prev_center = center(g_prev)
    for s, taps in enumerate(taps_list):
        g_cur = _shift_add(_shift_add(g_prev, taps, 1), taps, 0)
        cur_center = center(g_cur)
        gauss_ref[s, :, :] = cur_center
        dog_ref[s, :, :] = cur_center - prev_center
        g_prev = g_cur
        prev_center = cur_center


@functools.partial(
    jax.jit, static_argnames=("config", "tile_h", "interpret")
)
def octave_cascade_pallas(
    g0: jnp.ndarray,
    config: SiftConfig,
    tile_h: int = 64,  # 128 blows the 16M scoped-VMEM limit (2 x 5-slice
                       # out blocks double-buffered + cascade temporaries)
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """First Gaussian slice [H, W] -> (gaussians [n+3, H, W],
    dogs [n+2, H, W]) for one octave, fused."""
    rhos = config.incremental_sigmas(0)  # octave-independent
    taps_list = tuple(
        tuple(float(v) for v in gaussian_taps(r)) for r in rhos
    )
    total_r = sum(len(t) // 2 for t in taps_list)
    assert total_r <= ROW_PAD and total_r <= COL_PAD, total_r

    h, w = g0.shape
    n_tiles = pl.cdiv(h, tile_h)
    rows = tile_h + 2 * ROW_PAD
    w_out = (w + 127) // 128 * 128
    wp = w_out + 2 * COL_PAD
    n_stage = len(taps_list)

    x = jnp.pad(g0, ((ROW_PAD, ROW_PAD), (COL_PAD, COL_PAD)), mode="symmetric")
    rows_needed = (n_tiles - 1) * tile_h + rows
    x = jnp.pad(
        x,
        ((0, rows_needed - (h + 2 * ROW_PAD)), (0, wp - (w + 2 * COL_PAD))),
    )

    gauss, dog = pl.pallas_call(
        functools.partial(
            _cascade_kernel,
            taps_list=taps_list,
            tile_h=tile_h,
            rows=rows,
            w_out=w_out,
        ),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(
                (n_stage, tile_h, w_out),
                lambda t: (0, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n_stage, tile_h, w_out),
                lambda t: (0, t, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(
                (n_stage, n_tiles * tile_h, w_out), jnp.float32
            ),
            jax.ShapeDtypeStruct(
                (n_stage, n_tiles * tile_h, w_out), jnp.float32
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            # The roll-based cascade keeps several full-tile temporaries
            # live; the default 16M scoped-VMEM budget is conservative.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x)

    gaussians = jnp.concatenate([g0[None], gauss[:, :h, :w]], axis=0)
    return gaussians, dog[:, :h, :w]
