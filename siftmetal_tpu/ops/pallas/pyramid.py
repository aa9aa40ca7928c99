"""One-shot (semigroup) Gaussian octave + DoG as one batched Pallas kernel.

The production pyramid (ops/gaussian.blur_mxu_banded through
sift/pyramid.cascade_slices) runs the IPOL incremental cascade as XLA
banded matmuls: every blur pass materializes overlapping 256-column
window stacks in HBM (~6x image bytes per pass) and every intermediate
slice round-trips through HBM between passes. Hardware bisection
(ROADMAP r5) shows the stage is data-movement-bound: HIGH-precision
matmul FLOPs are ~0.33 ms/frame of the measured 1.24 ms seed+pyramid.

This kernel removes the HBM traffic instead of the FLOPs:

  * ONE-SHOT slices: slice s is blurred directly from the octave's
    first slice with rho_s = sqrt(sigma_s^2 - sigma_0^2)/delta (the
    Gaussian semigroup), not incrementally from slice s-1. Measured on
    the butterfly fixtures (CPU, fp32): stage counts 3069/2136/1939/
    1772/1305 vs IPOL 3068/2130/1934/1769/1304 — inside the 1%
    contract, so the cascade's chain dependency is not load-bearing.
    Slices become independent: the kernel needs only the max one-shot
    radius of vertical halo (<= 24 rows at the IPOL schedule) and no
    inter-slice ordering.
  * Each (frame, row-band, column-group) grid step DMAs a [176, 640]
    tile of the first slice ONCE (double-buffered one step ahead),
    computes all S-1 blurred slices and all S-1 DoG differences in
    VMEM, and writes each output exactly once.
  * Blur passes are MXU matmuls at bf16x3 (= XLA's HIGH, the
    hardware-parity-validated precision of the banded path): operands
    are pre-split host-side into (hi, lo) bf16 pairs and each pass runs
    hi@hi + hi@lo + lo@hi with fp32 accumulation. The X pass reuses
    ops/gaussian._band_tiles (256-window Toeplitz blocks with the
    half-sample reflection folded into edge columns); the Y pass uses
    per-band [176, 128] matrices with the reflection folded the same
    way.

Reference analogue: GaussianSeriesKernel's cascade + Subtract.metal
(/root/reference Sources/SIFTMetal/Metal Compute/GaussianSeriesKernel.swift:100-115,
Sources/MetalShaders/Metal/Subtract.metal:12) — fused, batched, and
re-derived for the MXU rather than translated.
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

from ..gaussian import _band_tiles, gaussian_taps
from ...config import SiftConfig

HALO = 24        # vertical halo rows each side; holds radii <= 24
BAND = 128       # output rows per band
ROWS_IN = BAND + 2 * HALO   # 176
WT_COLS = 512    # output cols per column group (4 lane tiles)
DMA_COLS = WT_COLS + 128    # input cols incl. the X pass's 64+64 halo


def oneshot_rhos(config: SiftConfig) -> Tuple[float, ...]:
    """Per-slice one-shot blurs rho_s = sqrt(sigma_s^2 - sigma_0^2)/delta
    for s = 1..S-1, in octave pixels (octave-independent: delta_o
    cancels, same as config.incremental_sigmas)."""
    sig = config.octave_sigmas(0)
    d = config.octave_delta(0)
    return tuple(
        math.sqrt(sig[s] ** 2 - sig[0] ** 2) / d for s in range(1, len(sig))
    )


def supports(config: SiftConfig, h: int) -> bool:
    """True when the kernel's static geometry covers this octave."""
    radii = [int(math.ceil(4.0 * r)) for r in oneshot_rhos(config)]
    return h >= ROWS_IN and max(radii) <= HALO


def _in_start(bd: int, hp: int) -> int:
    """First DMA'd row of band ``bd`` against the ROW-PADDED height
    ``hp = BAND * n_bands`` (static, host-side; multiple of 8). Using
    the padded height keeps the band's central window
    [BAND*bd - in_start, +BAND) inside the ROWS_IN buffer even for the
    last band of a non-multiple-of-128 image; the padded zero rows are
    never read by the Y matrices (reflection keeps taps below h)."""
    s = min(max(BAND * bd - HALO, 0), hp - ROWS_IN)
    assert s % 8 == 0, (bd, hp)
    return s


@functools.lru_cache(maxsize=None)
def _y_band_matrices(sigma: float, h: int) -> np.ndarray:
    """[n_bands, ROWS_IN, BAND] Y-pass Toeplitz blocks: band bd's block
    maps its DMA'd rows [_in_start(bd), +ROWS_IN) to output rows
    [BAND*bd, +BAND) with the half-sample reflection at 0/h folded in
    (same triangle map as ops/gaussian._band_matrix). Output rows >= h
    are zero (the caller slices them off)."""
    taps = gaussian_taps(sigma).astype(np.float64)
    r = len(taps) // 2
    assert r <= HALO, (sigma, r)
    n_bands = -(-h // BAND)
    hp = BAND * n_bands
    t_all = np.zeros((n_bands, ROWS_IN, BAND), np.float64)
    for bd in range(n_bands):
        base = _in_start(bd, hp)
        for v in range(BAND):
            g = BAND * bd + v
            if g >= h:
                continue
            for k_i, tap in enumerate(taps):
                idx = g + k_i - r
                m = idx % (2 * h)
                idx = m if m < h else 2 * h - 1 - m
                u = idx - base
                assert 0 <= u < ROWS_IN, (sigma, h, bd, v, idx)
                t_all[bd, u, v] += tap
    return t_all.astype(np.float32)


def _split_bf16(a: np.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """fp32 -> (hi, lo) bf16 with a + 0 == hi + lo to bf16x3 accuracy."""
    hi = jnp.asarray(a).astype(jnp.bfloat16)
    lo = (jnp.asarray(a) - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(x_hi, x_lo, t_hi, t_lo):
    """bf16x3 matmul (== lax HIGH): hi@hi + hi@lo + lo@hi, fp32 acc."""
    dn = (((1,), (0,)), ((), ()))
    out = None
    for a, b in ((x_hi, t_hi), (x_hi, t_lo), (x_lo, t_hi)):
        d = jax.lax.dot_general(
            a, b, dn, preferred_element_type=jnp.float32
        )
        out = d if out is None else out + d
    return out


def _oneshot_kernel(
    x_hbm,
    tx_hi_ref,
    tx_lo_ref,
    ty_hi_ref,
    ty_lo_ref,
    gauss_ref,
    dog_ref,
    xin2,
    sem,
    *,
    n_slices,
    n_bands,
    n_wt,
    hp,
):
    b = pl.program_id(0)
    wt = pl.program_id(1)
    bd = pl.program_id(2)
    flat = (b * n_wt + wt) * n_bands + bd
    slot = jax.lax.rem(flat, 2)

    def start_of(bd_):
        s = jnp.minimum(
            jnp.maximum(BAND * bd_ - HALO, 0), hp - ROWS_IN
        )
        return pl.multiple_of(s, 8)

    def dma(b_, wt_, bd_, slot_):
        return pltpu.make_async_copy(
            x_hbm.at[
                b_,
                pl.ds(start_of(bd_), ROWS_IN),
                pl.ds(wt_ * WT_COLS, DMA_COLS),
            ],
            xin2.at[slot_],
            sem.at[slot_],
        )

    @pl.when(flat == 0)
    def _():
        dma(b, wt, bd, slot).start()

    # Prefetch the next step's input band one step ahead.
    last = flat == pl.num_programs(0) * n_wt * n_bands - 1
    nbd = jnp.where(bd + 1 < n_bands, bd + 1, 0)
    nwt = jnp.where(bd + 1 < n_bands, wt, jnp.where(wt + 1 < n_wt, wt + 1, 0))
    nb = jnp.where(
        (bd + 1 < n_bands) | (wt + 1 < n_wt), b, b + 1
    )

    @pl.when(jnp.logical_not(last))
    def _():
        dma(nb, nwt, nbd, 1 - slot).start()

    dma(b, wt, bd, slot).wait()
    xin = xin2[slot]

    # The input band IS Gaussian slice 0: its central [BAND, WT_COLS]
    # window feeds dog[0] = gauss[1] - gauss[0].
    off = pl.multiple_of(BAND * bd - start_of(bd), 8)
    central = xin2[slot, pl.ds(off, BAND), :][:, 64 : 64 + WT_COLS]

    x_hi = xin.astype(jnp.bfloat16)
    x_lo = (xin - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    prev = central
    for s in range(n_slices):
        cols = []
        for tt in range(4):
            w_hi = x_hi[:, 128 * tt : 128 * tt + 256]
            w_lo = x_lo[:, 128 * tt : 128 * tt + 256]
            cols.append(
                _dot3(w_hi, w_lo, tx_hi_ref[s, tt], tx_lo_ref[s, tt])
            )
        xw = jnp.concatenate(cols, axis=1)          # [ROWS_IN, WT_COLS]
        xw_hi = xw.astype(jnp.bfloat16)
        xw_lo = (xw - xw_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        # Y pass contracts the row axis: out[v, c] = sum_u T[u, v] x[u, c].
        dn = (((0,), (0,)), ((), ()))
        y = None
        for a, t in (
            (xw_hi, ty_hi_ref[s, 0]),
            (xw_hi, ty_lo_ref[s, 0]),
            (xw_lo, ty_hi_ref[s, 0]),
        ):
            d = jax.lax.dot_general(
                t, a, dn, preferred_element_type=jnp.float32
            )
            y = d if y is None else y + d
        gauss_ref[0, s] = y
        dog_ref[0, s] = y - prev
        prev = y


@functools.partial(
    jax.jit, static_argnames=("config", "interpret")
)
def octave_oneshot_pallas(
    first: jnp.ndarray,
    config: SiftConfig,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched octave: first slice [B, H, W] fp32 -> (gaussians
    [B, S, H, W], dogs [B, S-1, H, W]), all S-1 blurred slices one-shot
    from ``first`` and every output written exactly once."""
    b, h, w = first.shape
    rhos = oneshot_rhos(config)
    n_slices = len(rhos)
    assert supports(config, h), (h, rhos)

    n_t = -(-w // 128)
    n_wt = -(-n_t // 4)
    n_bands = -(-h // BAND)
    wc = WT_COLS * n_wt

    # X matrices: reuse the banded-blur tiles (reflection folded at the
    # true width w); pad the tile axis so every column group has 4.
    tx = np.zeros((n_slices, 4 * n_wt, 256, 128), np.float32)
    for s, rho in enumerate(rhos):
        tiles = np.asarray(_band_tiles(float(rho), w))
        tx[s, : tiles.shape[0]] = tiles
    ty = np.stack(
        [np.asarray(_y_band_matrices(float(rho), h)) for rho in rhos]
    )  # [S-1, n_bands, ROWS_IN, BAND]
    tx_hi, tx_lo = _split_bf16(tx)
    ty_hi, ty_lo = _split_bf16(ty)

    hp = BAND * n_bands
    xpad = jnp.pad(
        first, ((0, 0), (0, hp - h), (64, wc + 128 - 64 - w))
    )

    grid = (b, n_wt, n_bands)
    kernel = functools.partial(
        _oneshot_kernel,
        n_slices=n_slices,
        n_bands=n_bands,
        n_wt=n_wt,
        hp=hp,
    )
    tspec = lambda: pl.BlockSpec(
        (n_slices, 4, 256, 128),
        lambda b_, wt_, bd_: (0, wt_, 0, 0),
        memory_space=pltpu.VMEM,
    )
    yspec = lambda: pl.BlockSpec(
        (n_slices, 1, ROWS_IN, BAND),
        lambda b_, wt_, bd_: (0, bd_, 0, 0),
        memory_space=pltpu.VMEM,
    )
    gauss, dog = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            tspec(),
            tspec(),
            yspec(),
            yspec(),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, n_slices, BAND, WT_COLS),
                lambda b_, wt_, bd_: (b_, 0, bd_, wt_),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_slices, BAND, WT_COLS),
                lambda b_, wt_, bd_: (b_, 0, bd_, wt_),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(
                (b, n_slices, BAND * n_bands, wc), jnp.float32
            ),
            jax.ShapeDtypeStruct(
                (b, n_slices, BAND * n_bands, wc), jnp.float32
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ROWS_IN, DMA_COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xpad, tx_hi, tx_lo, ty_hi, ty_lo)

    gaussians = jnp.concatenate(
        [first[:, None], gauss[:, :, :h, :w]], axis=1
    )
    return gaussians, dog[:, :, :h, :w]
