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
DMA_COLS = 640   # default input cols per step: 4-tile group + X halo
                 # (column groups are sized per call by _pick_ntt)


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
    """True when the kernel's static geometry covers this octave.

    The ROWS_IN floor is also close to where the kernel stops paying:
    at 240 rows (octave 2 of 480p) kernel vs banded-XLA measured a
    wash in-pipeline (5.67 vs 5.71 ms/frame full, within run noise);
    smaller octaves are per-call-overhead bound either way."""
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
    """bf16x3 matmul (== lax HIGH): hi@hi + hi@lo + lo@hi, fp32 acc.
    ``x_lo is None`` marks a natively-bf16 input (fast mode): the input
    is exact in hi, so only the matrix split contributes (2 passes)."""
    dn = (((1,), (0,)), ((), ()))
    pairs = [(x_hi, t_hi), (x_hi, t_lo)]
    if x_lo is not None:
        pairs.append((x_lo, t_hi))
    out = None
    for a, b in pairs:
        d = jax.lax.dot_general(
            a, b, dn, preferred_element_type=jnp.float32
        )
        out = d if out is None else out + d
    return out


def _split_val(x):
    """(hi, lo) bf16 of an fp32 value; bf16 values pass through exact
    (lo None)."""
    if x.dtype == jnp.bfloat16:
        return x, None
    hi = x.astype(jnp.bfloat16)
    return hi, (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)


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
    rows_in=ROWS_IN,
    dma_cols=DMA_COLS,
    row_stride=BAND,
    win_offs=(0, 128, 256, 384),
    with_first=True,
):
    """Generic one-shot band kernel. ``with_first`` selects the octave
    form (the input IS slice 0; dog[0] reads its central window) vs the
    fused-seed form (slice 0 itself is a matmul output — the input is
    the raw grayscale at the pre-upsample resolution when row_stride is
    ``BAND // 2``). ``win_offs[tt]`` is output tile tt's static window
    start inside the DMA'd columns (the X matrices are built against
    the same windows)."""
    b = pl.program_id(0)
    wt = pl.program_id(1)
    bd = pl.program_id(2)
    flat = (b * n_wt + wt) * n_bands + bd
    slot = jax.lax.rem(flat, 2)
    halo = (rows_in - row_stride) // 2
    col_stride = row_stride * len(win_offs)
    wt_cols = 128 * len(win_offs)

    def start_of(bd_):
        s = jnp.minimum(
            jnp.maximum(row_stride * bd_ - halo, 0), hp - rows_in
        )
        return pl.multiple_of(s, 8)

    def dma(b_, wt_, bd_, slot_):
        return pltpu.make_async_copy(
            x_hbm.at[
                b_,
                pl.ds(start_of(bd_), rows_in),
                pl.ds(wt_ * col_stride, dma_cols),
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

    prev = None
    if with_first:
        # The input band IS Gaussian slice 0: its central [BAND, wt_cols]
        # window feeds dog[0] = gauss[1] - gauss[0].
        off = pl.multiple_of(BAND * bd - start_of(bd), 8)
        prev = xin2[slot, pl.ds(off, BAND), :][:, 64 : 64 + wt_cols]
        prev = prev.astype(jnp.float32)

    x_hi, x_lo = _split_val(xin)

    for s in range(n_slices):
        cols = []
        for tt in range(len(win_offs)):
            w_hi = x_hi[:, win_offs[tt] : win_offs[tt] + 256]
            w_lo = (
                None
                if x_lo is None
                else x_lo[:, win_offs[tt] : win_offs[tt] + 256]
            )
            cols.append(
                _dot3(w_hi, w_lo, tx_hi_ref[s, tt], tx_lo_ref[s, tt])
            )
        xw = jnp.concatenate(cols, axis=1)          # [rows_in, wt_cols]
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
        if with_first:
            dog_ref[0, s] = y - prev
        elif s > 0:
            dog_ref[0, s - 1] = y - prev
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
    n_tt = _pick_ntt(n_t, BAND)
    win_offs = tuple(128 * tt for tt in range(n_tt))
    wt_cols = 128 * n_tt
    dma_cols = win_offs[-1] + 256
    n_wt = -(-n_t // n_tt)
    n_bands = -(-h // BAND)
    wc = wt_cols * n_wt

    # X matrices: reuse the banded-blur tiles (reflection folded at the
    # true width w); pad the tile axis so every column group is full.
    tx = np.zeros((n_slices, n_tt * n_wt, 256, 128), np.float32)
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
        dma_cols=dma_cols,
        win_offs=win_offs,
    )
    gauss, dog = _call_oneshot(
        kernel,
        grid,
        n_slices,
        n_slices,
        ROWS_IN,
        dma_cols,
        wt_cols,
        (b, n_slices, hp, wc),
        interpret,
        xpad,
        tx_hi,
        tx_lo,
        ty_hi,
        ty_lo,
    )

    gaussians = jnp.concatenate(
        [first[:, None].astype(jnp.float32), gauss[:, :, :h, :w]],
        axis=1,
    )
    return gaussians, dog[:, :, :h, :w]


def _pick_ntt(n_t: int, stride_unit: int) -> int:
    """Column-group width (output lane tiles per group): pick the k <= 5
    whose groups pad ``n_t`` tiles least (tie -> larger k, fewer
    groups), constrained to 128-aligned input DMA offsets
    (stride_unit * k % 128 == 0; stride_unit is the kernel's input cols
    per output tile — 64 when upsampling, else 128). Output-column
    padding is pure waste: padded lanes are computed, written, AND
    re-copied by the caller's crop, so zero-waste groupings beat wide
    ones (measured: octave 1 at 640 cols grouped 4x128 -> 1024 padded
    cols cost ~2x its compute)."""
    cands = [k for k in range(1, 6) if (stride_unit * k) % 128 == 0]
    return min(cands, key=lambda k: ((-(-n_t // k)) * k - n_t, -k))


def _call_oneshot(
    kernel,
    grid,
    n_gauss,
    n_dog,
    rows_in,
    dma_cols,
    wt_cols,
    out_dims,
    interpret,
    xpad,
    tx_hi,
    tx_lo,
    ty_hi,
    ty_lo,
):
    """Shared pallas_call plumbing of the one-shot kernels."""
    b, n_slices, hp, wc = out_dims
    tspec = lambda: pl.BlockSpec(
        tx_hi.shape[:1] + (wt_cols // 128, 256, 128),
        lambda b_, wt_, bd_: (0, wt_, 0, 0),
        memory_space=pltpu.VMEM,
    )
    yspec = lambda: pl.BlockSpec(
        ty_hi.shape[:1] + (1, rows_in, BAND),
        lambda b_, wt_, bd_: (0, bd_, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
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
                (1, n_gauss, BAND, wt_cols),
                lambda b_, wt_, bd_: (b_, 0, bd_, wt_),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_dog, BAND, wt_cols),
                lambda b_, wt_, bd_: (b_, 0, bd_, wt_),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_gauss, hp, wc), jnp.float32),
            jax.ShapeDtypeStruct((b, n_dog, hp, wc), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows_in, dma_cols), xpad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xpad, tx_hi, tx_lo, ty_hi, ty_lo)


# --- Fused seed + octave 0 -------------------------------------------------
#
# Octave 0's slices are all linear in the RAW grayscale: slice s =
# upsample-then-blur(gray, sqrt((sigma_s/d)^2 - (sigma_in/d)^2)), so the
# kernel can consume the grayscale directly (half-resolution input DMA),
# compose the 2x bilinear upsample into the per-slice X/Y matrices
# (ops/gaussian._upsample_blur_matrix), and emit slice 0 (= the seed
# image) as just another matmul output — the separate seed stage and its
# HBM round-trip disappear. Reference analogue: encodeSeedTexture +
# octave 0's cascade (DifferenceOfGaussians.swift:357-389) fused into one
# kernel pass over the input.


def _seed_geometry(delta_min: float, wo: int):
    """(row_stride, rows_in, win_offs) of the fused-seed kernel: the
    input band feeding one 128-row output band at this delta_min, with
    the column-group width picked by :func:`_pick_ntt` for the output
    width ``wo``. halo 16 holds composed radii <= ~30 at the OUTPUT
    resolution (2 output rows per input row when upsampling)."""
    row_stride, rows_in = (64, 96) if delta_min == 0.5 else (128, 160)
    n_tt = _pick_ntt(-(-wo // 128), row_stride)
    win_offs = tuple(row_stride * tt // 128 * 128 for tt in range(n_tt))
    return row_stride, rows_in, win_offs


def _seed_sigmas(config: SiftConfig) -> Tuple[float, ...]:
    """Blur of each octave-0 slice RELATIVE TO THE INPUT IMAGE, in
    output pixels: sqrt((sigma_s/d)^2 - (sigma_in/d)^2). Entry 0 is
    exactly config.seed_blur_sigma()."""
    d = config.delta_min
    s_in = config.sigma_input / d
    return tuple(
        math.sqrt((sig / d) ** 2 - s_in ** 2)
        for sig in config.octave_sigmas(0)
    )


@functools.lru_cache(maxsize=None)
def _seed_c_matrix(sigma: float, n: int, delta_min: float) -> np.ndarray:
    """Full 1-D pass matrix [n_out, n] for one fused-seed slice."""
    from ..gaussian import _band_matrix, _upsample_blur_matrix

    if delta_min == 0.5:
        return np.asarray(_upsample_blur_matrix(sigma, n))
    return np.asarray(_band_matrix(sigma, n))


def _slice_support(c: np.ndarray, r0: int, c0: int, rows: int, cols: int):
    """[rows, cols] block of ``c`` at (r0, c0) (zero-padded outside);
    raises if any nonzero of the row block falls outside the col
    window (the kernel would silently drop those taps)."""
    out = np.zeros((rows, cols), np.float32)
    rr = slice(max(r0, 0), min(r0 + rows, c.shape[0]))
    cc = slice(max(c0, 0), min(c0 + cols, c.shape[1]))
    if rr.start < rr.stop and cc.start < cc.stop:
        out[rr.start - r0 : rr.stop - r0, cc.start - c0 : cc.stop - c0] = c[
            rr, cc
        ]
    full = np.abs(c[rr, :]).sum()
    kept = np.abs(out).sum()
    assert abs(full - kept) <= 1e-9 * max(full, 1.0), (r0, c0, full - kept)
    return out


@functools.lru_cache(maxsize=None)
def _seed_matrices(config: SiftConfig, h: int, w: int):
    """(tx [6, n_tt*n_wt, 256, 128], ty [6, n_bands, rows_in, 128],
    n_wt, n_bands) for the fused-seed kernel on an [h, w] grayscale."""
    up = 2 if config.delta_min == 0.5 else 1
    ho, wo = up * h, up * w
    row_stride, rows_in, win_offs = _seed_geometry(config.delta_min, wo)
    n_tt = len(win_offs)
    col_stride = n_tt * row_stride
    halo = (rows_in - row_stride) // 2
    n_t = -(-wo // 128)
    n_wt = -(-n_t // n_tt)
    n_bands = -(-ho // BAND)
    hp = row_stride * n_bands
    sigs = _seed_sigmas(config)

    tx = np.zeros((len(sigs), n_tt * n_wt, 256, 128), np.float32)
    ty = np.zeros((len(sigs), n_bands, rows_in, BAND), np.float32)
    for s, sig in enumerate(sigs):
        cx = _seed_c_matrix(float(sig), w, config.delta_min)
        cy = _seed_c_matrix(float(sig), h, config.delta_min)
        for g in range(n_wt):
            for tt in range(n_tt):
                # Output tile's 128 cols vs its 256-col input window
                # (both in the kernel's padded input coordinates whose
                # origin is unpadded col -64).
                blk = _slice_support(
                    cx,
                    128 * (n_tt * g + tt),
                    col_stride * g + win_offs[tt] - 64,
                    BAND,
                    256,
                )
                tx[s, n_tt * g + tt] = blk.T
        for bd in range(n_bands):
            start = min(max(row_stride * bd - halo, 0), hp - rows_in)
            assert start % 8 == 0, (bd, start)
            blk = _slice_support(cy, BAND * bd, start, BAND, rows_in)
            ty[s, bd] = blk.T
    return tx, ty, n_wt, n_bands


def seed_supports(config: SiftConfig, h: int, w: int) -> bool:
    """True when the fused seed+octave-0 kernel covers this input
    (geometry gates + every matrix tap inside its static window)."""
    if config.delta_min not in (0.5, 1.0) or w < 128:
        return False
    up = 2 if config.delta_min == 0.5 else 1
    _, rows_in, _ = _seed_geometry(config.delta_min, up * w)
    if h < rows_in:
        return False
    try:
        _seed_matrices(config, h, w)
    except AssertionError:
        return False
    return True


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def seed_octave_pallas(
    gray: jnp.ndarray,
    config: SiftConfig,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Grayscale [B, h, w] fp32 -> (gaussians [B, S, H, W], dogs
    [B, S-1, H, W]) of octave 0 at H, W = h, w times (2 if delta_min ==
    0.5 else 1), with the seed upsample+blur folded into every slice's
    matrices and slice 0 emitted by the kernel itself."""
    b, h, w = gray.shape
    up = 2 if config.delta_min == 0.5 else 1
    ho, wo = up * h, up * w
    row_stride, rows_in, win_offs = _seed_geometry(config.delta_min, wo)
    n_tt = len(win_offs)
    wt_cols = 128 * n_tt
    tx, ty, n_wt, n_bands = _seed_matrices(config, h, w)
    n_slices = tx.shape[0]
    hp = row_stride * n_bands        # input rows incl. bottom padding
    wc = wt_cols * n_wt
    tx_hi, tx_lo = _split_bf16(tx)
    ty_hi, ty_lo = _split_bf16(ty)

    # Pad cols so every group's [col_stride*wt, +dma_cols) window exists
    # (origin -64), rows so every band's window fits below.
    dma_cols = win_offs[-1] + 256
    pad_r = row_stride * n_wt * n_tt + dma_cols - 64 - w
    xpad = jnp.pad(gray, ((0, 0), (0, hp - h), (64, pad_r)))

    kernel = functools.partial(
        _oneshot_kernel,
        n_slices=n_slices,
        n_bands=n_bands,
        n_wt=n_wt,
        hp=hp,
        rows_in=rows_in,
        dma_cols=dma_cols,
        row_stride=row_stride,
        win_offs=win_offs,
        with_first=False,
    )
    gauss, dog = _call_oneshot(
        kernel,
        (b, n_wt, n_bands),
        n_slices,
        n_slices - 1,
        rows_in,
        dma_cols,
        wt_cols,
        (b, n_slices, BAND * n_bands, wc),
        interpret,
        xpad,
        tx_hi,
        tx_lo,
        ty_hi,
        ty_lo,
    )
    return gauss[:, :, :ho, :wo], dog[:, :, :ho, :wo]
