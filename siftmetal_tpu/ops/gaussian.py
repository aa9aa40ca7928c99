"""Separable Gaussian blur with half-sample-symmetric boundary handling.

TPU-native equivalent of the reference's convolution kernels
(Sources/MetalShaders/Metal/Convolution.metal, ConvolutionSeries.metal) and
the tap builder (Sources/SIFTMetal/Metal Compute/GaussianKernel.swift:19-43).

Design notes (TPU-first):
  * Taps are computed host-side (radius = ceil(4*sigma), normalized
    exp(-k^2 / (2 sigma^2))) and baked into the traced program as constants —
    the analogue of the reference pre-baking weights into a
    ``ConvolutionParameters`` buffer at init (ConvolutionSeriesKernel.swift:41-54).
  * The convolution itself is expressed as symmetric-pad + depthwise
    ``lax.conv_general_dilated`` over the last two axes, which XLA lowers to
    efficient fused TPU code; arbitrary leading axes are folded into the conv
    batch dimension, so this vmaps over frame batches for free.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def gaussian_taps(sigma: float) -> np.ndarray:
    """Normalized taps, radius ceil(4*sigma) (GaussianKernel.swift:19-43)."""
    radius = int(math.ceil(4.0 * sigma))
    k = np.arange(-radius, radius + 1, dtype=np.float64)
    w = np.exp(-0.5 * (k * k) / (sigma * sigma))
    w /= w.sum()
    return w.astype(np.float32)


def _conv1d_sym(
    image: jnp.ndarray, taps: np.ndarray, axis: int, out_dtype=None
) -> jnp.ndarray:
    """1-D convolution along ``axis`` (-1 or -2) with symmetric padding.

    Implemented as an unrolled shift-and-add (pad + sum of tap-weighted
    static slices) rather than ``lax.conv_general_dilated``:

      * exact fp32 VPU math — the TPU conv op in fp32/HIGHEST costs ~50 ms
        for one 960x1280 blur (measured, v5e) vs ~1 ms for shift-add, and
        its default-precision path computes in bf16, which empirically
        inflates fine-scale DoG extrema 2.5x vs the IPOL fixtures;
      * XLA fuses the whole tap sum into one pass over memory;
      * batches/vmaps/shards over any leading axes with no special cases
        (the Pallas variant in ops/pallas/blur.py is equivalent and tiled
        explicitly; it benches the same 1 ms — kept for the single-image
        fast path and as the kernel-authoring reference).
    """
    radius = len(taps) // 2
    pad = [(0, 0)] * image.ndim
    pad[axis] = (radius, radius)
    x = jnp.pad(image, pad, mode="symmetric")

    n = image.shape[axis]
    # Reduced-precision inputs (bf16 fast mode): accumulate the tap sum in
    # fp32 and round ONCE at the end — accumulating in bf16 compounds
    # ~sqrt(n_taps) rounding errors per pass, which lands directly on the
    # tiny DoG differences downstream. The upcast fuses into the same
    # HBM pass, so the bandwidth saving of bf16 storage is kept.
    if out_dtype is None:
        out_dtype = image.dtype
    upcast = image.dtype != jnp.float32
    acc = None
    for k in range(2 * radius + 1):
        sl = [slice(None)] * image.ndim
        sl[axis] = slice(k, k + n)
        v = x[tuple(sl)]
        if upcast:
            v = v.astype(jnp.float32)
        term = float(taps[k]) * v
        acc = term if acc is None else acc + term
    return acc.astype(out_dtype)


@functools.lru_cache(maxsize=None)
def _band_matrix(sigma: float, n: int) -> np.ndarray:
    """Dense [n_out, n_in] Toeplitz band for a 1-D Gaussian pass with the
    half-sample-symmetric boundary FOLDED INTO the edge columns.

    ``out[i] = sum_j T[i, j] * x[j]`` reproduces pad(symmetric)+shift-add
    exactly (up to summation order): tap k of output i reads reflected
    index ``reflect(i + k)`` where reflect is the period-2n triangle map
    (handles radius > n, which tiny top octaves can hit)."""
    taps = gaussian_taps(sigma).astype(np.float64)
    r = len(taps) // 2
    i = np.arange(n)[:, None]
    k = np.arange(-r, r + 1)[None, :]
    idx = np.mod(i + k, 2 * n)
    idx = np.where(idx < n, idx, 2 * n - 1 - idx)
    t = np.zeros((n, n), np.float64)
    np.add.at(
        t,
        (np.repeat(np.arange(n), 2 * r + 1), idx.ravel()),
        np.tile(taps, n),
    )
    return t.astype(np.float32)


def blur_mxu(
    image: jnp.ndarray, sigma: float, out_dtype=None, precision="highest"
) -> jnp.ndarray:
    """Separable Gaussian blur as two banded-Toeplitz MATMULS (MXU path).

    The shift-add reference (``blur``) is VPU work: ~20 fused
    multiply-adds per pixel per pass, and the whole parity-config pyramid
    costs ~6 ms/frame at 640x480 — the largest stage after the fused
    detection kernel. Expressing each 1-D pass as ``image @ T`` moves it
    to the MXU: fp32 inputs run at HIGHEST precision (6-pass bf16,
    ~2e-6 relative error — far below the DoG threshold 0.0133 and the
    fixtures' 1%% count tolerance), bf16 fast-mode inputs run at native
    MXU bf16 with fp32 accumulation (the same read-bf16/accumulate-fp32
    contract as the shift-add fast mode). The dense [n, n] band wastes
    n/(2r+1) FLOPs vs the band width, but the MXU's ~2 orders higher
    throughput more than covers it at every octave size.

    Reference analogue: ConvolutionSeries.metal — redesigned for the MXU
    rather than translated.
    """
    if sigma <= 0.0:
        return image if out_dtype is None else image.astype(out_dtype)
    if out_dtype is None:
        out_dtype = image.dtype
    h, w = image.shape[-2], image.shape[-1]
    t_w = jnp.asarray(_band_matrix(float(sigma), w))
    t_h = jnp.asarray(_band_matrix(float(sigma), h))
    bf16 = image.dtype == jnp.bfloat16
    if bf16:
        t_w = t_w.astype(jnp.bfloat16)
        t_h = t_h.astype(jnp.bfloat16)
        prec = None  # native MXU bf16, fp32 accumulation
    else:
        prec = (
            lax.Precision.HIGH
            if precision == "high"
            else lax.Precision.HIGHEST
        )
    x = jnp.einsum(
        "...hw,vw->...hv",
        image,
        t_w,
        precision=prec,
        preferred_element_type=jnp.float32,
    )
    if bf16:
        # Mirror the shift-add fast mode: the intermediate the second
        # pass READS is stored bf16; the final emit keeps the fp32
        # accumulator (see ``blur`` docstring for why).
        x = x.astype(jnp.bfloat16)
    y = jnp.einsum(
        "ij,...jw->...iw",
        t_h,
        x,
        precision=prec,
        preferred_element_type=jnp.float32,
    )
    return y.astype(out_dtype)


def blur(image: jnp.ndarray, sigma: float, out_dtype=None) -> jnp.ndarray:
    """Separable Gaussian blur of [..., H, W] with symmetric boundary.

    ``out_dtype`` overrides the output dtype: the bf16 fast-mode pyramid
    reads a bf16 chain but takes the SECOND pass's fp32 accumulator
    un-rounded (out_dtype=float32) — quantizing the stored Gaussians
    makes neighboring DoG samples collide into plateaus and the strict
    extrema test drops ~1/3 of keypoints (measured on the butterfly)."""
    if sigma <= 0.0:
        return image if out_dtype is None else image.astype(out_dtype)
    taps = gaussian_taps(sigma)
    first = _conv1d_sym(image, taps, axis=-1)
    if out_dtype is not None:
        return _conv1d_sym(first, taps, axis=-2, out_dtype=out_dtype)
    return _conv1d_sym(first, taps, axis=-2)


@functools.lru_cache(maxsize=None)
def _band_tiles(sigma: float, n: int) -> "np.ndarray":
    """Per-tile [n_t, 256, 128] band blocks for a 1-D Gaussian pass.

    Output tile t covers cols [128t, 128(t+1)); its inputs live in the
    256-col window [128t - 64, 128t + 192) of the ZERO-padded (64 each
    side) input. The half-sample-symmetric reflection is folded into
    window-local indices (a reflected index near an image edge always
    lands within 64 of that edge, so it stays inside the window for
    radius <= 64). Cuts the dense [n, n] band's n/(2r+1) FLOP waste to
    256/(2r+1) while staying pure matmul."""
    taps = gaussian_taps(sigma).astype(np.float64)
    r = len(taps) // 2
    assert r <= 64, (sigma, r)
    n_t = (n + 127) // 128
    t_all = np.zeros((n_t, 256, 128), np.float64)
    for t in range(n_t):
        base = 128 * t - 64  # window start in unpadded coords
        for v in range(128):
            j = 128 * t + v
            if j >= n:
                continue
            for k_i, tap in enumerate(taps):
                idx = j + k_i - r
                m = idx % (2 * n)
                idx = m if m < n else 2 * n - 1 - m
                w = idx - base
                assert 0 <= w < 256, (sigma, n, t, v, idx)
                t_all[t, w, v] += tap
    return t_all.astype(np.float32)


def blur_mxu_banded(
    image: jnp.ndarray, sigma: float, out_dtype=None, precision="highest"
) -> jnp.ndarray:
    """Separable Gaussian blur as BLOCKED band matmuls on the MXU.

    Same contract as :func:`blur_mxu` but each 128-wide output tile
    contracts only its 256-wide input window — ~W/256 fewer FLOPs than
    the dense band at octave-0 widths. Requires radius <= 64 (true for
    every sigma in the IPOL cascade)."""
    if sigma <= 0.0:
        return image if out_dtype is None else image.astype(out_dtype)
    if out_dtype is None:
        out_dtype = image.dtype
    h, w = image.shape[-2], image.shape[-1]
    t_w = jnp.asarray(_band_tiles(float(sigma), w))
    t_h = jnp.asarray(_band_tiles(float(sigma), h))
    bf16 = image.dtype == jnp.bfloat16
    if bf16:
        t_w = t_w.astype(jnp.bfloat16)
        t_h = t_h.astype(jnp.bfloat16)
        prec = None
    else:
        prec = (
            lax.Precision.HIGH
            if precision == "high"
            else lax.Precision.HIGHEST
        )

    def windows(x, axis_len, axis):
        # [..., n] -> [..., n_t, 256] overlapping 256-windows at stride
        # 128 of the 64-zero-padded axis (static slices + stack).
        n_t = (axis_len + 127) // 128
        pad = [(0, 0)] * x.ndim
        pad[axis] = (64, 64 + 128 * n_t - axis_len)
        xp = jnp.pad(x, pad)
        slices = []
        for t in range(n_t):
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(128 * t, 128 * t + 256)
            slices.append(xp[tuple(sl)])
        return jnp.stack(slices, axis=axis if axis >= 0 else x.ndim + axis)

    # X pass: windows over the last axis -> [..., h, n_t, 256]
    xw = windows(image, w, -1)
    x = jnp.einsum(
        "...tc,tcv->...tv",
        xw,
        t_w,
        precision=prec,
        preferred_element_type=jnp.float32,
    )
    x = x.reshape(*x.shape[:-2], -1)[..., :w]
    if bf16:
        x = x.astype(jnp.bfloat16)
    # Y pass: windows over the row axis -> [..., n_t, 256, w]
    yw = windows(x, h, -2)
    y = jnp.einsum(
        "...tcw,tcv->...tvw",
        yw,
        t_h,
        precision=prec,
        preferred_element_type=jnp.float32,
    )
    y = y.reshape(*y.shape[:-3], -1, y.shape[-1])[..., :h, :]
    return y.astype(out_dtype)


@functools.lru_cache(maxsize=None)
def _band_conv_kernel(sigma: float) -> "np.ndarray":
    """[3, 128, 128] tile-conv kernel for a 1-D Gaussian pass over a
    128-zero-prefixed, reflection-prefilled input (see blur_mxu_conv):
    K[dt, u, v] couples input tile t+dt lane u to output tile t+1's
    lane v. Shift-invariant in t, so ONE kernel serves every tile — the
    banded matmul as a 128-feature conv the MXU runs directly, with no
    overlapping-window materialization in HBM."""
    taps = gaussian_taps(sigma).astype(np.float64)
    r = len(taps) // 2
    assert r <= 64, r
    k = np.zeros((3, 128, 128), np.float64)
    for dt in range(3):
        for v in range(128):
            for d in range(-r, r + 1):
                u = 128 * (1 - dt) + v + d
                if 0 <= u < 128:
                    k[dt, u, v] += taps[d + r]
    return k.astype(np.float32)


def _conv_pass_last(x: jnp.ndarray, sigma: float, prec) -> jnp.ndarray:
    """One Gaussian pass along the LAST axis as a 128-feature tile conv
    (see _band_conv_kernel). ``x`` is [..., n]; boundary handling is the
    same half-sample reflection as blur/_band_matrix, realized by
    prefilling the 128-col zero prefix with the reflected edge."""
    taps = gaussian_taps(sigma)
    r = len(taps) // 2
    n = x.shape[-1]
    n_t = (n + 127) // 128
    lead = x.shape[:-1]
    # [.., 128 zero/reflect prefix | x | right reflect + zero pad]
    left = x[..., :r][..., ::-1]
    right = x[..., n - r:][..., ::-1]
    xp = jnp.concatenate(
        [
            jnp.zeros(lead + (128 - r,), x.dtype),
            left,
            x,
            right,
            jnp.zeros(lead + (128 * (n_t + 1) - n - r,), x.dtype),
        ],
        axis=-1,
    ).reshape(lead + (n_t + 2, 128))
    kern = jnp.asarray(_band_conv_kernel(float(sigma)))
    flat = xp.reshape((-1, n_t + 2, 128))
    out = jax.lax.conv_general_dilated(
        flat,
        kern,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=prec,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(lead + (n_t * 128,))[..., :n]


def blur_mxu_conv(
    image: jnp.ndarray, sigma: float, out_dtype=None, precision="highest"
) -> jnp.ndarray:
    """Separable Gaussian blur with BOTH 1-D passes as 128-feature tile
    convs on the MXU (X directly; Y via transpose). Same numerics
    contract as blur_mxu_banded; unlike it, no overlapping 256-column
    window stacks are materialized in HBM — the conv reads each input
    element once."""
    if sigma <= 0.0:
        return image if out_dtype is None else image.astype(out_dtype)
    if out_dtype is None:
        out_dtype = image.dtype
    prec = (
        None
        if image.dtype == jnp.bfloat16
        else (
            lax.Precision.HIGH
            if precision == "high"
            else lax.Precision.HIGHEST
        )
    )
    x = _conv_pass_last(image, sigma, prec)
    x = jnp.swapaxes(x, -1, -2)
    if image.dtype == jnp.bfloat16:
        x = x.astype(jnp.bfloat16)
    y = _conv_pass_last(x, sigma, prec)
    return jnp.swapaxes(y, -1, -2).astype(out_dtype)


@functools.lru_cache(maxsize=None)
def _upsample_blur_matrix(sigma: float, n: int) -> "np.ndarray":
    """[2n, n] matrix = Gaussian band (at 2n) COMPOSED with IPOL 2x
    bilinear upsampling — the seed stage's upsample+blur collapses to
    one rectangular matmul per axis, never materializing the upsampled
    image (both ops are linear; see ops/image.upsample_bilinear_2x for
    the sampling: even outputs copy, odd outputs are neighbor midpoints
    with symmetric extension at the far edge)."""
    u = np.zeros((2 * n, n), np.float64)
    for i in range(n):
        u[2 * i, i] = 1.0
        u[2 * i + 1, i] += 0.5
        u[2 * i + 1, min(i + 1, n - 1)] += 0.5
    t = _band_matrix(sigma, 2 * n).astype(np.float64)
    return (t @ u).astype(np.float32)


def seed_blur_mxu(
    image: jnp.ndarray, sigma: float, out_dtype=None, precision="highest"
) -> jnp.ndarray:
    """Fused 2x-bilinear-upsample + Gaussian blur as two rectangular
    MXU matmuls: [..., H, W] -> [..., 2H, 2W]. Matches
    ``blur(upsample_bilinear_2x(x), sigma)`` to fp32 rounding."""
    if out_dtype is None:
        out_dtype = image.dtype
    h, w = image.shape[-2], image.shape[-1]
    c_w = jnp.asarray(_upsample_blur_matrix(float(sigma), w))
    c_h = jnp.asarray(_upsample_blur_matrix(float(sigma), h))
    bf16 = image.dtype == jnp.bfloat16
    if bf16:
        c_w = c_w.astype(jnp.bfloat16)
        c_h = c_h.astype(jnp.bfloat16)
        prec = None
    else:
        prec = (
            lax.Precision.HIGH
            if precision == "high"
            else lax.Precision.HIGHEST
        )
    x = jnp.einsum(
        "...hw,vw->...hv",
        image,
        c_w,
        precision=prec,
        preferred_element_type=jnp.float32,
    )
    if bf16:
        x = x.astype(jnp.bfloat16)
    y = jnp.einsum(
        "ij,...jw->...iw",
        c_h,
        x,
        precision=prec,
        preferred_element_type=jnp.float32,
    )
    return y.astype(out_dtype)
