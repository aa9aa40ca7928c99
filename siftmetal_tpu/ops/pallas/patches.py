"""Per-keypoint patch kernels: orientation histograms and descriptors.

The per-lane patch stages dominate post-detection cost in the XLA path:
each lane's 3x3-to-81x81 window becomes a separate tiny dynamic-slice DMA
(~1.8 us each; thousands per frame). These Pallas kernels instead walk
lanes in groups of 8 per grid step, issue all 16 patch DMAs up front
(overlapping), and fuse the entire per-lane reduction — Gaussian window,
soft assignment, and the [16, P] x [P, 8] contraction — in VMEM.

Alignment rules (Mosaic): DMA offsets must be 8-aligned (sublanes) and
128-aligned (lanes), so the gradient fields are padded and each lane's
window start is aligned DOWN; the residual offset is carried in the
continuous patch coordinates, and the window is oversized so the true
patch always fits ([88, 256] for descriptors, [48, 256] for
orientations). Samples outside the true radius fail the same
inside-the-window test the XLA path applies, so results match exactly.

Reference analogues: SIFTOrientation.metal:88-136 and
SIFTDescriptor.metal:120-237 (per-keypoint GPU threads; here per-lane
VMEM-resident tiles).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import SiftConfig

GROUP = 8  # lanes per grid step (matches the 8-sublane output tiling)


def _atan_poly(q: jnp.ndarray) -> jnp.ndarray:
    """Minimax polynomial arctan on [0, 1] (~1e-6 max error) — Mosaic has
    no atan/atan2 primitive. Accuracy is far below what the tent-weighted
    orientation binning can resolve (bin width 10 degrees)."""
    q2 = q * q
    return q * (
        0.99997726
        + q2
        * (
            -0.33262347
            + q2
            * (
                0.19354346
                + q2 * (-0.11643287 + q2 * (0.05265332 + q2 * -0.01172120))
            )
        )
    )


def _atan2(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """atan2 in (-pi, pi] via octant reduction + polynomial arctan;
    (0, 0) maps to 0 (those samples carry zero magnitude)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    q = jnp.minimum(ax, ay) / jnp.maximum(jnp.maximum(ax, ay), 1e-30)
    a = _atan_poly(q)
    a = jnp.where(ay > ax, jnp.pi / 2 - a, a)
    a = jnp.where(x < 0, jnp.pi - a, a)
    return jnp.where(y < 0, -a, a)


def _pad_fields(gi: jnp.ndarray, gj: jnp.ndarray, rpad: int, cpad: int):
    """[S, H, W] -> flattened [S * Hp, Wp] with per-slice spatial padding
    (Hp mult of 8, Wp mult of 128)."""
    s, h, w = gi.shape
    hp = (h + 2 * rpad + 7) // 8 * 8
    wp = (w + 2 * cpad + 127) // 128 * 128
    pad = lambda a: jnp.pad(
        a, ((0, 0), (rpad, hp - h - rpad), (cpad, wp - w - cpad))
    ).reshape(s * hp, wp)
    return pad(gi), pad(gj), hp, wp


def _lane_prep(scale, x_oct, y_oct, rpad, cpad, hp, radius):
    """Aligned window starts + continuous centers in padded coordinates."""
    ci = jnp.round(x_oct).astype(jnp.int32) + rpad
    cj = jnp.round(y_oct).astype(jnp.int32) + cpad
    r0 = ((ci - radius) // 8) * 8
    c0 = ((cj - radius) // 128) * 128
    row0 = (scale - 1) * hp + r0
    return row0, r0, c0, x_oct + rpad, y_oct + cpad


def _descriptor_kernel(
    # scalar prefetch
    row0_ref, r0_ref, c0_ref, x_ref, y_ref, sig_ref, th_ref,
    # inputs
    gi_hbm, gj_hbm,
    # output
    out_ref,
    # scratch
    pgi, pgj, sems,
    *,
    rows, cols, n_hist, n_ori, lam,
):
    g = pl.program_id(0)
    n_g = pl.num_programs(0)
    slot = jax.lax.rem(g, 2)
    nslot = jax.lax.rem(g + 1, 2)

    def dma(grp, sl, u, src, dest, sem_bank):
        l = grp * GROUP + u
        base = pl.multiple_of(row0_ref[l], 8)
        c0 = pl.multiple_of(c0_ref[l], 128)
        return pltpu.make_async_copy(
            src.at[pl.ds(base, rows), pl.ds(c0, cols)],
            dest.at[sl, u],
            sems.at[sem_bank, sl, u],
        )

    def start_group(grp, sl):
        for u in range(GROUP):
            dma(grp, sl, u, gi_hbm, pgi, 0).start()
            dma(grp, sl, u, gj_hbm, pgj, 1).start()

    # Double buffering: group g's patches were prefetched by program g-1;
    # program g prefetches group g+1 while it computes.
    @pl.when(g == 0)
    def _():
        start_group(0, slot)

    @pl.when(g + 1 < n_g)
    def _():
        start_group(g + 1, nslot)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0).astype(
        jnp.float32
    )
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1).astype(
        jnp.float32
    )
    half = lam * (n_hist + 1) / n_hist
    cell = 2.0 * lam / n_hist

    for u in range(GROUP):
        dma(g, slot, u, gi_hbm, pgi, 0).wait()
        dma(g, slot, u, gj_hbm, pgj, 1).wait()
        l = g * GROUP + u
        gi = pgi[slot, u]
        gj = pgj[slot, u]
        sig = sig_ref[l]
        th = th_ref[l]
        dm = row_iota + (r0_ref[l].astype(jnp.float32) - x_ref[l])
        dn = col_iota + (c0_ref[l].astype(jnp.float32) - y_ref[l])
        ct = jnp.cos(th)
        st = jnp.sin(th)
        xr = (ct * dm + st * dn) / sig
        yr = (-st * dm + ct * dn) / sig
        inside = (jnp.abs(xr) < half) & (jnp.abs(yr) < half)
        mag = jnp.sqrt(gi * gi + gj * gj)
        contrib = (
            jnp.exp(-(xr * xr + yr * yr) / (2.0 * lam * lam)) * mag * inside
        )
        phi = jnp.mod(_atan2(gj, gi) - th, 2.0 * jnp.pi)

        # Pre-weighted orientation maps (wo_k * contrib folded in once).
        wo_maps = []
        for k in range(n_ori):
            ok = k * 2.0 * jnp.pi / n_ori
            d = jnp.abs(phi - ok)
            d = jnp.minimum(d, 2.0 * jnp.pi - d)
            wo_maps.append(
                contrib * jnp.maximum(0.0, 1.0 - d * (n_ori / (2.0 * jnp.pi)))
            )

        # 16x8 full-map reductions (Mosaic's matmul cannot contract two
        # dims at once; keepdims sums + concats compile to clean VPU
        # reduction trees).
        wa_maps = []
        wb_maps = []
        for a in range(n_hist):
            ca = (a + 1 - (n_hist + 1) / 2.0) * cell
            wa_maps.append(
                jnp.maximum(0.0, 1.0 - jnp.abs(xr - ca) / cell)
            )
            wb_maps.append(
                jnp.maximum(0.0, 1.0 - jnp.abs(yr - ca) / cell)
            )
        hist_rows = []
        for a in range(n_hist):
            for b in range(n_hist):
                ab_map = wa_maps[a] * wb_maps[b]
                entries = [
                    jnp.sum(ab_map * wo_maps[k], keepdims=True)
                    for k in range(n_ori)
                ]
                hist_rows.append(jnp.concatenate(entries, axis=1))  # [1, 8]
        hist = jnp.concatenate(hist_rows, axis=0)     # [16, 8]
        padded = jnp.concatenate(
            [hist, jnp.zeros((n_hist * n_hist, 128 - n_ori), jnp.float32)],
            axis=1,
        )
        out_ref[u * 16:(u + 1) * 16, :] = padded


def descriptor_lanes_pallas(
    gauss: jnp.ndarray,
    scale: jnp.ndarray,
    x_oct: jnp.ndarray,
    y_oct: jnp.ndarray,
    sigma_oct: jnp.ndarray,
    theta: jnp.ndarray,
    config: SiftConfig,
    interpret: bool = False,
) -> jnp.ndarray:
    """Raw [L, 128] descriptor histograms (un-normalized) via Pallas."""
    from ...sift.describe import gradients

    radius = config.desc_patch_radius  # 40 with defaults
    rows = (2 * radius + 1 + 7 + 7) // 8 * 8           # 88
    cols = (2 * radius + 1 + 127 + 127) // 128 * 128   # 256
    rpad = rows - radius                               # >= radius + 8
    cpad = 256

    gi, gj = gradients(gauss[1:config.n_scales_per_octave + 1])
    gi_f, gj_f, hp, wp = _pad_fields(gi, gj, rpad, cpad)

    l = scale.shape[0]
    assert l % GROUP == 0, l
    row0, r0, c0, xp, yp = _lane_prep(
        scale, x_oct, y_oct, rpad, cpad, hp, radius
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(l // GROUP,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (GROUP * 16, 128),
            lambda g, *_: (g, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, GROUP, rows, cols), jnp.float32),
            pltpu.VMEM((2, GROUP, rows, cols), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2, GROUP)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _descriptor_kernel,
            rows=rows,
            cols=cols,
            n_hist=config.n_histograms_per_axis,
            n_ori=config.n_descriptor_bins,
            lam=config.descriptor_lambda,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((l * 16, 128), jnp.float32),
        interpret=interpret,
    )(row0, r0, c0, xp, yp, sigma_oct, theta, gi_f, gj_f)
    # [L*16, 128] -> [L, 16, 8] -> [L, 128]
    return out.reshape(l, 16, 128)[:, :, :config.n_descriptor_bins].reshape(
        l, -1
    )


def _orientation_kernel(
    row0_ref, r0_ref, c0_ref, x_ref, y_ref, sig_ref,
    gi_hbm, gj_hbm,
    out_ref,
    pgi, pgj, sems,
    *,
    rows, cols, n_bins, lam,
):
    g = pl.program_id(0)
    n_g = pl.num_programs(0)
    slot = jax.lax.rem(g, 2)
    nslot = jax.lax.rem(g + 1, 2)

    def dma(grp, sl, u, src, dest, sem_bank):
        l = grp * GROUP + u
        base = pl.multiple_of(row0_ref[l], 8)
        c0 = pl.multiple_of(c0_ref[l], 128)
        return pltpu.make_async_copy(
            src.at[pl.ds(base, rows), pl.ds(c0, cols)],
            dest.at[sl, u],
            sems.at[sem_bank, sl, u],
        )

    def start_group(grp, sl):
        for u in range(GROUP):
            dma(grp, sl, u, gi_hbm, pgi, 0).start()
            dma(grp, sl, u, gj_hbm, pgj, 1).start()

    @pl.when(g == 0)
    def _():
        start_group(0, slot)

    @pl.when(g + 1 < n_g)
    def _():
        start_group(g + 1, nslot)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0).astype(
        jnp.float32
    )
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1).astype(
        jnp.float32
    )

    for u in range(GROUP):
        dma(g, slot, u, gi_hbm, pgi, 0).wait()
        dma(g, slot, u, gj_hbm, pgj, 1).wait()
        l = g * GROUP + u
        gi = pgi[slot, u]
        gj = pgj[slot, u]
        sig = sig_ref[l]
        dm = row_iota + (r0_ref[l].astype(jnp.float32) - x_ref[l])
        dn = col_iota + (c0_ref[l].astype(jnp.float32) - y_ref[l])
        r_max = 3.0 * lam * sig
        inside = (jnp.abs(dm) <= r_max) & (jnp.abs(dn) <= r_max)
        mag = jnp.sqrt(gi * gi + gj * gj)
        w = (
            jnp.exp(-(dm * dm + dn * dn) / (2.0 * (lam * sig) ** 2))
            * mag
            * inside
        )
        thetab = jnp.mod(_atan2(gj, gi), 2.0 * jnp.pi) * (
            n_bins / (2.0 * jnp.pi)
        )
        b = jnp.mod(jnp.round(thetab), float(n_bins))

        # 36 one-hot-masked full-map sums -> one [1, 36] row.
        entries = [
            jnp.sum(jnp.where(b == float(k), w, 0.0), keepdims=True)
            for k in range(n_bins)
        ]
        hist = jnp.concatenate(entries, axis=1)       # [1, 36]
        padded = jnp.concatenate(
            [hist, jnp.zeros((1, 128 - n_bins), jnp.float32)], axis=1
        )
        out_ref[u:u + 1, :] = padded


def orientation_hist_lanes_pallas(
    gauss: jnp.ndarray,
    scale: jnp.ndarray,
    x_oct: jnp.ndarray,
    y_oct: jnp.ndarray,
    sigma_oct: jnp.ndarray,
    config: SiftConfig,
    interpret: bool = False,
) -> jnp.ndarray:
    """Raw (un-smoothed) [L, n_bins] orientation histograms via Pallas."""
    from ...sift.describe import gradients

    radius = config.ori_patch_radius   # 18 with defaults
    rows = (2 * radius + 1 + 7 + 7) // 8 * 8           # 48
    cols = 256
    rpad = rows - radius
    cpad = 256

    gi, gj = gradients(gauss[1:config.n_scales_per_octave + 1])
    gi_f, gj_f, hp, wp = _pad_fields(gi, gj, rpad, cpad)

    l = scale.shape[0]
    assert l % GROUP == 0, l
    row0, r0, c0, xp, yp = _lane_prep(
        scale, x_oct, y_oct, rpad, cpad, hp, radius
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(l // GROUP,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (GROUP, 128), lambda g, *_: (g, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, GROUP, rows, cols), jnp.float32),
            pltpu.VMEM((2, GROUP, rows, cols), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2, GROUP)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _orientation_kernel,
            rows=rows,
            cols=cols,
            n_bins=config.n_orientation_bins,
            lam=config.orientation_lambda,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((l, 128), jnp.float32),
        interpret=interpret,
    )(row0, r0, c0, xp, yp, sigma_oct, gi_f, gj_f)
    return out[:, :config.n_orientation_bins]
