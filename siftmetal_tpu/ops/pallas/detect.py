"""Fused extrema-mask + Taylor-fields + edge-test Pallas kernel.

Detection is the extraction pipeline's largest stage after batching
(measured v5e, batch 8: extrema mask ~1.0 ms/frame, dense Taylor fields
~1.05 ms, edge fields ~0.7 ms — each a separate XLA pass re-reading the
DoG stack from HBM). This kernel computes all three for one octave in a
SINGLE pass: each row-tile of the [S, H, W] DoG stack is DMA'd to VMEM
once (1-row halo) and the 26-neighbour strict-extrema mask, the soft
DoG threshold, the per-sample 3x3x3 Taylor step (offsets + interpolated
value) and the IPOL edge-response acceptance are all emitted from the
same resident tile.

The math is IDENTICAL to the XLA reference implementations
(sift/detect.py: extrema_mask, dense_taylor_fields, dense_edge_ok) —
those remain the numeric reference on non-TPU backends; interpret-mode
equivalence is asserted by tests/test_pallas.py.

Output layout: planes are indexed like the XLA fields (entry (s, r, c)
describes DoG center (s+1, r+1, c+1)) but padded to (Ht, Wp) =
(n_tiles * tile_h, 128-aligned width); the soft mask is zeroed outside
the true interior, so downstream compaction can run on the padded flat
array directly and decode indices with the padded strides.

Reference analogue: SIFTExtrema.metal:62-110 + SIFTInterpolate.metal
:193-300 (/root/reference) — but dense, fused, and atomics-free.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _detect_kernel(
    dog_hbm,
    raw_ref,
    soft_ref,
    foi_ref,
    foj_ref,
    fos_ref,
    fval_ref,
    edge_ref,
    scratch,
    sem,
    *,
    n_scales: int,
    tile_h: int,
    w_pad: int,
    h_valid: int,
    w_valid: int,
    soft_threshold: float,
    edge_bound: float,
):
    t = pl.program_id(1)
    # The copy spans tile_h + 8 rows (not the tile_h + 2 the halo needs):
    # tile_h is a multiple of 8, so both the source offset and the copy
    # extent stay 8-sublane aligned — Mosaic rejects unaligned
    # memref_slices when it places the (small-octave) source in VMEM.
    dma = pltpu.make_async_copy(
        dog_hbm.at[pl.program_id(0), :, pl.ds(t * tile_h, tile_h + 8), :],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    # Validity of output rows/cols of this tile (border + padding zeroed:
    # center (s, r+1, c+1) needs r+1 <= H-2 and c+1 <= W-2).
    row0 = t * tile_h
    gr = row0 + jax.lax.broadcasted_iota(jnp.int32, (tile_h, w_pad), 0)
    gc = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w_pad), 1)
    inside = (gr <= h_valid - 3) & (gc <= w_valid - 3)

    n_rows = tile_h + 8

    # Hoist the row-rolled slabs: slab[s][di] = dog rows shifted so that
    # slab[r] = dog[s, row0 + r + 1 + di]. Rolls keep every slice
    # 8-sublane aligned (an offset-1 static slice would force a Mosaic
    # relayout); wrap garbage lands in rows >= tile_h and is never read.
    def row_slab(s, di):
        y = scratch[s, :, :]
        return pltpu.roll(y, (n_rows - (1 + di)) % n_rows, 0)[:tile_h, :]

    def col(plane, dj):
        return pltpu.roll(plane, (w_pad - dj) % w_pad, 1)

    slabs = {}

    def nb(s, ds, di, dj):
        """Plane of dog[s+ds, (r+1)+di, (c+1)+dj] over tile rows r, cols c.

        Column wrap garbage lands in cols >= w_valid-2, which are masked
        out of every consumer."""
        key = (s + ds, di)
        if key not in slabs:
            slabs[key] = row_slab(s + ds, di)
        return col(slabs[key], dj + 1)

    for s in range(1, n_scales + 1):
        c = nb(s, 0, 0, 0)

        # -- strict 26-neighbour extrema + soft threshold ---------------
        lo = None
        hi = None
        for ds in (-1, 0, 1):
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    if ds == 0 and di == 0 and dj == 0:
                        continue
                    v = nb(s, ds, di, dj)
                    lo = v if lo is None else jnp.minimum(lo, v)
                    hi = v if hi is None else jnp.maximum(hi, v)
        raw = ((c > hi) | (c < lo)) & inside
        raw_ref[0, s - 1, :, :] = raw.astype(jnp.int8)
        soft = raw & (jnp.abs(c) > soft_threshold)
        soft_ref[0, s - 1, :, :] = soft.astype(jnp.int8)

        # -- dense Taylor step (same formulas as dense_taylor_fields) ---
        gi = 0.5 * (nb(s, 0, 1, 0) - nb(s, 0, -1, 0))
        gj = 0.5 * (nb(s, 0, 0, 1) - nb(s, 0, 0, -1))
        gs = 0.5 * (nb(s, 1, 0, 0) - nb(s, -1, 0, 0))

        hii = nb(s, 0, 1, 0) + nb(s, 0, -1, 0) - 2.0 * c
        hjj = nb(s, 0, 0, 1) + nb(s, 0, 0, -1) - 2.0 * c
        hss = nb(s, 1, 0, 0) + nb(s, -1, 0, 0) - 2.0 * c
        hij = 0.25 * (
            nb(s, 0, 1, 1) - nb(s, 0, 1, -1)
            - nb(s, 0, -1, 1) + nb(s, 0, -1, -1)
        )
        his = 0.25 * (
            nb(s, 1, 1, 0) - nb(s, 1, -1, 0)
            - nb(s, -1, 1, 0) + nb(s, -1, -1, 0)
        )
        hjs = 0.25 * (
            nb(s, 1, 0, 1) - nb(s, 1, 0, -1)
            - nb(s, -1, 0, 1) + nb(s, -1, 0, -1)
        )

        det = (
            hii * (hjj * hss - hjs * hjs)
            - hij * (hij * hss - hjs * his)
            + his * (hij * hjs - hjj * his)
        )
        aa = (hjj * hss - hjs * hjs) / det
        ab = (his * hjs - hij * hss) / det
        ac = (hij * hjs - his * hjj) / det
        bb = (hii * hss - his * his) / det
        bc = (his * hij - hii * hjs) / det
        cc = (hii * hjj - hij * hij) / det

        ofst_i = -(aa * gi + ab * gj + ac * gs)
        ofst_j = -(ab * gi + bb * gj + bc * gs)
        ofst_s = -(ac * gi + bc * gj + cc * gs)
        foi_ref[0, s - 1, :, :] = ofst_i
        foj_ref[0, s - 1, :, :] = ofst_j
        fos_ref[0, s - 1, :, :] = ofst_s
        fval_ref[0, s - 1, :, :] = c + 0.5 * (
            gi * ofst_i + gj * ofst_j + gs * ofst_s
        )

        # -- IPOL edge-response acceptance (dense_edge_ok) ---------------
        edge_resp = (hii + hjj) ** 2 / (hii * hjj - hij * hij)
        edge_ref[0, s - 1, :, :] = (
            jnp.abs(edge_resp) <= edge_bound
        ).astype(jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=("soft_threshold", "edge_threshold", "tile_h",
                     "interpret"),
)
def detect_fields_pallas(
    dog: jnp.ndarray,
    soft_threshold: float,
    edge_threshold: float,
    tile_h: int = 128,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[B, S, H, W] DoG -> (raw extrema mask, soft mask [B, S-2, Ht, Wp]
    bool, fields [B, S-2, Ht, Wp, 4] f32, edge_ok [B, S-2, Ht, Wp] bool)
    where Ht = ceil((H-2)/tile_h)*tile_h and Wp = 128-aligned W.

    Plane (s, r, c) describes DoG center (s+1, r+1, c+1); entries outside
    the true interior have a FALSE soft mask (fields/edge there are
    garbage and must only be read where a walk can land — the interior)."""
    b, s_dim, h, w = dog.shape
    n_scales = s_dim - 2
    n_tiles = pl.cdiv(h - 2, tile_h)
    ht = n_tiles * tile_h
    wp = (w + 127) // 128 * 128

    x = jnp.pad(dog, ((0, 0), (0, 0), (0, ht + 8 - h), (0, wp - w)))

    r = edge_threshold
    edge_bound = (r + 1.0) ** 2 / r

    grid = (b, n_tiles)
    plane = lambda dt: pl.BlockSpec(
        (1, n_scales, tile_h, wp),
        lambda bb, t: (bb, 0, t, 0),
        memory_space=pltpu.VMEM,
    )
    pshape = lambda dt: jax.ShapeDtypeStruct((b, n_scales, ht, wp), dt)

    raw, soft, foi, foj, fos, fval, edge = pl.pallas_call(
        functools.partial(
            _detect_kernel,
            n_scales=n_scales,
            tile_h=tile_h,
            w_pad=wp,
            h_valid=h,
            w_valid=w,
            soft_threshold=soft_threshold,
            edge_bound=edge_bound,
        ),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=tuple(
            plane(dt)
            for dt in (jnp.int8, jnp.int8, jnp.float32, jnp.float32,
                       jnp.float32, jnp.float32, jnp.int8)
        ),
        out_shape=tuple(
            pshape(dt)
            for dt in (jnp.int8, jnp.int8, jnp.float32, jnp.float32,
                       jnp.float32, jnp.float32, jnp.int8)
        ),
        scratch_shapes=[
            pltpu.VMEM((s_dim, tile_h + 8, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x)

    fields = jnp.stack([foi, foj, fos, fval], axis=-1)
    return raw.astype(bool), soft.astype(bool), fields, edge.astype(bool)
