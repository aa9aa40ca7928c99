"""Fused extrema detection Pallas kernel: mask + Taylor fields + edge test
+ IN-KERNEL candidate compaction.

Detection is the extraction pipeline's largest stage after batching. The
first fused kernel (round 2, commit d78c50f) computed the extrema mask,
dense Taylor fields and edge acceptance in one pass but still wrote the
dense bool masks to HBM and ran a 3.7M-element XLA compaction
(masked_nonzero, ~1.5 ms/frame) plus a [..., 4] field re-stack (~59 MB
re-layout) behind it. This version removes both:

  * Candidates are compacted INSIDE the kernel while the soft mask lives
    in VMEM: each (scale, row) emits the columns of its first
    ``slots`` soft extrema (rank arithmetic over a lane cumsum — the same
    scheme as sift/detect.py masked_nonzero, but on a VMEM-resident tile
    with zero HBM traffic for the mask). Real soft-extrema density is
    ~0.1% of samples; ``slots``/row is ~20x headroom, and overflow is
    COUNTED per tile (never silent, repo invariant).
  * The raw/soft extrema totals the IPOL stage counters need are per-tile
    scalars accumulated in SMEM — the dense masks are never materialized.
  * The four Taylor planes (ofst_i, ofst_j, ofst_s, value) stay SEPARATE
    [S-2, Ht, Wp] f32 arrays; the refinement walk gathers each plane
    directly and no dense restack happens.

The math is IDENTICAL to the XLA reference implementations
(sift/detect.py: extrema_mask, dense_taylor_fields, dense_edge_ok) —
those remain the numeric reference on non-TPU backends; interpret-mode
equivalence is asserted by tests/test_pallas.py.

Output layout: plane entry (s, r, c) describes DoG center
(s+1, r+1, c+1); planes are padded to (Ht, Wp) = (n_tiles * tile_h,
128-aligned width) and slot validity is FALSE outside the true interior.

Reference analogue: SIFTExtrema.metal:62-110 (threadgroup atomic-append
compaction) + SIFTInterpolate.metal:193-300 (/root/reference) — but
fused, dense-field, and atomics-free: the sequential TPU grid makes the
per-row slot compaction deterministic where the reference's atomic
append is run-order dependent.
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
    *refs,
    n_scales: int,
    tile_h: int,
    w_pad: int,
    h_valid: int,
    w_valid: int,
    soft_threshold: float,
    edge_bound: float,
    slots: int,
    emit_fields: bool,
):
    if emit_fields:
        (cand_ref, ok_ref, c_oi_ref, c_oj_ref, c_os_ref, c_val_ref,
         rawc_ref, softc_ref, dropc_ref, scratch_db, sem) = refs
    else:
        # Lean variant (see detect_candidates_pallas): only candidate
        # positions + counters leave the kernel; the tail re-derives the
        # Taylor step at the COMPACTED lanes from one 19-point DoG
        # gather, so the per-slot field harvesting (24 of 36 full-tile
        # masked reduces per scale — the kernel's dominant vector cost)
        # and the whole dense Taylor/edge computation disappear.
        (cand_ref, ok_ref, rawc_ref, softc_ref, dropc_ref,
         scratch_db, sem) = refs
    t = pl.program_id(1)
    bb = pl.program_id(0)
    n_tiles = pl.num_programs(1)
    n_b = pl.num_programs(0)
    # Double-buffered input DMA: tile (bb, t)'s slab was prefetched one
    # grid step ahead, so the copy overlaps the previous step's compute
    # (the serial start->wait stalled ~0.1 ms/frame at octave 0,
    # measured). The copy spans tile_h + 8 rows (not the tile_h + 2 the
    # halo needs): tile_h is a multiple of 8, so both the source offset
    # and the copy extent stay 8-sublane aligned — Mosaic rejects
    # unaligned memref_slices when it places the (small-octave) source
    # in VMEM.
    step = bb * n_tiles + t
    par = jax.lax.rem(step, 2)

    def slab_dmas(b_i, t_i, sl):
        # One copy PER SCALE PLANE: a single whole-slab copy streams at
        # only ~90 GB/s (descriptor-rate bound, measured r5 via the
        # stub-kernel probe — 0.31 ms/frame exposed at octave 0); the
        # per-scale copies run concurrently on separate semaphores and
        # restore aggregate DMA throughput.
        return [
            pltpu.make_async_copy(
                dog_hbm.at[b_i, s, pl.ds(t_i * tile_h, tile_h + 8), :],
                scratch_db.at[sl, s],
                sem.at[sl, s],
            )
            for s in range(n_scales + 2)
        ]

    @pl.when(step == 0)
    def _():
        for cp in slab_dmas(bb, t, par):
            cp.start()

    @pl.when(step + 1 < n_b * n_tiles)
    def _():
        last = t + 1 >= n_tiles
        b_n = jnp.where(last, bb + 1, bb)
        t_n = jnp.where(last, 0, t + 1)
        for cp in slab_dmas(b_n, t_n, 1 - par):
            cp.start()

    for cp in slab_dmas(bb, t, par):
        cp.wait()
    scratch = scratch_db.at[par]

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

    def slab_c(t, di):
        key = (t, di)
        if key not in slabs:
            slabs[key] = row_slab(t, di)
        return slabs[key]

    def nb(s, ds, di, dj):
        """Plane of dog[s+ds, (r+1)+di, (c+1)+dj] over tile rows r, cols c.

        Column wrap garbage lands in cols >= w_valid-2, which are masked
        out of every consumer."""
        return col(slab_c(s + ds, di), dj + 1)

    raw_total = jnp.zeros((1, 1), jnp.int32)
    soft_total = jnp.zeros((1, 1), jnp.int32)
    drop_total = jnp.zeros((1, 1), jnp.int32)

    # Separable 26-neighbour min/max, cached per scale plane: the naive
    # form is 26 rolls + 50 min/max per scale; row-folding each plane
    # once (row3) and col-folding the side scales once (nine, shared by
    # adjacent center scales) cuts that ~60%. max/min are associative,
    # so the result is bit-exact with the naive reduction.
    colr = lambda plane, dj: col(plane, dj + 1)  # nb()'s col alignment
    _row3 = {}

    def row3(t):
        if t not in _row3:
            a = slab_c(t, -1)
            b_ = slab_c(t, 0)
            d = slab_c(t, 1)
            _row3[t] = (
                jnp.maximum(jnp.maximum(a, b_), d),
                jnp.minimum(jnp.minimum(a, b_), d),
            )
        return _row3[t]

    _nine = {}

    def nine(t):
        """Full 3x3 max/min of scale plane t, col-aligned to centers."""
        if t not in _nine:
            mx, mn = row3(t)
            _nine[t] = (
                jnp.maximum(
                    jnp.maximum(colr(mx, -1), colr(mx, 0)), colr(mx, 1)
                ),
                jnp.minimum(
                    jnp.minimum(colr(mn, -1), colr(mn, 0)), colr(mn, 1)
                ),
            )
        return _nine[t]

    for s in range(1, n_scales + 1):
        c = nb(s, 0, 0, 0)

        # -- strict 26-neighbour extrema + soft threshold ---------------
        up9, un9 = nine(s - 1)
        dp9, dn9 = nine(s + 1)
        mx3, mn3 = row3(s)
        # In-plane 8-neighbourhood: side columns of the row-folded plane
        # plus the vertical pair (row +-1 of the center column).
        side_hi = jnp.maximum(colr(mx3, -1), colr(mx3, 1))
        side_lo = jnp.minimum(colr(mn3, -1), colr(mn3, 1))
        vert_hi = jnp.maximum(nb(s, 0, -1, 0), nb(s, 0, 1, 0))
        vert_lo = jnp.minimum(nb(s, 0, -1, 0), nb(s, 0, 1, 0))
        hi = jnp.maximum(jnp.maximum(up9, dp9), jnp.maximum(side_hi, vert_hi))
        lo = jnp.minimum(jnp.minimum(un9, dn9), jnp.minimum(side_lo, vert_lo))
        raw = ((c > hi) | (c < lo)) & inside
        soft = raw & (jnp.abs(c) > soft_threshold)

        raw_total = raw_total + jnp.sum(
            raw.astype(jnp.int32), keepdims=True
        ).reshape(1, 1)
        mi = soft.astype(jnp.int32)
        soft_total = soft_total + jnp.sum(mi, keepdims=True).reshape(1, 1)

        # -- dense Taylor step (same formulas as dense_taylor_fields) ---
        # Skipped entirely in the lean (emit_fields=False) variant: the
        # tail derives these at the compacted lanes from a 19-point DoG
        # gather (sift/detect.py _taylor_from_stencil).
        if emit_fields:
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
            # ONE reciprocal instead of six divides (divides are
            # multi-pass on the VPU). Within the interpret-equivalence
            # rtol vs the XLA reference's per-cofactor divides.
            inv_det = 1.0 / det
            aa = (hjj * hss - hjs * hjs) * inv_det
            ab = (his * hjs - hij * hss) * inv_det
            ac = (hij * hjs - his * hjj) * inv_det
            bb = (hii * hss - his * his) * inv_det
            bc2 = (his * hij - hii * hjs) * inv_det
            cc = (hii * hjj - hij * hij) * inv_det

            ofst_i = -(aa * gi + ab * gj + ac * gs)
            ofst_j = -(ab * gi + bb * gj + bc2 * gs)
            ofst_s = -(ac * gi + bc2 * gj + cc * gs)
            fval_keep = c + 0.5 * (
                gi * ofst_i + gj * ofst_j + gs * ofst_s
            )
            # The dense Taylor/edge planes are NOT stored: the
            # iteration-1 values every candidate needs are harvested at
            # the compacted slots below, and the few candidates that
            # MOVE (~150/frame) re-derive their Taylor step from
            # 19-point DoG gathers in the XLA tail — dropping the packed
            # [S-2, 4, Ht, Wp] + edge plane stores cut 13 full-tile
            # stores per scale and ~63 MB/frame of HBM write traffic at
            # octave 0.

            # -- IPOL edge-response acceptance (dense_edge_ok) ----------
            edge_resp = (hii + hjj) ** 2 / (hii * hjj - hij * hij)
            edge_ok = jnp.abs(edge_resp) <= edge_bound

        # -- in-VMEM per-row candidate compaction -----------------------
        # Rank every soft extremum within its row (lane prefix sum; no
        # Mosaic cumsum -> log-shift with wraparound masked by lane
        # index). Slot k's column is found with one masked row-reduce,
        # and the SAME one-hot row harvests the Taylor offsets, value
        # and edge flag at that candidate — iteration 1 of the
        # refinement walk then needs NO dense-plane gather at all.
        # Overflow past ``slots`` per row is counted, never silent.
        csum = mi
        shift = 1
        while shift < w_pad:
            csum = csum + jnp.where(
                gc >= shift, pltpu.roll(csum, shift, 1), 0
            )
            shift *= 2
        bc = csum[:, w_pad - 1 : w_pad]  # [tile_h, 1] per-row count
        # Column index and edge flag share ONE pick: bit 13 of the
        # harvested word is the edge acceptance (w_pad < 8192 always —
        # checked by the wrapper), unpacked by the caller. The lean
        # variant packs no edge bit (the tail recomputes it).
        if emit_fields:
            colpk = gc | jnp.where(edge_ok, 1 << 13, 0)
        else:
            colpk = gc
        cols, vois, vojs, voss, vvals = [], [], [], [], []
        n_blocks = w_pad // 128
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (tile_h, 128), 1)
        for sl in range(slots):
            hit = soft & (csum == sl + 1)           # one-hot row (or empty)
            colw = jnp.max(jnp.where(hit, colpk, 0), axis=1, keepdims=True)
            cols.append(colw)
            if emit_fields:
                # Two-level (fold -> narrow pick) field harvest: the old
                # form ran FOUR full-width [tile_h, w_pad] masked reduces
                # per slot (24 per scale — the kernel's dominant vector
                # cost, ROADMAP lever #3). The candidate's column is
                # already known from the col pick, so select the ONE
                # 128-lane block containing it (n_blocks cheap selects on
                # [tile_h, 128]) and run the one-hot pick at 1/n_blocks
                # of the width. Bit-exact with the full-width pick: the
                # fold is pure data movement and the final one-hot sum
                # touches the same single element.
                slot_live = bc > sl                          # [tile_h, 1]
                c_raw = colw & ((1 << 13) - 1)
                blk = c_raw >> 7                             # block index
                lane_hit = (lane128 == (c_raw & 127)) & slot_live

                def fold_pick(plane, blk=blk, lane_hit=lane_hit):
                    folded = plane[:, :128]
                    for bq in range(1, n_blocks):
                        folded = jnp.where(
                            blk == bq,
                            plane[:, bq * 128:(bq + 1) * 128],
                            folded,
                        )
                    return jnp.sum(
                        jnp.where(lane_hit, folded, 0.0),
                        axis=1, keepdims=True,
                    )

                vois.append(fold_pick(ofst_i))
                vojs.append(fold_pick(ofst_j))
                voss.append(fold_pick(ofst_s))
                vvals.append(fold_pick(fval_keep))
        cand_ref[0, s - 1] = jnp.concatenate(cols, axis=1)
        if emit_fields:
            c_oi_ref[0, s - 1] = jnp.concatenate(vois, axis=1)
            c_oj_ref[0, s - 1] = jnp.concatenate(vojs, axis=1)
            c_os_ref[0, s - 1] = jnp.concatenate(voss, axis=1)
            c_val_ref[0, s - 1] = jnp.concatenate(vvals, axis=1)
        ok_ref[0, s - 1] = (
            bc > jax.lax.broadcasted_iota(jnp.int32, (tile_h, slots), 1)
        ).astype(jnp.int8)
        drop_total = drop_total + jnp.sum(
            jnp.maximum(bc - slots, 0), keepdims=True
        ).reshape(1, 1)

    rawc_ref[0, 0, 0, 0] = raw_total[0, 0]
    softc_ref[0, 0, 0, 0] = soft_total[0, 0]
    dropc_ref[0, 0, 0, 0] = drop_total[0, 0]


@functools.partial(
    jax.jit,
    static_argnames=("soft_threshold", "edge_threshold", "tile_h", "slots",
                     "interpret", "emit_fields"),
)
def detect_candidates_pallas(
    dog: jnp.ndarray,
    soft_threshold: float,
    edge_threshold: float,
    tile_h: int = 128,
    slots: int = 6,
    interpret: bool = False,
    emit_fields: bool = True,
) -> Tuple[jnp.ndarray, ...]:
    """[B, S, H, W] DoG -> fused detection with in-kernel compaction.

    Returns ``(cand_col, slot_ok, cand_fields, cand_edge, n_raw,
    n_soft, n_row_dropped)`` where

      * ``cand_col`` [B, S-2, Ht, slots] i32 — column index c (plane
        coords) of the (slot+1)-th soft extremum of each (scale, row);
      * ``slot_ok`` [B, S-2, Ht, slots] bool — slot validity;
      * ``cand_fields`` — tuple of four [B, S-2, Ht, slots] f32 arrays:
        the Taylor step (ofst_i, ofst_j, ofst_s, value) AT each
        compacted candidate — iteration 1 of the refinement walk reads
        these with no gather at all;
      * ``cand_edge`` [B, S-2, Ht, slots] bool — edge acceptance at each
        candidate (valid for walks that never move);
      * ``n_raw`` / ``n_soft`` [B] i32 — raw/soft extrema totals;
      * ``n_row_dropped`` [B] i32 — soft extrema lost to per-row slot
        overflow (counted, never silent).

    No dense planes are emitted: candidates that MOVE during the
    refinement walk re-derive their Taylor step / edge test from
    19-point DoG gathers in the tail (movers are ~0.3%% of slot lanes;
    the dense [S-2, 4, Ht, Wp] plane stores this replaces were 13
    full-tile stores per scale and ~63 MB/frame of HBM writes).

    ``emit_fields=False`` selects the LEAN variant: the kernel returns
    only ``(cand_col, slot_ok, n_raw, n_soft, n_row_dropped)`` — no
    Taylor fields, no edge bit. The tail then derives iteration-1
    Taylor/edge for ALL (compacted) candidates from one 19-point DoG
    gather (sift/detect.py _tail_all_octaves with lean kernel outputs).
    This removes the kernel's per-slot field harvesting — 24 of its 36
    full-tile masked reduces per scale, its dominant vector cost — plus
    the whole dense Taylor/edge computation.
    """
    b, s_dim, h, w = dog.shape
    n_scales = s_dim - 2
    n_tiles = pl.cdiv(h - 2, tile_h)
    ht = n_tiles * tile_h
    wp = (w + 127) // 128 * 128
    if wp >= (1 << 13):
        raise ValueError(
            f"image width {w} overflows the 13-bit packed column word"
        )

    x = jnp.pad(dog, ((0, 0), (0, 0), (0, ht + 8 - h), (0, wp - w)))

    r = edge_threshold
    edge_bound = (r + 1.0) ** 2 / r

    grid = (b, n_tiles)
    plane = lambda lanes: pl.BlockSpec(
        (1, n_scales, tile_h, lanes),
        lambda bb, t: (bb, 0, t, 0),
        memory_space=pltpu.VMEM,
    )
    pshape = lambda dt, lanes: jax.ShapeDtypeStruct(
        (b, n_scales, ht, lanes), dt
    )
    # SMEM blocks need their last two dims equal to the array's; a
    # trailing (1, 1) satisfies that for per-(frame, tile) scalars.
    scalar_spec = pl.BlockSpec(
        (1, 1, 1, 1), lambda bb, t: (bb, t, 0, 0), memory_space=pltpu.SMEM
    )
    scalar_shape = jax.ShapeDtypeStruct((b, n_tiles, 1, 1), jnp.int32)

    n_field_planes = 4 if emit_fields else 0
    out_specs = (
        (plane(slots), plane(slots))
        + (plane(slots),) * n_field_planes
        + (scalar_spec, scalar_spec, scalar_spec)
    )
    out_shape = (
        (pshape(jnp.int32, slots), pshape(jnp.int8, slots))
        + (pshape(jnp.float32, slots),) * n_field_planes
        + (scalar_shape, scalar_shape, scalar_shape)
    )
    outs = pl.pallas_call(
        functools.partial(
            _detect_kernel,
            n_scales=n_scales,
            tile_h=tile_h,
            w_pad=wp,
            h_valid=h,
            w_valid=w,
            soft_threshold=soft_threshold,
            edge_bound=edge_bound,
            slots=slots,
            emit_fields=emit_fields,
        ),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, s_dim, tile_h + 8, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, s_dim)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x)

    if emit_fields:
        cand, ok, c_oi, c_oj, c_os, c_val, rawc, softc, dropc = outs
        return (
            cand & ((1 << 13) - 1),
            ok.astype(bool),
            (c_oi, c_oj, c_os, c_val),
            (cand >> 13).astype(bool),
            jnp.sum(rawc, axis=(1, 2, 3)),
            jnp.sum(softc, axis=(1, 2, 3)),
            jnp.sum(dropc, axis=(1, 2, 3)),
        )
    cand, ok, rawc, softc, dropc = outs
    return (
        cand,
        ok.astype(bool),
        jnp.sum(rawc, axis=(1, 2, 3)),
        jnp.sum(softc, axis=(1, 2, 3)),
        jnp.sum(dropc, axis=(1, 2, 3)),
    )
