"""Batched (multi-frame) SIFT extraction: ONE XLA program over [B, H, W].

Round-1 batching used ``lax.map`` over frames — sequential, so per-frame
cost was flat with batch (VERDICT r1 #3). This module batches every stage
for real:

  * pyramid + detection + compaction are pure jnp -> ``vmap`` over frames
    (the small octaves and fixed per-op overheads amortize across the
    batch);
  * the Pallas patch kernels take ALL frames' lanes in one call: gradient
    fields of the whole batch are concatenated along the row axis and each
    lane carries its frame index (ops/pallas/patches.py), so the DMA
    pipeline stays full across frame boundaries and per-lane validity
    skip applies across the whole batch.

Per-frame counters come back with a leading [B] axis. Output equality
with the single-frame path is asserted by tests/test_parallel.py.

Reference: the Swift implementation is strictly one-image-at-a-time
(/root/reference Sources/SIFTMetal/SIFT/SIFT.swift:147); batch is the
natural TPU data-parallel axis (SURVEY.md §2c, §7).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import SiftConfig
from ..ops.pallas import pyramid as _oneshot
from . import pyramid as _pyramid
from .pyramid import seed_image
from ..ops.image import decimate_2x
from . import detect as _detect
from . import describe as _describe
from .detect import Keypoints
from .extract import Descriptors


def build_pyramid_batch(
    gray: jnp.ndarray, config: SiftConfig, n_octaves: int
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """[B, H, W] -> per-octave ([B, S, h, w] gaussians, [B, S-1, h, w]
    DoGs). Same math as pyramid.build_pyramid (all ops are leading-axis
    polymorphic); scale stacks sit on axis 1."""
    h, w = gray.shape[-2], gray.shape[-1]
    shapes = config.octave_shapes(h, w, n_octaves)
    gaussians: List[jnp.ndarray] = []
    dogs: List[jnp.ndarray] = []
    bf16 = config.pyramid_dtype == "bfloat16"
    # bf16 fast mode mirrors pyramid.cascade_slices: the blur chain reads
    # bf16, every emitted slice is the fp32 accumulator (quantized
    # Gaussians plateau the DoG and break the strict extrema test).
    if bf16:
        gray = gray.astype(jnp.bfloat16)
    # Batched route for the fused cascade+DoG Pallas kernel: vmap of
    # pallas_call does not batch on TPU, so frames go through lax.map
    # (serial per-frame kernel launches; the kernel itself tiles rows).
    use_cascade = (
        config.use_pallas_pyramid
        and not bf16
        and jax.default_backend() == "tpu"
    )
    # bf16 fast mode included: the kernels read a natively-bf16 chain
    # (the input is exact in the matmuls' hi operand) and emit the fp32
    # accumulator — the same read-bf16/emit-fp32 contract as the XLA
    # fast-mode path.
    use_oneshot = (
        config.use_oneshot_pyramid and jax.default_backend() == "tpu"
    )
    # Octave 0 via the fused seed kernel: the upsample+blur seed stage
    # folds into the slice matrices and the kernel reads the raw
    # grayscale directly (ops/pallas/pyramid.seed_octave_pallas).
    seed_fused = use_oneshot and _oneshot.seed_supports(
        config, gray.shape[-2], gray.shape[-1]
    )
    first = (
        None
        if seed_fused
        else seed_image(gray, config, out_dtype=jnp.float32)
    )
    for o in range(n_octaves):
        if o > 0:
            prev = gaussians[o - 1][:, config.n_scales_per_octave]
            if bf16:
                prev = prev.astype(jnp.bfloat16)
            first = decimate_2x(prev, shapes[o])
        if o == 0 and seed_fused:
            stack, dog = _oneshot.seed_octave_pallas(gray, config)
        elif use_oneshot and _oneshot.supports(config, shapes[o][0]):
            stack, dog = _oneshot.octave_oneshot_pallas(
                first.astype(jnp.bfloat16) if bf16 else first, config
            )
        elif use_cascade and shapes[o][0] >= 256:
            from ..ops.pallas.cascade import octave_cascade_pallas

            stack, dog = jax.lax.map(
                lambda f: octave_cascade_pallas(f, config), first
            )
        else:
            slices = _pyramid.cascade_slices(first, o, config)
            stack = jnp.stack(slices, axis=1)
            dog = stack[:, 1:] - stack[:, :-1]
        gaussians.append(stack)
        dogs.append(dog)
    return gaussians, dogs


def extract_gray_batch(
    grays: jnp.ndarray,
    config: SiftConfig,
    n_octaves: int,
    _profile_stop: Optional[str] = None,
) -> Tuple[Keypoints, Descriptors, Dict[str, jnp.ndarray]]:
    """Full SIFT on a [B, H, W] grayscale batch. Returns batched pytrees
    (leading [B] on every array) and per-frame counters.

    ``_profile_stop`` is a benchmarking hook (benchmarks/stage_bench.py):
    "pyramid" | "detect" | "compact" | "orient" truncate the pipeline
    after that stage and return a scalar that depends on every value the
    prefix computed (so XLA cannot dead-code-eliminate the stage under
    test). Production callers leave it None."""
    b = grays.shape[0]
    use_pallas = _describe._use_pallas(config)

    with jax.named_scope("sift_pyramid"):
        gaussians, dogs = build_pyramid_batch(grays, config, n_octaves)
    if _profile_stop == "pyramid":
        return sum(jnp.sum(d) for d in dogs)

    with jax.named_scope("sift_detect"):
        per_octave, counters = _detect.detect_all_octaves_batch(
            dogs, config
        )
        counters = dict(counters)
    if _profile_stop == "detect":
        return sum(
            jnp.sum(jnp.where(kp.valid, kp.x + kp.y + kp.sigma, 0.0))
            for kp in per_octave
        ) + jnp.sum(counters["n_border"])

    profile_acc = jnp.float32(0)
    kp_list, desc_rows = [], []
    lane_overflow = jnp.zeros((b,), jnp.int32)
    # Phase A: per-octave keypoint compaction + RAW orientation
    # histograms. Smoothing + peak detection then run ONCE over every
    # octave's lanes concatenated (phase A/B split) — they are lane-wise
    # ops, and running them per octave paid 6x the fixed per-op
    # dispatch cost.
    stage = []   # (octave, budget, kpc, fields, hist)
    for o in range(n_octaves):
        h, w = dogs[o].shape[-2], dogs[o].shape[-1]
        budget = _detect.keypoint_budget(config, (h, w), o)
        kpc, kp_dropped = jax.vmap(
            lambda kp, o=o, budget=budget: _detect.compact_octave_keypoints(
                kp, o, config, budget
            )
        )(per_octave[o])
        lane_overflow = lane_overflow + kp_dropped
        if _profile_stop == "compact":
            profile_acc = profile_acc + jnp.sum(
                jnp.where(kpc.valid, kpc.x_oct + kpc.sigma_oct, 0.0)
            ) + jnp.sum(kp_dropped).astype(jnp.float32)
            continue

        if use_pallas and config.use_fused_describe:
            from ..ops.pallas.patches import (
                orient_desc_lanes_pallas,
                prepare_patch_fields,
            )

            fields = prepare_patch_fields(gaussians[o], config)
            frame_kp = jnp.repeat(jnp.arange(b, dtype=jnp.int32), budget)
            flat = lambda a: a.reshape(b * budget)
            with jax.named_scope(f"sift_orient_desc_o{o}"):
                raw, theta_l, ov = orient_desc_lanes_pallas(
                    fields,
                    flat(kpc.scale),
                    flat(kpc.x_oct),
                    flat(kpc.y_oct),
                    flat(kpc.sigma_oct),
                    config,
                    valid=flat(kpc.valid),
                    frame=frame_kp,
                )
            m = config.max_orientations_per_keypoint
            theta = theta_l.reshape(b, budget, m)
            ori_valid = ov.reshape(b, budget, m) & kpc.valid[:, :, None]
            if _profile_stop == "orient":
                profile_acc = profile_acc + jnp.sum(
                    jnp.where(ori_valid, theta, 0.0)
                )
                continue
            n_lanes = budget * m
            feats = _describe.quantize_descriptors(raw, config).reshape(
                b, n_lanes, -1
            )
            rep4 = lambda a: jnp.repeat(a, m, axis=1)
            desc_rows.append(
                dict(
                    valid=ori_valid.reshape(b, n_lanes),
                    octave=jnp.full((b, n_lanes), o, dtype=jnp.int32),
                    x=rep4(kpc.x),
                    y=rep4(kpc.y),
                    sigma=rep4(kpc.sigma),
                    theta=theta.reshape(b, n_lanes),
                    features=feats,
                )
            )
            kp_list.append(per_octave[o])
            continue

        if use_pallas:
            from ..ops.pallas.patches import prepare_patch_fields

            fields = prepare_patch_fields(gaussians[o], config)
            frame_kp = jnp.repeat(jnp.arange(b, dtype=jnp.int32), budget)
            flat = lambda a: a.reshape(b * budget)
            with jax.named_scope(f"sift_orientation_o{o}"):
                from ..ops.pallas.patches import orientation_hist_lanes_pallas

                hist = orientation_hist_lanes_pallas(
                    fields,
                    flat(kpc.scale),
                    flat(kpc.x_oct),
                    flat(kpc.y_oct),
                    flat(kpc.sigma_oct),
                    config,
                    valid=flat(kpc.valid),
                    frame=frame_kp,
                ).reshape(b, budget, -1)
        else:
            fields = None
            with jax.named_scope(f"sift_orientation_o{o}"):
                hist = jax.vmap(
                    lambda g, kp: _describe.orientation_hists_xla(
                        g, kp.scale, kp.x_oct, kp.y_oct, kp.sigma_oct, config
                    )
                )(gaussians[o], kpc)
        stage.append((o, budget, kpc, fields, hist))

    if _profile_stop == "compact":
        return profile_acc

    # Fused smoothing + peak detection over every octave's lanes.
    if stage:
        hist_all = jnp.concatenate([s[4] for s in stage], axis=1)
        hist_all = _describe._smooth_circular(
            hist_all, config.orientation_smoothing_iterations
        )
        theta_all, ov_all = _describe.orientation_peaks(hist_all, config)

    # Phase B: per-octave lane compaction + descriptors.
    off = 0
    for o, budget, kpc, fields, _hist in stage:
        theta = lax.slice_in_dim(theta_all, off, off + budget, axis=1)
        ori_valid = lax.slice_in_dim(ov_all, off, off + budget, axis=1)
        off += budget
        ori_valid = ori_valid & kpc.valid[:, :, None]
        if _profile_stop == "orient":
            profile_acc = profile_acc + jnp.sum(
                jnp.where(ori_valid, theta, 0.0)
            )
            continue

        # Compact (keypoint, orientation) lanes per frame before the
        # descriptor stage (same budget math as the single-frame path).
        m = theta.shape[-1]
        lane_valid = ori_valid.reshape(b, budget * m)
        n_lanes = (budget * 3 // 2 + 127) // 128 * 128
        order, count, dropped = jax.vmap(
            lambda v: _detect.compact_indices(v, n_lanes)
        )(lane_valid)
        slot_valid = jnp.arange(n_lanes)[None, :] < count[:, None]
        lane_overflow = lane_overflow + dropped

        rep = lambda a: jnp.take_along_axis(
            jnp.repeat(a, m, axis=1), order, axis=1
        )
        theta_l = jnp.take_along_axis(
            theta.reshape(b, budget * m), order, axis=1
        )
        with jax.named_scope(f"sift_descriptors_o{o}"):
            if use_pallas:
                from ..ops.pallas.patches import descriptor_lanes_pallas

                frame_ln = jnp.repeat(
                    jnp.arange(b, dtype=jnp.int32), n_lanes
                )
                flatl = lambda a: a.reshape(b * n_lanes)
                raw = descriptor_lanes_pallas(
                    fields,
                    flatl(rep(kpc.scale)),
                    flatl(rep(kpc.x_oct)),
                    flatl(rep(kpc.y_oct)),
                    flatl(rep(kpc.sigma_oct)),
                    flatl(theta_l),
                    config,
                    valid=flatl(slot_valid),
                    frame=frame_ln,
                )
                feats = _describe.quantize_descriptors(raw, config).reshape(
                    b, n_lanes, -1
                )
            else:
                feats = jax.vmap(
                    lambda g, sc, x, y, sg, th: _describe.descriptor_lanes(
                        g, sc, x, y, sg, th, config
                    )
                )(
                    gaussians[o],
                    rep(kpc.scale),
                    rep(kpc.x_oct),
                    rep(kpc.y_oct),
                    rep(kpc.sigma_oct),
                    theta_l,
                )

        desc_rows.append(
            dict(
                valid=slot_valid,
                octave=jnp.full((b, n_lanes), o, dtype=jnp.int32),
                x=rep(kpc.x),
                y=rep(kpc.y),
                sigma=rep(kpc.sigma),
                theta=theta_l,
                features=feats,
            )
        )
        kp_list.append(per_octave[o])

    if _profile_stop in ("compact", "orient"):
        return profile_acc
    if _profile_stop == "describe":
        # Everything through the descriptor kernels, before the global
        # keypoint/descriptor compactions.
        return sum(
            jnp.sum(r["features"].astype(jnp.int32)) for r in desc_rows
        ) + sum(jnp.sum(r["valid"]) for r in desc_rows)

    keypoints, kp_dropped_global = jax.vmap(
        lambda *kps: _detect.gather_keypoints(kps, config)
    )(*kp_list)

    n = config.max_descriptors
    valid = jnp.concatenate([r["valid"] for r in desc_rows], axis=1)
    order, count, desc_dropped = jax.vmap(
        lambda v: _detect.compact_indices(v, n)
    )(valid)

    def take(field):
        cat = jnp.concatenate([r[field] for r in desc_rows], axis=1)
        if cat.ndim == 2:
            return jnp.take_along_axis(cat, order, axis=1)
        return jnp.take_along_axis(cat, order[:, :, None], axis=1)

    descriptors = Descriptors(
        valid=jnp.arange(n)[None, :] < count[:, None],
        octave=take("octave"),
        x=take("x"),
        y=take("y"),
        sigma=take("sigma"),
        theta=take("theta"),
        features=take("features"),
    )
    counters["n_descriptors"] = count
    counters["descriptor_overflow"] = desc_dropped + lane_overflow
    counters["keypoint_overflow"] = kp_dropped_global
    return keypoints, descriptors, counters
