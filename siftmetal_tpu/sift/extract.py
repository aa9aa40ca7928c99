"""Public SIFT extraction facade: one jitted program, image in -> padded
keypoint + descriptor arrays out.

TPU-native replacement for the reference's ``SIFT`` class
(/root/reference Sources/SIFTMetal/SIFT/SIFT.swift:55-239). Where the
reference sequences seven GPU command buffers with CPU round-trips between
detection, interpolation, orientation and description (boundaries at
SIFT.swift:171-172, SIFTOctave.swift:252-253, :359-360, :464-465), here the
ENTIRE pipeline — pyramid, detection, refinement, orientation, descriptors,
compaction — is one XLA program; the host only ever sees the final padded
arrays (SURVEY.md §7 design table).

Shapes are static per (height, width, config): construct a ``SIFT`` object
once per resolution (the analogue of the reference pre-allocating every
texture in ``SIFT.init``, SIFT.swift:112-137) and reuse it across frames.
Batching over frames is ``jax.vmap`` — the reference is strictly
one-image-at-a-time (SIFT.swift:147).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import DEFAULT_CONFIG, SiftConfig
from ..ops.image import rgb_to_gray
from .pyramid import build_pyramid
from . import detect as _detect
from . import describe as _describe
from .detect import Keypoints


class Descriptors(NamedTuple):
    """Global padded descriptor set (SoA pytree): the reference's
    ``[SIFTDescriptor]`` (Sources/SIFTMetal/SIFT/SIFTDescriptor.swift:12)
    as arrays. ``features`` is uint8 in [0, 255], IPOL quantization."""

    valid: jnp.ndarray     # [N] bool
    octave: jnp.ndarray    # [N] int32
    x: jnp.ndarray         # [N] f32 — row, input-image units
    y: jnp.ndarray         # [N] f32 — col, input-image units
    sigma: jnp.ndarray     # [N] f32
    theta: jnp.ndarray     # [N] f32 — reference orientation, (-pi, pi]
    features: jnp.ndarray  # [N, 128] uint8

    @property
    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))


def extract_gray(
    gray: jnp.ndarray,
    config: SiftConfig,
    n_octaves: int,
) -> Tuple[Keypoints, Descriptors, Dict[str, jnp.ndarray]]:
    """Full SIFT on a [H, W] grayscale image. Pure and jittable
    (``config``/``n_octaves`` must be static)."""
    # named_scope labels mirror the reference's os_signpost phase names
    # (Performance.measure call sites at SIFT.swift:155-226) in XProf traces.
    with jax.named_scope("sift_pyramid"):
        gaussians, dogs = build_pyramid(gray, config, n_octaves)
    with jax.named_scope("sift_detect"):
        per_octave, counters = _detect.detect(dogs, config)

    use_pallas = _describe._use_pallas(config)
    kp_list, desc_rows = [], []
    lane_overflow = jnp.int32(0)
    for o in range(n_octaves):
        h, w = dogs[o].shape[1], dogs[o].shape[2]
        budget = _detect.keypoint_budget(config, (h, w), o)
        kpc, kp_dropped = _detect.compact_octave_keypoints(
            per_octave[o], o, config, budget
        )
        lane_overflow = lane_overflow + kp_dropped
        # Gradient fields are padded once per octave and shared by the
        # orientation and descriptor kernels (descriptor geometry covers
        # both patch sizes).
        if use_pallas:
            from ..ops.pallas.patches import prepare_patch_fields

            fields = prepare_patch_fields(gaussians[o], config)
        else:
            fields = None

        if use_pallas and config.use_fused_describe:
            from ..ops.pallas.patches import orient_desc_lanes_pallas

            with jax.named_scope(f"sift_orient_desc_o{o}"):
                raw, theta_l, ov = orient_desc_lanes_pallas(
                    fields, kpc.scale, kpc.x_oct, kpc.y_oct,
                    kpc.sigma_oct, config, valid=kpc.valid,
                )
            m = config.max_orientations_per_keypoint
            ori_valid = ov & kpc.valid[:, None]
            n_lanes = budget * m
            feats = _describe.quantize_descriptors(raw, config).reshape(
                n_lanes, -1
            )
            rep4 = lambda a: jnp.repeat(a, m)
            desc_rows.append(
                dict(
                    valid=ori_valid.reshape(-1),
                    octave=jnp.full((n_lanes,), o, dtype=jnp.int32),
                    x=rep4(kpc.x),
                    y=rep4(kpc.y),
                    sigma=rep4(kpc.sigma),
                    theta=theta_l.reshape(-1),
                    features=feats,
                )
            )
            kp_list.append(per_octave[o])
            continue

        with jax.named_scope(f"sift_orientation_o{o}"):
            ori = _describe.orientations_octave(
                gaussians[o], kpc, config, fields=fields
            )

        # Compact (keypoint, orientation) lanes BEFORE the descriptor stage:
        # most of the [K, MAX_ORI] grid is invalid (typical orientation
        # multiplicity is ~1.2), so computing descriptors on compacted lanes
        # cuts the heaviest stage's work ~2.5x. Budget: 1.5 lanes/keypoint
        # slot, overflow reported in the counters.
        m = ori.theta.shape[1]
        lane_valid = (ori.valid & kpc.valid[:, None]).reshape(-1)
        n_lanes = (budget * 3 // 2 + 127) // 128 * 128
        order, count, dropped = _detect.compact_indices(lane_valid, n_lanes)
        slot_valid = jnp.arange(n_lanes) < count
        lane_overflow = lane_overflow + dropped

        rep = lambda a: jnp.repeat(a, m)[order]
        with jax.named_scope(f"sift_descriptors_o{o}"):
            feats = _describe.descriptor_lanes(
                gaussians[o],
                rep(kpc.scale),
                rep(kpc.x_oct),
                rep(kpc.y_oct),
                rep(kpc.sigma_oct),
                ori.theta.reshape(-1)[order],
                config,
                fields=fields,
                valid=slot_valid,
            )
        desc_rows.append(
            dict(
                valid=slot_valid,
                octave=jnp.full((n_lanes,), o, dtype=jnp.int32),
                x=rep(kpc.x),
                y=rep(kpc.y),
                sigma=rep(kpc.sigma),
                theta=ori.theta.reshape(-1)[order],
                features=feats,
            )
        )
        kp_list.append(per_octave[o])

    keypoints, kp_dropped_global = _detect.gather_keypoints(kp_list, config)

    n = config.max_descriptors
    valid = jnp.concatenate([r["valid"] for r in desc_rows])
    order, count, desc_dropped = _detect.compact_indices(valid, n)

    def take(field):
        return jnp.concatenate([r[field] for r in desc_rows])[order]

    descriptors = Descriptors(
        valid=jnp.arange(n) < count,
        octave=take("octave"),
        x=take("x"),
        y=take("y"),
        sigma=take("sigma"),
        theta=take("theta"),
        features=take("features"),
    )
    counters["n_descriptors"] = count
    # Every place a descriptor lane can be lost to a static budget is
    # counted here: per-octave keypoint/lane compaction (lane_overflow) and
    # the global max_descriptors compaction (desc_dropped). The global
    # keypoint-set compaction is reported separately.
    counters["descriptor_overflow"] = desc_dropped + lane_overflow
    counters["keypoint_overflow"] = kp_dropped_global
    return keypoints, descriptors, counters


def extract(
    image: jnp.ndarray,
    config: SiftConfig,
    n_octaves: int,
) -> Tuple[Keypoints, Descriptors, Dict[str, jnp.ndarray]]:
    """Like :func:`extract_gray` but accepts [H, W, 3|4] gamma-space RGB."""
    return extract_gray(rgb_to_gray(image), config, n_octaves)


class SIFT:
    """Per-resolution compiled SIFT extractor (facade).

    The object holds jitted programs for one (H, W); mirrors the
    reference's ``SIFT(device:configuration:)`` pre-allocation contract
    (SIFT.swift:112). Methods accept numpy or jax arrays.

    Example:
        sift = SIFT(480, 640)
        kps, descs, counters = sift.extract(frame)         # one [H,W] frame
        kb, db, cb = sift.extract_batch(frames)            # [B,H,W] batch
    """

    def __init__(
        self,
        height: int,
        width: int,
        config: SiftConfig = DEFAULT_CONFIG,
        n_octaves: Optional[int] = None,
    ):
        self.config = config
        self.height = height
        self.width = width
        self.n_octaves = (
            n_octaves
            if n_octaves is not None
            else config.num_octaves(height, width)
        )
        self._extract = jax.jit(
            lambda g: extract_gray(g, self.config, self.n_octaves)
        )
        # Genuinely batched: vmapped XLA stages + frame-flattened Pallas
        # patch kernels (sift/batched.py) — per-frame cost DROPS with
        # batch, unlike the r1 lax.map which ran frames sequentially.
        from .batched import extract_gray_batch

        self._extract_batch = jax.jit(
            lambda gs: extract_gray_batch(gs, self.config, self.n_octaves)
        )

    def extract(self, image):
        """[H, W] gray or [H, W, C] RGB -> (Keypoints, Descriptors, counters)."""
        image = jnp.asarray(image)
        if image.ndim == 3:
            image = rgb_to_gray(image)
        return self._extract(image)

    def extract_batch(self, images):
        """[B, H, W] gray or [B, H, W, C] RGB -> batched results."""
        images = jnp.asarray(images)
        if images.ndim == 4:
            images = rgb_to_gray(images)
        return self._extract_batch(images)
