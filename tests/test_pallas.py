"""Pallas kernels vs their XLA reference implementations (interpret mode —
the compiled path is exercised on real TPU by bench.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from siftmetal_tpu.ops.gaussian import blur
from siftmetal_tpu.ops.pallas.blur import blur_pallas, blur_stack_pallas


@pytest.mark.parametrize(
    "shape,sigma",
    [((340, 512), 1.6), ((333, 470), 2.2), ((96, 128), 1.2489996)],
)
def test_blur_pallas_matches_xla(shape, sigma):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))
    ref = np.asarray(blur(img, sigma))
    got = np.asarray(blur_pallas(img, sigma, interpret=True))
    assert np.abs(ref - got).max() < 1e-6


def test_blur_stack_pallas():
    rng = np.random.default_rng(1)
    stack = jnp.asarray(rng.uniform(0, 1, (3, 64, 96)).astype(np.float32))
    ref = np.asarray(blur(stack, 1.6))
    got = np.asarray(blur_stack_pallas(stack, 1.6, interpret=True))
    assert np.abs(ref - got).max() < 1e-6


@pytest.mark.parametrize("shape", [(2, 200, 300), (1, 680, 1024)])
def test_octave_oneshot_pyramid_matches_reference(shape):
    """The batched one-shot pyramid kernel (ops/pallas/pyramid.py, the
    default TPU pyramid since r5) must match one-shot shift-add fp32
    blurs to bf16x3 accuracy, including the fused DoG outputs, ragged
    heights (200 = 128 + 72 exercises the clamped last band), and the
    padded column groups (300 -> one 512-col group; 1024 -> two).
    One-shot FIXTURE parity (vs the incremental cascade the CPU path
    runs) is asserted on hardware by benchmarks/parity_tpu.py and was
    measured on CPU at 3069/2136/1939/1772/1305 vs IPOL."""
    from siftmetal_tpu.config import SiftConfig
    from siftmetal_tpu.ops.pallas.pyramid import (
        octave_oneshot_pallas,
        oneshot_rhos,
        supports,
    )

    cfg = SiftConfig()
    b, h, w = shape
    assert supports(cfg, h)
    rng = np.random.default_rng(7)
    first = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))

    gauss, dog = octave_oneshot_pallas(first, cfg, interpret=True)

    ref = [first]
    for rho in oneshot_rhos(cfg):
        ref.append(blur(first, rho))
    ref = jnp.stack(ref, axis=1)
    assert np.abs(np.asarray(gauss - ref)).max() < 2e-4
    assert (
        np.abs(np.asarray(dog - (ref[:, 1:] - ref[:, :-1]))).max() < 2e-4
    )


def test_pick_ntt_grouping():
    """Column-group sizing: zero padding waste when a clean divisor <= 5
    exists, 128-aligned input strides always (even group sizes when the
    per-tile input stride is 64, i.e. upsampling)."""
    from siftmetal_tpu.ops.pallas.pyramid import _pick_ntt

    for n_t in range(1, 40):
        for stride in (64, 128):
            k = _pick_ntt(n_t, stride)
            assert (stride * k) % 128 == 0, (n_t, stride, k)
            waste = -(-n_t // k) * k - n_t
            allowed = [
                j for j in range(1, 6) if (stride * j) % 128 == 0
            ]
            best = min(-(-n_t // j) * j - n_t for j in allowed)
            assert waste == best, (n_t, stride, k, waste, best)
    # Spot values: octave widths of the 640x480 parity pipeline.
    assert _pick_ntt(10, 128) == 5   # oct0 1280 cols -> two 640 groups
    assert _pick_ntt(5, 128) == 5    # oct1 640 cols -> one group
    assert _pick_ntt(10, 64) == 2    # seed rect: even sizes only


@pytest.mark.parametrize("delta_min", [0.5, 1.0])
def test_seed_octave_pallas_matches_reference(delta_min):
    """The fused seed+octave-0 kernel (upsample+blur composed into the
    slice matrices, raw grayscale input, slice 0 emitted by the kernel)
    must match upsample-then-blur shift-add fp32 to bf16x3 accuracy in
    both delta_min modes, on a ragged non-multiple-of-tile shape."""
    from siftmetal_tpu.config import SiftConfig
    from siftmetal_tpu.ops.image import upsample_bilinear_2x
    from siftmetal_tpu.ops.pallas.pyramid import (
        _seed_sigmas,
        seed_octave_pallas,
        seed_supports,
    )

    cfg = SiftConfig(delta_min=delta_min)
    h, w = 170, 250
    assert seed_supports(cfg, h, w)
    rng = np.random.default_rng(11)
    gray = jnp.asarray(rng.uniform(0, 1, (2, h, w)).astype(np.float32))

    gauss, dog = seed_octave_pallas(gray, cfg, interpret=True)

    base = upsample_bilinear_2x(gray) if delta_min == 0.5 else gray
    ref = jnp.stack([blur(base, s) for s in _seed_sigmas(cfg)], axis=1)
    assert np.abs(np.asarray(gauss - ref)).max() < 2e-4
    assert (
        np.abs(np.asarray(dog - (ref[:, 1:] - ref[:, :-1]))).max() < 2e-4
    )


@pytest.mark.slow
def test_patch_kernels_band_resident_equivalent():
    """use_band_patches (band-resident gradient fields + sort-free lane
    permutation, config.py's documented r5 measured-negative — kept as a
    fully-plumbed experiment) must reproduce the per-lane-DMA path on
    both patch kernels, including batched fields, ragged validity, and
    adversarial garbage in invalid lanes. Small float tolerance: band
    mode regroups lanes, so multi-keypoint packing partners (and hence
    per-pixel summation order) legitimately differ."""
    from siftmetal_tpu.config import SiftConfig
    from siftmetal_tpu.ops.pallas.patches import (
        descriptor_lanes_pallas,
        orientation_hist_lanes_pallas,
        prepare_patch_fields,
    )

    cfg0 = SiftConfig(use_band_patches=False)
    cfg1 = SiftConfig(use_band_patches=True)
    rng = np.random.default_rng(23)
    s = cfg0.n_gaussians_per_octave
    h, w, b = 96, 160, 2
    gauss = jnp.asarray(rng.uniform(0, 1, (b, s, h, w)).astype(np.float32))
    fields = prepare_patch_fields(gauss, cfg0)

    L = 32
    sigs = np.concatenate([
        rng.uniform(0.6, 1.3, 16),
        rng.uniform(1.6, 2.4, 8),
        rng.uniform(2.8, 3.6, 8),
    ]).astype(np.float32)
    scale = jnp.asarray(
        rng.integers(1, cfg0.n_scales_per_octave + 1, L).astype(np.int32)
    )
    x_oct = jnp.asarray(rng.uniform(20, h - 20, L).astype(np.float32))
    y_oct = jnp.asarray(rng.uniform(20, w - 20, L).astype(np.float32))
    theta = jnp.asarray(rng.uniform(-3, 3, L).astype(np.float32))
    valid = jnp.asarray(rng.random(L) > 0.3)
    sig = jnp.where(valid, jnp.asarray(sigs), 0.0)
    th = jnp.where(valid, theta, jnp.nan)
    frame = jnp.asarray(rng.integers(0, b, L).astype(np.int32))

    d0 = descriptor_lanes_pallas(
        fields, scale, x_oct, y_oct, sig, th, cfg0,
        valid=valid, frame=frame, interpret=True,
    )
    d1 = descriptor_lanes_pallas(
        fields, scale, x_oct, y_oct, sig, th, cfg1,
        valid=valid, frame=frame, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(d0), np.asarray(d1), rtol=2e-5, atol=2e-5
    )

    o0 = orientation_hist_lanes_pallas(
        fields, scale, x_oct, y_oct, sig, cfg0,
        valid=valid, frame=frame, interpret=True,
    )
    o1 = orientation_hist_lanes_pallas(
        fields, scale, x_oct, y_oct, sig, cfg1,
        valid=valid, frame=frame, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(o0), np.asarray(o1), rtol=2e-5, atol=2e-5
    )


def test_patch_kernels_match_xla_describe():
    """Orientation/descriptor Pallas kernels (interpret mode) vs the XLA
    chunked-vmap reference path on a synthetic octave; also exercises the
    dynamic count skip (lanes past the count must come back zero)."""
    import jax
    from functools import partial
    from siftmetal_tpu.config import SiftConfig
    from siftmetal_tpu.ops.pallas.patches import (
        descriptor_lanes_pallas,
        orientation_hist_lanes_pallas,
        prepare_patch_fields,
    )
    from siftmetal_tpu.sift import describe as DS

    cfg = SiftConfig()
    rng = np.random.default_rng(0)
    s = cfg.n_gaussians_per_octave
    h, w = 96, 160
    gauss = jnp.asarray(rng.uniform(0, 1, (s, h, w)).astype(np.float32))

    L = 16
    scale = jnp.asarray(rng.integers(1, cfg.n_scales_per_octave + 1, L).astype(np.int32))
    x_oct = jnp.asarray(rng.uniform(20, h - 20, L).astype(np.float32))
    y_oct = jnp.asarray(rng.uniform(20, w - 20, L).astype(np.float32))
    sig = jnp.asarray(rng.uniform(1.7, 3.6, L).astype(np.float32))
    theta = jnp.asarray(rng.uniform(-3, 3, L).astype(np.float32))
    fields = prepare_patch_fields(gauss, cfg)

    # XLA reference: raw orientation histograms.
    r = cfg.ori_patch_radius
    gi, gj = DS.gradients(gauss[1:cfg.n_scales_per_octave + 1])
    hist_ref = jax.vmap(
        partial(
            DS._orientation_hist_one,
            DS._pad_spatial(gi, r),
            DS._pad_spatial(gj, r),
            radius=r,
            n_bins=cfg.n_orientation_bins,
            lam=cfg.orientation_lambda,
        )
    )(scale, x_oct, y_oct, sig)
    hist_pal = orientation_hist_lanes_pallas(
        fields, scale, x_oct, y_oct, sig, cfg, interpret=True
    )
    ref = np.asarray(hist_ref)
    got = np.asarray(hist_pal)
    denom = np.abs(ref).max(axis=1, keepdims=True) + 1e-9
    assert (np.abs(ref - got) / denom).max() < 5e-3

    # Dynamic count skip: lanes past the count are zeroed, lanes before
    # it match the full run.
    lane_valid = jnp.arange(L) < 8
    hist_cnt = np.asarray(
        orientation_hist_lanes_pallas(
            fields, scale, x_oct, y_oct, sig, cfg,
            valid=lane_valid, interpret=True,
        )
    )
    np.testing.assert_allclose(hist_cnt[:8], got[:8], rtol=1e-6)
    assert np.all(hist_cnt[8:] == 0.0)

    # Descriptors: compare raw histograms via the quantized outputs.
    d_ref = np.asarray(
        DS.descriptor_lanes(gauss, scale, x_oct, y_oct, sig, theta, cfg)
    ).astype(np.int32)
    raw_pal = descriptor_lanes_pallas(
        fields, scale, x_oct, y_oct, sig, theta, cfg, interpret=True
    )
    d_pal = np.asarray(DS.quantize_descriptors(raw_pal, cfg)).astype(np.int32)
    assert np.abs(d_ref - d_pal).max() <= 1

    # Ragged (non-prefix) validity must also work: the FIRST group is
    # inactive, so the second group's prefetch comes from an inactive
    # predecessor (exercises the every-group-prefetches-next chain).
    ragged = jnp.asarray(np.array([False] * 8 + [True] * 8))
    raw_cnt = np.asarray(
        descriptor_lanes_pallas(
            fields, scale, x_oct, y_oct, sig, theta, cfg,
            valid=ragged, interpret=True,
        )
    )
    np.testing.assert_allclose(raw_cnt[8:], np.asarray(raw_pal)[8:], rtol=1e-6)
    assert np.all(raw_cnt[:8] == 0.0)


def test_patch_kernels_mxu_reduce_equivalent():
    """use_patch_mxu_reduce (one MXU contraction finishing every entry's
    lane reduction, patches._entry_matrix_reduce) must reproduce the
    VPU lane-tree path on both patch kernels, across radius buckets and
    ragged validity."""
    from siftmetal_tpu.config import SiftConfig
    from siftmetal_tpu.ops.pallas.patches import (
        descriptor_lanes_pallas,
        orientation_hist_lanes_pallas,
        prepare_patch_fields,
    )

    cfg0 = SiftConfig(use_patch_mxu_reduce=False)
    cfg1 = SiftConfig(use_patch_mxu_reduce=True)
    rng = np.random.default_rng(11)
    s = cfg0.n_gaussians_per_octave
    h, w = 96, 160
    gauss = jnp.asarray(rng.uniform(0, 1, (s, h, w)).astype(np.float32))
    fields = prepare_patch_fields(gauss, cfg0)

    L = 24
    scale = jnp.asarray(
        rng.integers(1, cfg0.n_scales_per_octave + 1, L).astype(np.int32)
    )
    x_oct = jnp.asarray(rng.uniform(20, h - 20, L).astype(np.float32))
    y_oct = jnp.asarray(rng.uniform(20, w - 20, L).astype(np.float32))
    # Spread sigmas so every radius bucket (fine/mid/max) is hit.
    sig = jnp.asarray(rng.uniform(0.9, 3.6, L).astype(np.float32))
    theta = jnp.asarray(rng.uniform(-3, 3, L).astype(np.float32))
    valid = jnp.asarray(rng.random(L) > 0.25)

    a0 = np.asarray(descriptor_lanes_pallas(
        fields, scale, x_oct, y_oct, sig, theta, cfg0,
        valid=valid, interpret=True,
    ))
    a1 = np.asarray(descriptor_lanes_pallas(
        fields, scale, x_oct, y_oct, sig, theta, cfg1,
        valid=valid, interpret=True,
    ))
    np.testing.assert_allclose(a0, a1, rtol=2e-5, atol=2e-5)

    h0 = np.asarray(orientation_hist_lanes_pallas(
        fields, scale, x_oct, y_oct, sig, cfg0, valid=valid, interpret=True,
    ))
    h1 = np.asarray(orientation_hist_lanes_pallas(
        fields, scale, x_oct, y_oct, sig, cfg1, valid=valid, interpret=True,
    ))
    np.testing.assert_allclose(h0, h1, rtol=2e-5, atol=2e-5)


def test_patch_kernels_multikp_pack_equivalent():
    """use_multikp_pack (128//w_seg keypoints per shared compute tile,
    each in its own lane segment) must reproduce the per-keypoint packed
    path on both patch kernels — including ragged validity inside a
    packed block, and adversarial garbage (sigma=0, theta=NaN) in
    invalid lanes, which must not poison the shared entry contraction
    of the VALID keypoints packed next to them."""
    from siftmetal_tpu.config import SiftConfig
    from siftmetal_tpu.ops.pallas.patches import (
        descriptor_lanes_pallas,
        orientation_hist_lanes_pallas,
        prepare_patch_fields,
    )

    cfg0 = SiftConfig(use_multikp_pack=False)
    cfg1 = SiftConfig(use_multikp_pack=True)
    rng = np.random.default_rng(17)
    s = cfg0.n_gaussians_per_octave
    h, w = 96, 160
    gauss = jnp.asarray(rng.uniform(0, 1, (s, h, w)).astype(np.float32))
    fields = prepare_patch_fields(gauss, cfg0)

    # Radius-homogeneous GROUPS (the production layout: lanes arrive
    # scale-major) so the fine/mid packed buckets actually engage —
    # random per-lane sigmas would push every group's max reach into
    # the coarse (unpacked) bucket and test nothing.
    sigs = np.concatenate([
        rng.uniform(0.6, 1.3, 16),   # fine bucket: 4 kps per tile
        rng.uniform(1.6, 2.4, 8),    # mid bucket: 2 kps per tile
        rng.uniform(2.8, 3.6, 8),    # coarse: unpacked path
    ]).astype(np.float32)
    L = len(sigs)
    scale = jnp.asarray(
        rng.integers(1, cfg0.n_scales_per_octave + 1, L).astype(np.int32)
    )
    x_oct = jnp.asarray(rng.uniform(20, h - 20, L).astype(np.float32))
    y_oct = jnp.asarray(rng.uniform(20, w - 20, L).astype(np.float32))
    theta = jnp.asarray(rng.uniform(-3, 3, L).astype(np.float32))
    valid = jnp.asarray(rng.random(L) > 0.35)
    sig = jnp.where(valid, jnp.asarray(sigs), 0.0)
    theta = jnp.where(valid, theta, jnp.nan)

    a0 = np.asarray(descriptor_lanes_pallas(
        fields, scale, x_oct, y_oct, sig, theta, cfg0,
        valid=valid, interpret=True,
    ))
    a1 = np.asarray(descriptor_lanes_pallas(
        fields, scale, x_oct, y_oct, sig, theta, cfg1,
        valid=valid, interpret=True,
    ))
    assert np.isfinite(a1).all()
    np.testing.assert_allclose(a0, a1, rtol=2e-5, atol=2e-5)

    h0 = np.asarray(orientation_hist_lanes_pallas(
        fields, scale, x_oct, y_oct, sig, cfg0, valid=valid, interpret=True,
    ))
    h1 = np.asarray(orientation_hist_lanes_pallas(
        fields, scale, x_oct, y_oct, sig, cfg1, valid=valid, interpret=True,
    ))
    assert np.isfinite(h1).all()
    np.testing.assert_allclose(h0, h1, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_patch_kernels_batched_frames():
    """Batched fields ([B, S, H, W] + per-lane frame index) must match
    per-frame calls."""
    from siftmetal_tpu.config import SiftConfig
    from siftmetal_tpu.ops.pallas.patches import (
        descriptor_lanes_pallas,
        orientation_hist_lanes_pallas,
        prepare_patch_fields,
    )

    cfg = SiftConfig()
    rng = np.random.default_rng(3)
    s = cfg.n_gaussians_per_octave
    b, h, w = 2, 96, 160
    gauss = jnp.asarray(rng.uniform(0, 1, (b, s, h, w)).astype(np.float32))

    L = 8  # lanes per frame
    scale = jnp.asarray(
        rng.integers(1, cfg.n_scales_per_octave + 1, b * L).astype(np.int32)
    )
    x_oct = jnp.asarray(rng.uniform(20, h - 20, b * L).astype(np.float32))
    y_oct = jnp.asarray(rng.uniform(20, w - 20, b * L).astype(np.float32))
    sig = jnp.asarray(rng.uniform(1.7, 3.6, b * L).astype(np.float32))
    theta = jnp.asarray(rng.uniform(-3, 3, b * L).astype(np.float32))
    frame = jnp.repeat(jnp.arange(b, dtype=jnp.int32), L)

    fields_b = prepare_patch_fields(gauss, cfg)
    got_o = np.asarray(
        orientation_hist_lanes_pallas(
            fields_b, scale, x_oct, y_oct, sig, cfg,
            frame=frame, interpret=True,
        )
    )
    got_d = np.asarray(
        descriptor_lanes_pallas(
            fields_b, scale, x_oct, y_oct, sig, theta, cfg,
            frame=frame, interpret=True,
        )
    )
    for i in range(b):
        fields_i = prepare_patch_fields(gauss[i], cfg)
        sl = slice(i * L, (i + 1) * L)
        ref_o = np.asarray(
            orientation_hist_lanes_pallas(
                fields_i, scale[sl], x_oct[sl], y_oct[sl], sig[sl], cfg,
                interpret=True,
            )
        )
        ref_d = np.asarray(
            descriptor_lanes_pallas(
                fields_i, scale[sl], x_oct[sl], y_oct[sl], sig[sl],
                theta[sl], cfg, interpret=True,
            )
        )
        np.testing.assert_allclose(got_o[sl], ref_o, rtol=1e-6)
        np.testing.assert_allclose(got_d[sl], ref_d, rtol=1e-6)


def test_octave_cascade_matches_sequential():
    from siftmetal_tpu.config import SiftConfig
    from siftmetal_tpu.ops.pallas.cascade import octave_cascade_pallas
    from siftmetal_tpu.sift.pyramid import build_gaussian_octave

    cfg = SiftConfig()
    rng = np.random.default_rng(0)
    g0 = jnp.asarray(rng.uniform(0, 1, (160, 222)).astype(np.float32))
    ref_stack = np.asarray(build_gaussian_octave(g0, 0, cfg))
    got_stack, got_dog = octave_cascade_pallas(g0, cfg, interpret=True)
    got_stack = np.asarray(got_stack)
    assert got_stack.shape == ref_stack.shape
    err = np.abs(ref_stack - got_stack).max()
    assert err < 1e-5, err
    np.testing.assert_allclose(
        np.asarray(got_dog), ref_stack[1:] - ref_stack[:-1], atol=2e-5
    )


def test_detect_candidates_pallas_matches_xla():
    """Fused detection kernel (interpret mode) vs the XLA passes: the
    in-kernel compacted candidate set must equal the soft-extrema mask's
    true positions, counters must match the dense sums, Taylor fields at
    candidates and the edge test must match the XLA stencils."""
    from siftmetal_tpu.ops.pallas.detect import detect_candidates_pallas
    from siftmetal_tpu.sift.detect import (
        dense_edge_ok,
        dense_taylor_fields,
        extrema_mask,
    )

    rng = np.random.default_rng(7)
    b, s, h, w = 2, 5, 70, 150
    # Smooth-ish field so extrema are sparse like a real DoG.
    base = rng.uniform(-1, 1, (b, s, h // 5 + 2, w // 5 + 2))
    dog = np.stack(
        [
            [
                np.kron(base[bb, ss], np.ones((5, 5)))[:h, :w]
                for ss in range(s)
            ]
            for bb in range(b)
        ]
    ).astype(np.float32)
    dog += rng.normal(0, 0.05, dog.shape).astype(np.float32)
    dog_j = jnp.asarray(dog)

    thr = 0.8 * 0.0133
    (cand_col, slot_ok, cand_fields, cand_edge, n_raw,
     n_soft, row_drop) = (
        detect_candidates_pallas(dog_j, thr, 10.0, tile_h=16, interpret=True)
    )
    _, n_sc, ht, slots = cand_col.shape
    for bb in range(b):
        m_ref = np.asarray(extrema_mask(dog_j[bb]))
        c = dog[bb, 1:-1, 1:-1, 1:-1]
        soft_ref = m_ref & (np.abs(c) > thr)
        f_ref = np.asarray(dense_taylor_fields(dog_j[bb]))
        e_ref = np.asarray(dense_edge_ok(dog_j[bb], 10.0))

        # Counters match the dense sums; rows denser than ``slots`` are
        # COUNTED as dropped (this synthetic field is ~20x denser than a
        # real blurred DoG, so it exercises the overflow path too).
        assert int(n_raw[bb]) == int(m_ref.sum())
        assert int(n_soft[bb]) == int(soft_ref.sum())
        per_row = soft_ref.sum(axis=2)  # [S-2, H-2]
        want_drop = int(np.maximum(per_row - slots, 0).sum())
        assert int(row_drop[bb]) == want_drop

        # The compacted candidate set == the first ``slots``
        # (column-ascending) soft positions of each (scale, row).
        ok = np.asarray(slot_ok[bb])
        cc = np.asarray(cand_col[bb])
        got = set()
        for ss in range(n_sc):
            for r in range(ht):
                n_ok = int(ok[ss, r].sum())
                assert n_ok == min(per_row[ss, r] if r < h - 2 else 0, slots)
                for sl in range(n_ok):
                    got.add((ss, r, int(cc[ss, r, sl])))
        want = set()
        for ss in range(n_sc):
            for r in range(h - 2):
                cols = np.flatnonzero(soft_ref[ss, r])[:slots]
                want.update((ss, r, int(ccol)) for ccol in cols)
        assert got == want

        # The mover walk's 27-point re-derivation must match the dense
        # XLA stencils at arbitrary interior positions (the walk can
        # land anywhere); rtol accommodates near-singular Hessians.
        from siftmetal_tpu.sift.detect import (
            _OFFS19,
            _dog_gather,
            _taylor_from_stencil,
        )

        finite = np.isfinite(f_ref).all(-1)
        ss_a, ii_a, jj_a = np.nonzero(finite)
        sel27 = slice(0, len(ss_a), max(1, len(ss_a) // 500))
        s27 = jnp.asarray(ss_a[sel27] + 1, jnp.int32)
        i27 = jnp.asarray(ii_a[sel27] + 1, jnp.int32)
        j27 = jnp.asarray(jj_a[sel27] + 1, jnp.int32)
        oi7, oj7, os7, v7, e7 = _taylor_from_stencil(
            _dog_gather(dog_j[bb], _OFFS19, s27, i27, j27), 10.0
        )
        got27 = np.stack(
            [np.asarray(a) for a in (oi7, oj7, os7, v7)], axis=-1
        )
        want27 = f_ref[ss_a[sel27], ii_a[sel27], jj_a[sel27]]
        np.testing.assert_allclose(got27, want27, rtol=5e-3, atol=1e-4)
        e_want = e_ref[ss_a[sel27], ii_a[sel27], jj_a[sel27]]
        np.testing.assert_array_equal(np.asarray(e7), e_want)

        # The per-slot harvested values must equal the dense planes at
        # each candidate position (iteration 1 reads these directly).
        cf = [np.asarray(a[bb]) for a in cand_fields]
        ce = np.asarray(cand_edge[bb])
        for ss in range(n_sc):
            for r in range(h - 2):
                for sl in range(int(ok[ss, r].sum())):
                    ccol = int(cc[ss, r, sl])
                    if not np.isfinite(f_ref[ss, r, ccol]).all():
                        continue
                    for pidx in range(4):
                        np.testing.assert_allclose(
                            cf[pidx][ss, r, sl],
                            f_ref[ss, r, ccol, pidx],
                            rtol=5e-3,
                            atol=1e-4,
                        )
                    assert ce[ss, r, sl] == e_ref[ss, r, ccol]


def test_detect_octave_slots_tail_matches_xla():
    """Full Pallas detection path (interpret kernel + slot-grid tail with
    mover compaction) vs detect_octave: identical counters and identical
    accepted-keypoint sets (position, subpixel offsets, sigma, value)."""
    import functools

    import jax

    from siftmetal_tpu.config import SiftConfig
    from siftmetal_tpu.ops.pallas import detect as pd
    from siftmetal_tpu.sift import detect as D

    cfg = SiftConfig()
    rng = np.random.default_rng(11)
    b, s, h, w = 2, 5, 70, 150

    # The two paths are only comparable when NEITHER overflows its
    # (different-shaped) budget: the XLA path has a global candidate
    # budget (256 at this shape), the slot path a per-row one. Build a
    # SPARSE field: sub-threshold background + ~60 isolated separable
    # bumps (all converge at iteration 1) + ~12 rejection-sampled
    # neighborhoods whose first Taylor step exceeds the 0.6 bound, so
    # the slot tail's MOVER compaction path is exercised too.
    def taylor_offset(nb):
        c = nb[1, 1, 1]
        g = np.array([
            0.5 * (nb[1, 2, 1] - nb[1, 0, 1]),
            0.5 * (nb[1, 1, 2] - nb[1, 1, 0]),
            0.5 * (nb[2, 1, 1] - nb[0, 1, 1]),
        ])
        hii = nb[1, 2, 1] + nb[1, 0, 1] - 2 * c
        hjj = nb[1, 1, 2] + nb[1, 1, 0] - 2 * c
        hss = nb[2, 1, 1] + nb[0, 1, 1] - 2 * c
        hij = 0.25 * (nb[1, 2, 2] - nb[1, 2, 0] - nb[1, 0, 2] + nb[1, 0, 0])
        his = 0.25 * (nb[2, 2, 1] - nb[2, 0, 1] - nb[0, 2, 1] + nb[0, 0, 1])
        hjs = 0.25 * (nb[2, 1, 2] - nb[2, 1, 0] - nb[0, 1, 2] + nb[0, 1, 0])
        hm = np.array([[hii, hij, his], [hij, hjj, hjs], [his, hjs, hss]])
        try:
            return -np.linalg.solve(hm, g)
        except np.linalg.LinAlgError:
            return None

    def mover_neighborhood():
        # Strict-max 3x3x3 whose quadratic step wants to move: the
        # center only epsilon above its neighbors makes the Hessian
        # near-singular (hit rate ~1%, so this loop is short).
        while True:
            nb = rng.normal(0, 0.05, (3, 3, 3))
            nb[1, 1, 1] = np.abs(nb).max() * (1 + rng.uniform(0.001, 0.02))
            o = taylor_offset(nb)
            if o is not None and 0.7 < np.abs(o).max() < 5.0:
                return nb

    dog = rng.normal(0, 0.002, (b, s, h, w)).astype(np.float32)
    # Non-colliding sites on a coarse grid (>=5 px apart).
    sites = [(ii, jj) for ii in range(4, h - 4, 6) for jj in range(4, w - 4, 6)]
    for bb in range(b):
        picks = rng.permutation(len(sites))
        for p in picks[:60]:
            ii, jj = sites[p]
            ss = int(rng.integers(1, s - 1))
            amp = float(rng.uniform(0.05, 0.4) * rng.choice([-1.0, 1.0]))
            wgt = lambda: np.array([rng.uniform(0.1, 0.95), 1.0,
                                    rng.uniform(0.1, 0.95)])
            dog[bb, ss - 1:ss + 2, ii - 1:ii + 2, jj - 1:jj + 2] += (
                amp * np.einsum("i,j,k->ijk", wgt(), wgt(), wgt())
            ).astype(np.float32)
        for p in picks[60:72]:
            ii, jj = sites[p]
            ss = int(rng.integers(1, s - 1))
            dog[bb, ss - 1:ss + 2, ii - 1:ii + 2, jj - 1:jj + 2] = (
                mover_neighborhood().astype(np.float32)
            )
    dog_j = jnp.asarray(dog)

    octave = 1
    # slots=8: this synthetic field stacks more bumps per row than the
    # production default (6) accommodates; strict counter equality with
    # the XLA path needs a lossless slot budget (drops are counted, so
    # a tighter budget is *correct* but not *identical*).
    (cand_col, slot_ok, cand_fields, cand_edge,
     n_extrema, n_soft, row_drop) = pd.detect_candidates_pallas(
        dog_j, 0.8 * cfg.dog_threshold, cfg.edge_threshold,
        tile_h=16, slots=8, interpret=True,
    )
    k_move = 256
    kp_p, ctr_p = jax.vmap(
        lambda cc, ok, cf, ce, d, ne, ns, rd: D._octave_tail_slots(
            cc, ok, cf, ce, d, octave, cfg, h, w, ne, ns, rd, k_move
        )
    )(cand_col, slot_ok, cand_fields, cand_edge, dog_j,
      n_extrema, n_soft, row_drop)

    for bb in range(b):
        kp_r, ctr_r = D.detect_octave(dog_j[bb], octave, cfg)
        for key in ("n_extrema", "n_soft", "n_interp", "n_hard",
                    "n_edge", "n_border", "overflow"):
            assert int(ctr_p[key][bb]) == int(ctr_r[key]), (
                key, int(ctr_p[key][bb]), int(ctr_r[key]))

        def accepted(kp, idx=None):
            sel = np.asarray(kp.pass_border if idx is None
                             else kp.pass_border[idx])
            pick = lambda a: np.asarray(a if idx is None else a[idx])[sel]
            rows = set()
            for t in zip(
                pick(kp.scale), pick(kp.i), pick(kp.j),
                np.round(pick(kp.x), 4), np.round(pick(kp.y), 4),
                np.round(pick(kp.sigma), 4), np.round(pick(kp.value), 5),
            ):
                rows.add(tuple(float(v) for v in t))
            return rows

        assert accepted(kp_p, bb) == accepted(kp_r)


@pytest.mark.slow
def test_fused_orient_desc_matches_staged():
    """Fused orientation+descriptor kernel (interpret mode) vs the
    staged XLA chain (hist -> smooth -> peaks -> descriptors): the
    per-keypoint (theta, descriptor) SETS must agree (the fused kernel
    emits peaks in bin order, the staged path in height order)."""
    import jax
    from siftmetal_tpu.config import SiftConfig
    from siftmetal_tpu.ops.pallas.patches import (
        orient_desc_lanes_pallas,
        prepare_patch_fields,
    )
    from siftmetal_tpu.sift import describe as DS

    cfg = SiftConfig()
    rng = np.random.default_rng(7)
    s = cfg.n_gaussians_per_octave
    h, w = 96, 160
    gauss = jnp.asarray(rng.uniform(0, 1, (s, h, w)).astype(np.float32))

    L = 16
    scale = jnp.asarray(
        rng.integers(1, cfg.n_scales_per_octave + 1, L).astype(np.int32)
    )
    x_oct = jnp.asarray(rng.uniform(20, h - 20, L).astype(np.float32))
    y_oct = jnp.asarray(rng.uniform(20, w - 20, L).astype(np.float32))
    sig = jnp.asarray(rng.uniform(1.0, 3.6, L).astype(np.float32))
    fields = prepare_patch_fields(gauss, cfg)
    valid = jnp.asarray(np.array([True] * 12 + [False] * 4))

    raw, theta, ov = orient_desc_lanes_pallas(
        fields, scale, x_oct, y_oct, sig, cfg, valid=valid, interpret=True
    )
    feats = np.asarray(DS.quantize_descriptors(raw, cfg)).astype(np.int32)
    theta = np.asarray(theta)
    ov = np.asarray(ov)

    # Staged reference: XLA hist -> smooth -> peaks, then XLA
    # descriptor per (lane, peak).
    r = cfg.ori_patch_radius
    gi, gj = DS.gradients(gauss[1:cfg.n_scales_per_octave + 1])
    from functools import partial

    hist = jax.vmap(
        partial(
            DS._orientation_hist_one,
            DS._pad_spatial(gi, r),
            DS._pad_spatial(gj, r),
            radius=r,
            n_bins=cfg.n_orientation_bins,
            lam=cfg.orientation_lambda,
        )
    )(scale, x_oct, y_oct, sig)
    hist = DS._smooth_circular(hist, cfg.orientation_smoothing_iterations)
    theta_ref, ov_ref = DS.orientation_peaks(hist, cfg)
    theta_ref = np.asarray(theta_ref)
    ov_ref = np.asarray(ov_ref)

    for li in range(L):
        if not bool(valid[li]):
            assert not ov[li].any()
            assert np.all(feats[li] == 0)
            continue
        got_th = sorted(theta[li][ov[li]].tolist())
        want_th = sorted(theta_ref[li][ov_ref[li]].tolist())
        assert len(got_th) == len(want_th), (li, got_th, want_th)
        # Poly-atan2 + fp accumulation-order differences shift thetas
        # by well under the 10-degree bin width.
        np.testing.assert_allclose(got_th, want_th, atol=2e-2)

    # Descriptors: each fused (lane, peak) descriptor must match the
    # XLA descriptor computed at the FUSED theta (isolates descriptor
    # math from the tiny theta deltas checked above).
    for li in range(L):
        if not bool(valid[li]):
            continue
        for p in range(cfg.max_orientations_per_keypoint):
            if not ov[li, p]:
                continue
            d_ref = DS.descriptor_lanes(
                gauss,
                scale[li:li + 1],
                x_oct[li:li + 1],
                y_oct[li:li + 1],
                sig[li:li + 1],
                jnp.asarray(theta[li:li + 1, p]),
                cfg,
            )
            d_ref = np.asarray(d_ref).astype(np.int32)[0]
            assert np.abs(feats[li, p] - d_ref).max() <= 1, (li, p)


def test_detect_all_octaves_fused_tail_matches_per_octave():
    """The fused cross-octave tail (one mover walk + one acceptance over
    every octave's slot grid) must produce the same aggregate counters
    and the same per-octave accepted keypoint sets as running the
    per-octave slot tail octave by octave."""
    import dataclasses

    import jax

    from siftmetal_tpu.config import SiftConfig
    from siftmetal_tpu.sift import detect as D

    # Force the Pallas branch on CPU: detect_candidates_pallas runs in
    # compiled-interpret via the monkeypatched flag below.
    cfg = SiftConfig()
    rng = np.random.default_rng(21)
    b = 2
    # Two octaves with different shapes; reuse the sparse-bump +
    # engineered-mover field builder from the single-octave test by
    # generating random smooth-ish DoGs with isolated bumps.
    dogs = []
    for (h, w) in [(70, 150), (36, 76)]:
        dog = rng.normal(0, 0.002, (b, 5, h, w)).astype(np.float32)
        sites = [(ii, jj) for ii in range(4, h - 4, 6)
                 for jj in range(4, w - 4, 6)]
        for bb in range(b):
            picks = rng.permutation(len(sites))
            for p in picks[:40]:
                ii, jj = sites[p]
                ss = int(rng.integers(1, 4))
                amp = float(rng.uniform(0.05, 0.4) * rng.choice([-1, 1]))
                wgt = lambda: np.array(
                    [rng.uniform(0.1, 0.95), 1.0, rng.uniform(0.1, 0.95)]
                )
                dog[bb, ss - 1:ss + 2, ii - 1:ii + 2, jj - 1:jj + 2] += (
                    amp * np.einsum("i,j,k->ijk", wgt(), wgt(), wgt())
                ).astype(np.float32)
        dogs.append(jnp.asarray(dog))

    from siftmetal_tpu.ops.pallas import detect as pd

    orig = pd.detect_candidates_pallas

    def interp(*args, **kw):
        kw["interpret"] = True
        kw.setdefault("tile_h", 16)
        return orig(*args, **kw)

    orig_use = D._use_pallas_detect
    pd_detect = pd.detect_candidates_pallas
    try:
        pd.detect_candidates_pallas = interp
        D._use_pallas_detect = lambda cfg: True
        fused_kp, fused_ctr = D.detect_all_octaves_batch(dogs, cfg)

        # Per-octave reference: the slot-grid tail octave by octave.
        ref_ctr = {}
        ref_kp = []
        for o, dog in enumerate(dogs):
            kp, ctr = D.detect_octave_batch(dog, o, cfg)
            ref_kp.append(kp)
            for k, v in ctr.items():
                ref_ctr[k] = ref_ctr.get(k, 0) + v
    finally:
        pd.detect_candidates_pallas = pd_detect
        D._use_pallas_detect = orig_use

    for key in ref_ctr:
        np.testing.assert_array_equal(
            np.asarray(fused_ctr[key]), np.asarray(ref_ctr[key]), err_msg=key
        )

    def accepted(kp, bb):
        sel = np.asarray(kp.pass_border[bb]) & np.asarray(
            kp.cand_valid[bb]
        )
        rows = set()
        for t in zip(
            np.asarray(kp.scale[bb])[sel],
            np.asarray(kp.i[bb])[sel],
            np.asarray(kp.j[bb])[sel],
            np.round(np.asarray(kp.x[bb])[sel], 4),
            np.round(np.asarray(kp.y[bb])[sel], 4),
            np.round(np.asarray(kp.sigma[bb])[sel], 4),
        ):
            rows.add(tuple(float(v) for v in t))
        return rows

    for o in range(len(dogs)):
        for bb in range(b):
            assert accepted(fused_kp[o], bb) == accepted(ref_kp[o], bb), (
                o, bb,
            )


@pytest.mark.slow
def test_patch_kernels_lane_chunking():
    """Lane sets past MAX_LANES_PER_CALL split into sequential kernel
    calls (per-call scalar prefetch must fit the 1 MB SMEM budget);
    results must equal one unsplit call."""
    from siftmetal_tpu.config import SiftConfig
    from siftmetal_tpu.ops.pallas import patches as P

    cfg = SiftConfig()
    rng = np.random.default_rng(5)
    s = cfg.n_gaussians_per_octave
    h, w = 96, 160
    gauss = jnp.asarray(rng.uniform(0, 1, (s, h, w)).astype(np.float32))
    fields = P.prepare_patch_fields(gauss, cfg)

    L = 32
    scale = jnp.asarray(
        rng.integers(1, cfg.n_scales_per_octave + 1, L).astype(np.int32)
    )
    x_oct = jnp.asarray(rng.uniform(20, h - 20, L).astype(np.float32))
    y_oct = jnp.asarray(rng.uniform(20, w - 20, L).astype(np.float32))
    sig = jnp.asarray(rng.uniform(1.7, 3.6, L).astype(np.float32))
    theta = jnp.asarray(rng.uniform(-3, 3, L).astype(np.float32))
    valid = jnp.asarray(rng.random(L) > 0.3)

    ref_o = np.asarray(
        P.orientation_hist_lanes_pallas(
            fields, scale, x_oct, y_oct, sig, cfg, valid=valid,
            interpret=True,
        )
    )
    ref_d = np.asarray(
        P.descriptor_lanes_pallas(
            fields, scale, x_oct, y_oct, sig, theta, cfg, valid=valid,
            interpret=True,
        )
    )
    orig = P.MAX_LANES_PER_CALL
    try:
        P.MAX_LANES_PER_CALL = 8  # force 4 chunks
        got_o = np.asarray(
            P.orientation_hist_lanes_pallas(
                fields, scale, x_oct, y_oct, sig, cfg, valid=valid,
                interpret=True,
            )
        )
        got_d = np.asarray(
            P.descriptor_lanes_pallas(
                fields, scale, x_oct, y_oct, sig, theta, cfg, valid=valid,
                interpret=True,
            )
        )
    finally:
        P.MAX_LANES_PER_CALL = orig
    np.testing.assert_allclose(got_o, ref_o, rtol=1e-6)
    np.testing.assert_allclose(got_d, ref_d, rtol=1e-6)
