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


def test_detect_fields_pallas_matches_xla():
    """Fused detection kernel (interpret mode) vs the three XLA passes:
    raw/soft extrema masks, Taylor fields at soft candidates, edge test."""
    from siftmetal_tpu.ops.pallas.detect import detect_fields_pallas
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
    raw, soft, fields, edge = detect_fields_pallas(
        dog_j, thr, 10.0, tile_h=16, interpret=True
    )
    hp, wp = soft.shape[-2], soft.shape[-1]
    for bb in range(b):
        m_ref = np.asarray(extrema_mask(dog_j[bb]))
        c = dog[bb, 1:-1, 1:-1, 1:-1]
        soft_ref = m_ref & (np.abs(c) > thr)
        f_ref = np.asarray(dense_taylor_fields(dog_j[bb]))
        e_ref = np.asarray(dense_edge_ok(dog_j[bb], 10.0))

        raw_np = np.asarray(raw[bb])[:, : h - 2, : w - 2]
        soft_np = np.asarray(soft[bb])[:, : h - 2, : w - 2]
        assert (raw_np == m_ref).all()
        assert (soft_np == soft_ref).all()
        # Padding region must be inert.
        assert not np.asarray(soft[bb])[:, h - 2 :, :].any()
        assert not np.asarray(soft[bb])[:, :, w - 2 :].any()

        f_np = np.asarray(fields[bb])[:, : h - 2, : w - 2]
        e_np = np.asarray(edge[bb])[:, : h - 2, : w - 2]
        # Fields are only consumed where the refinement walk can land;
        # compare where the reference values are finite (interior det!=0).
        # rtol accommodates near-singular Hessians (det ~ 0): there the
        # offsets blow past the 0.6 convergence bound by orders of
        # magnitude and only their sign/magnitude class matters.
        finite = np.isfinite(f_ref).all(-1)
        np.testing.assert_allclose(
            f_np[finite], f_ref[finite], rtol=5e-3, atol=1e-4
        )
        assert (e_np == e_ref).all()
