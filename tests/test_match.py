"""Matching: exact 2-NN (single-shot + blocked map-scale), geometry score.

Mirrors the intent of the reference's DescriptorTests.testMatches /
matchDescriptors (Tests/SIFTMetalTests/DescriptorTests.swift:89-139, 75-87)
with the >= 80% match-rate assertion actually enforced (the reference's is
unused and buggy), plus the ANN-vs-exact recall benchmark from the
commented-out TrieTests (TrieTests.swift:12-202).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from siftmetal_tpu.config import SiftConfig
from siftmetal_tpu.match.matcher import (
    Matches,
    geometry_score,
    match_bruteforce,
)
from siftmetal_tpu.sift.extract import SIFT

from conftest import load_descriptors

CFG = SiftConfig()


@pytest.fixture(scope="module")
def ours(butterfly):
    sift = SIFT(butterfly.shape[0], butterfly.shape[1], CFG)
    _, descs, _ = sift.extract(butterfly)
    return descs


@pytest.fixture(scope="module")
def ipol():
    keys, feats, _ = load_descriptors()
    return keys, feats


def test_self_match_is_identity(ours):
    m = match_bruteforce(
        ours.features, ours.features, ours.valid, ours.valid
    )
    v = np.asarray(ours.valid)
    idx = np.asarray(m.target_idx)
    ok = np.asarray(m.valid)
    # Self-distance is 0, so every accepted match maps to itself.
    assert (idx[ok] == np.nonzero(v)[0][: len(idx)][ok[: v.sum()]]).all() or (
        idx[ok] == np.arange(len(idx))[ok]
    ).all()
    # Most valid descriptors accept (duplicate twins may fail ratio test).
    assert ok.sum() >= 0.9 * v.sum()


def test_match_vs_ipol_descriptors(ours, ipol):
    keys, feats = ipol
    pad = np.zeros((2048 - len(feats) % 2048 if len(feats) % 2048 else 0, 128))
    t_feats = jnp.asarray(
        np.concatenate([feats, pad]).astype(np.uint8)
    )
    t_valid = jnp.asarray(
        np.concatenate([np.ones(len(feats)), np.zeros(len(pad))]).astype(bool)
    )
    m = match_bruteforce(
        ours.features, t_feats, ours.valid, t_valid,
        absolute_threshold=1.176, ratio_threshold=0.6,
    )
    ok = np.asarray(m.valid)
    n_ours = int(np.asarray(ours.valid).sum())
    rate = ok.sum() / n_ours
    # Reference intended >= 80% (DescriptorTests.swift:84-86).
    assert rate >= 0.8, rate

    # Matched pairs must be the SAME physical keypoint: positions within 1px.
    qx = np.asarray(ours.x)[ok]
    qy = np.asarray(ours.y)[ok]
    t_idx = np.asarray(m.target_idx)[ok]
    t_pos = keys[t_idx][:, :2]
    dist = np.hypot(qx - t_pos[:, 0], qy - t_pos[:, 1])
    assert (dist < 1.0).mean() >= 0.99, (dist < 1.0).mean()


def test_geometry_score_discriminates():
    rng = np.random.default_rng(0)
    n = 100
    q_xy = rng.uniform(0, 300, (n, 2)).astype(np.float32)
    # A clean similarity transform: rotation + scale + shift.
    a = 0.4
    rot = np.array(
        [[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]], dtype=np.float32
    )
    t_xy = (q_xy @ rot.T) * 1.3 + 17.0
    m = Matches(
        target_idx=jnp.arange(n, dtype=jnp.int32),
        distance=jnp.zeros(n),
        second_distance=jnp.ones(n),
        valid=jnp.ones(n, dtype=bool),
    )
    good = float(
        geometry_score(m, jnp.asarray(q_xy), jnp.asarray(t_xy))
    )
    bad = float(
        geometry_score(
            m,
            jnp.asarray(q_xy),
            jnp.asarray(rng.uniform(0, 300, (n, 2)).astype(np.float32)),
        )
    )
    assert good > 0.95, good
    assert bad < 0.6, bad
    # Too few matches -> score 0 (SIFTDescriptor.swift:128-131).
    few = Matches(
        target_idx=m.target_idx,
        distance=m.distance,
        second_distance=m.second_distance,
        valid=jnp.arange(n) < 5,
    )
    assert float(geometry_score(few, jnp.asarray(q_xy), jnp.asarray(t_xy))) == 0.0


def test_top2_matches_topk_reference():
    from siftmetal_tpu.match.matcher import _top2

    rng = np.random.default_rng(7)
    d2 = rng.uniform(0, 10, (64, 257)).astype(np.float32)
    d2[5, 100] = d2[5, 101] = 0.25  # exact tie
    b1, b2, idx, idx2 = _top2(jnp.asarray(d2))
    srt = np.sort(d2, axis=1)
    np.testing.assert_allclose(np.asarray(b1), srt[:, 0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(b2), srt[:, 1], rtol=1e-6)
    assert (np.take_along_axis(d2, np.asarray(idx)[:, None], 1)[:, 0]
            == srt[:, 0]).all()
    assert (np.take_along_axis(d2, np.asarray(idx2)[:, None], 1)[:, 0]
            == srt[:, 1]).all()
    assert (np.asarray(idx2) != np.asarray(idx)).all()


def test_masked_nonzero_dense_block_reports_drops():
    from siftmetal_tpu.sift.detect import masked_nonzero

    # Adversarial density: 100 hits inside one 512 block exceeds the
    # 16-slot bound -> drops must be REPORTED, survivors still valid.
    # (block/slots pinned explicitly so the test is independent of the
    # perf-tuned defaults.)
    mask = np.zeros(2048, dtype=bool)
    mask[100:200] = True
    idx, count, dropped = masked_nonzero(
        jnp.asarray(mask), 128, block=512, slots=16
    )
    assert int(dropped) == 100 - 16
    assert int(count) == 16
    got = np.asarray(idx)[:16]
    assert set(got).issubset(set(range(100, 200)))



def test_pairwise_sq_dists_u8_integer_exact():
    """The int8-MXU distance decomposition must be INTEGER-EXACT vs a
    direct int64 computation (any mismatch means the centering algebra
    or an overflow is wrong)."""
    from siftmetal_tpu.match.matcher import pairwise_sq_dists_u8

    rng = np.random.default_rng(11)
    # Include the extremes 0 and 255 (the centering's corner cases).
    a = rng.integers(0, 256, (41, 128)).astype(np.uint8)
    b = rng.integers(0, 256, (29, 128)).astype(np.uint8)
    a[0, :] = 0
    a[1, :] = 255
    b[0, :] = 255
    b[1, :] = 0
    ref = (
        (a.astype(np.int64)[:, None, :] - b.astype(np.int64)[None, :, :])
        ** 2
    ).sum(-1)
    got = np.asarray(pairwise_sq_dists_u8(jnp.asarray(a), jnp.asarray(b)))
    assert got.dtype == np.int32
    assert (got == ref).all()
    # Exactly representable in f32 downstream (max 128*255^2 < 2^24).
    assert ref.max() < 2 ** 24


def test_match_bruteforce_blocked_equals_single_shot():
    """The streaming blocked top-2 (map-scale path) must reproduce the
    single-matmul matcher exactly, including cross-block second-bests
    and validity masking."""
    rng = np.random.default_rng(2)
    # Low-entropy descriptors so some pairs pass the ratio test.
    base = rng.integers(0, 40, (50, 128))
    q = jnp.asarray(
        np.clip(base + rng.integers(-3, 4, (50, 128)), 0, 255).astype(
            np.uint8
        )
    )
    t = jnp.asarray(
        np.clip(
            np.vstack([base, rng.integers(0, 40, (206, 128))])
            + rng.integers(-3, 4, (256, 128)),
            0, 255,
        ).astype(np.uint8)
    )
    qv = jnp.ones(50, bool)
    tv = jnp.asarray(rng.random(256) > 0.1)
    ref = match_bruteforce(q, t, qv, tv)
    got = match_bruteforce(q, t, qv, tv, target_block=100)  # 3 ragged blocks
    assert int(ref.count) > 0
    np.testing.assert_array_equal(
        np.asarray(ref.target_idx), np.asarray(got.target_idx)
    )
    np.testing.assert_allclose(
        np.asarray(ref.distance), np.asarray(got.distance)
    )
    np.testing.assert_allclose(
        np.asarray(ref.second_distance), np.asarray(got.second_distance)
    )
    np.testing.assert_array_equal(
        np.asarray(ref.valid), np.asarray(got.valid)
    )
    np.testing.assert_array_equal(
        np.asarray(ref.best_idx), np.asarray(got.best_idx)
    )
    # second_idx must point AT second_distance in both paths (the index
    # itself may differ only under exact distance ties).
    from siftmetal_tpu.match.matcher import pairwise_sq_dists_u8

    for mm in (ref, got):
        d2 = np.asarray(
            pairwise_sq_dists_u8(q, t)
        ).astype(np.float64) / (255.0 * 255.0)
        d2[:, ~np.asarray(tv)] = np.inf
        picked = np.sqrt(
            np.take_along_axis(
                d2, np.asarray(mm.second_idx)[:, None], 1
            )[:, 0]
        )
        np.testing.assert_allclose(
            picked, np.asarray(mm.second_distance), rtol=1e-5
        )
