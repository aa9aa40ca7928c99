"""Detection parity vs the IPOL stage fixtures.

The reference ships stage-by-stage IPOL keypoint dumps
(Tests/SIFTMetalTests/Resources/extra_*.txt) but never asserts on them
(KeypointTests.swift:15-87 is a visual check only). Here every stage is
asserted numerically: counts within 1% of IPOL's, and positions/sigmas of
the final keypoint set matching the reference list to sub-0.1px.
"""

import numpy as np
import pytest

import jax

from siftmetal_tpu.config import SiftConfig
from siftmetal_tpu.sift.detect import extrema_mask

from conftest import load_image, load_keypoint_list

CFG = SiftConfig()

# IPOL stage counts for butterfly.png (fixture line counts; see BASELINE.md).
IPOL_COUNTS = {
    "n_extrema": 3068,
    "n_soft": 2130,
    "n_interp": 1934,
    "n_hard": 1769,
    "n_edge": 1304,
    "n_border": 1304,
}


@pytest.fixture(scope="module")
def detection(butterfly_extraction):
    # Shares the session-scoped full extraction (conftest) instead of
    # compiling a second pyramid+detect program: SIFT.extract routes
    # through the batched pipeline at B=1, whose equality with the
    # single-frame detect() path is asserted by tests/test_parallel.py.
    kps, _descs, counters = butterfly_extraction
    return kps, counters


def test_stage_counts_match_ipol(detection):
    _, counters = detection
    assert counters["overflow"] == 0
    for stage, expected in IPOL_COUNTS.items():
        got = counters[stage]
        # Float-path differences flip only borderline extrema; 1% slack.
        assert abs(got - expected) <= max(10, 0.01 * expected), (
            stage,
            got,
            expected,
        )


def test_final_keypoints_match_ipol(detection):
    kps, _ = detection
    valid = np.asarray(kps.valid)
    pts = np.stack(
        [np.asarray(kps.x)[valid], np.asarray(kps.y)[valid]], axis=1
    )
    sigma = np.asarray(kps.sigma)[valid]
    ref = load_keypoint_list("extra_OnEdgeResp_butterfly.txt")

    # Every IPOL keypoint must be reproduced almost exactly.
    d2 = ((pts[None, :, :] - ref[:, None, :2]) ** 2).sum(-1)
    nearest = d2.argmin(axis=1)
    dist = np.sqrt(d2[np.arange(len(ref)), nearest])
    matched = dist < 0.1
    assert matched.mean() >= 0.995, matched.mean()
    sig_err = np.abs(sigma[nearest[matched]] - ref[matched, 2]) / ref[
        matched, 2
    ]
    assert np.quantile(sig_err, 0.99) < 1e-3


def test_extrema_mask_synthetic():
    # A single bright spike in an otherwise flat stack is the only extremum
    # (plus the strict-minimum ring it induces must NOT fire on flat ties).
    dog = np.zeros((3, 8, 8), dtype=np.float32)
    dog[1, 4, 4] = 1.0
    m = np.asarray(extrema_mask(jax.numpy.asarray(dog)))
    assert m[0, 3, 3]  # (s=1, i=4, j=4)
    assert m.sum() == 1


def test_detect_counters_are_consistent(detection):
    _, c = detection
    assert (
        c["n_extrema"]
        >= c["n_soft"]
        >= c["n_interp"]
        >= c["n_hard"]
        >= c["n_edge"]
        >= c["n_border"]
    )


def test_fast_preset_detects(butterfly):
    """FAST preset (delta_min=1, no oversampling): fewer but sane
    keypoints, sigmas starting at sigma_min*2^(1/n)."""
    from siftmetal_tpu.config import FAST_CONFIG
    from siftmetal_tpu.sift.extract import SIFT

    cfg = FAST_CONFIG
    sift = SIFT(butterfly.shape[0], butterfly.shape[1], cfg)
    kps, descs, counters = sift.extract(butterfly)
    n = int(np.asarray(kps.valid).sum())
    # Same absolute sigma ladder as the default config, evaluated on a 2x
    # coarser grid — similar keypoint counts, ~4x less pixel work.
    assert 200 < n < 2500, n
    v = np.asarray(kps.valid)
    sig = np.asarray(kps.sigma)[v]
    assert sig.min() > 0.8
    assert int(np.asarray(descs.valid).sum()) >= n


def test_shared_mover_budget_covers_measured_demand():
    """The cross-octave fused tail walks ALL octaves' movers in one
    block (detect.mover_budget_all). Regression guard for the r3->r4
    hardware parity break: sized from octave 0 alone (384 lanes) the
    block dropped 374 of the butterfly fixture's 603 movers and the
    IPOL stage counts failed ON HARDWARE (the CPU suite runs the
    per-octave path and cannot see it). Pin the rule's output against
    the measured demands with headroom."""
    from siftmetal_tpu.sift.detect import mover_budget_all

    cfg = SiftConfig()

    def shapes_for(h, w):
        out = []
        hh, ww = 2 * h, 2 * w  # delta_min=0.5 seed
        for _ in range(cfg.num_octaves(h, w)):
            out.append((hh, ww))
            hh //= 2
            ww //= 2
        return out

    # Butterfly fixture (512x340): measured demand 603 movers (v5e,
    # 2026-08-20). Noise 640x480: measured 107-136.
    assert mover_budget_all(cfg, shapes_for(340, 512)) >= int(603 * 1.2)
    assert mover_budget_all(cfg, shapes_for(480, 640)) >= int(136 * 1.2)
