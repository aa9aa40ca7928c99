"""Dataset-layout parsers + benchmark runners on the committed mini
fixtures (tests/fixtures/{tum,hpatches}_mini).

The real TUM/HPatches datasets are egress-blocked in this environment
(ROADMAP.md); these tests pin the parsing contracts so
scripts/run_{tum,hpatches}.py work the moment real data lands.
"""

import json
import pathlib
import sys

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
FIXTURES = pathlib.Path(__file__).parent / "fixtures"

sys.path.insert(0, str(ROOT / "scripts"))

from siftmetal_tpu.utils.datasets import (
    associate_ate,
    hpatches_image_path,
    hpatches_sequences,
    load_gray,
    load_homography_rowcol,
    tum_frames,
    tum_groundtruth,
)


def test_tum_frames_parses_timestamps_and_paths():
    ts, paths = tum_frames(FIXTURES / "tum_mini")
    assert len(ts) == len(paths) == 3
    np.testing.assert_allclose(np.diff(ts), 0.5)
    for p in paths:
        assert pathlib.Path(p).exists(), p
    gray = load_gray(paths[0])
    assert gray.shape == (16, 24) and gray.dtype == np.float32
    assert 0.0 <= gray.min() and gray.max() <= 1.0


def test_tum_groundtruth_and_association():
    ts, paths = tum_frames(FIXTURES / "tum_mini")
    gt_ts, gt_pos = tum_groundtruth(FIXTURES / "tum_mini")
    assert gt_pos.shape == (3, 3)
    # Estimated == ground truth (up to similarity) => ATE ~ 0.
    cams = np.zeros((3, 6), dtype=np.float32)
    cams[:, 3] = -0.1 * np.arange(3)  # t = -R c, R = I
    cams[:, 4] = -0.05 * np.arange(3)
    ate, n = associate_ate(ts, cams, gt_ts, gt_pos)
    assert n == 3
    assert ate < 1e-6


def test_hpatches_discovery_and_homography_convention():
    seqs = hpatches_sequences(FIXTURES / "hpatches_mini")
    assert [s.name for s in seqs] == ["i_mini"]
    assert hpatches_image_path(seqs[0], 1).name == "1.ppm"
    h = load_homography_rowcol(seqs[0] / "H_1_2")
    np.testing.assert_allclose(h, np.eye(3), atol=0)
    # Convention check on a non-trivial H: x' = x + 3 (col shift) must
    # become col' = col + 3 => row-col H has the +3 in [1, 2].
    import tempfile

    hxy = np.eye(3)
    hxy[0, 2] = 3.0
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        np.savetxt(f.name, hxy)
        hrc = load_homography_rowcol(f.name)
    assert hrc[1, 2] == 3.0 and hrc[0, 2] == 0.0


@pytest.mark.slow
def test_run_hpatches_identity_pair_scores_high():
    import run_hpatches

    summary = run_hpatches.main(
        [str(FIXTURES / "hpatches_mini"), "--n-images", "2"]
    )
    # Identical images under identity H: repeatability ~ 1.
    assert summary["n_sequences"] == 1
    assert summary["mean_illumination"] > 0.95
