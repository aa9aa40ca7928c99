"""On-hardware IPOL parity check (the CPU test suite's core assertions,
run against the REAL TPU backend).

The pytest suite runs on a forced-CPU mesh; this script confirms the TPU
compute path (fp32 shift-add convs, Pallas patch kernels) reproduces the
IPOL golden fixtures on the actual chip.

Usage: python benchmarks/parity_tpu.py   (from the repo root)
Env: PARITY_BLUR_PRECISION=high validates the 3-pass MXU blur mode.
"""

import dataclasses
import os
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from siftmetal_tpu.utils.bench_env import setup as _setup_bench_env

_setup_bench_env()  # persistent compile cache + tunnel warm-up thread

IPOL_STAGES = {
    "n_extrema": 3068,
    "n_soft": 2130,
    "n_interp": 1934,
    "n_hard": 1769,
    "n_border": 1304,
}


def main() -> int:
    import jax

    from siftmetal_tpu import SIFT
    from siftmetal_tpu.utils.io import load_image, read_descriptors

    print("backend:", jax.default_backend())
    img = load_image(str(REPO / "tests/fixtures/butterfly.png"))
    from siftmetal_tpu.config import SiftConfig

    config = SiftConfig()
    if os.environ.get("PARITY_BLUR_PRECISION"):
        config = dataclasses.replace(
            config,
            mxu_blur_precision=os.environ["PARITY_BLUR_PRECISION"],
        )
        print("mxu_blur_precision:", config.mxu_blur_precision)
    if os.environ.get("PARITY_ONESHOT"):
        config = dataclasses.replace(
            config,
            use_oneshot_pyramid=os.environ["PARITY_ONESHOT"] == "1",
        )
        print("use_oneshot_pyramid:", config.use_oneshot_pyramid)
    sift = SIFT(img.shape[0], img.shape[1], config)
    kps, descs, counters = sift.extract(img)

    failures = []
    for stage, expected in IPOL_STAGES.items():
        got = int(np.asarray(counters[stage]))
        ok = abs(got - expected) <= max(10, 0.01 * expected)
        print(f"{stage:12s} {got:5d} (IPOL {expected:5d}) {'OK' if ok else 'FAIL'}")
        if not ok:
            failures.append(stage)

    # Descriptor parity vs the IPOL fixture set.
    ref_keys, ref_feats = read_descriptors(
        str(REPO / "tests/fixtures/butterfly-descriptors.txt")
    )
    v = np.asarray(descs.valid)
    pts = np.stack([np.asarray(descs.x)[v], np.asarray(descs.y)[v]], 1)
    th = np.asarray(descs.theta)[v]
    feats = np.asarray(descs.features)[v].astype(np.float64)

    d2 = ((pts[None] - ref_keys[:, None, :2]) ** 2).sum(-1)
    dth = np.abs(
        np.mod(th[None] - ref_keys[:, 3, None] + np.pi, 2 * np.pi) - np.pi
    )
    dth = np.where(d2 < 0.05 ** 2, dth, np.inf)
    nearest = dth.argmin(1)
    matched = dth[np.arange(len(ref_keys)), nearest] < 0.05
    rel = np.linalg.norm(
        feats[nearest[matched]] - ref_feats[matched], axis=1
    ) / np.linalg.norm(ref_feats[matched], axis=1)
    frac = (rel < 0.1).mean()
    print(
        f"descriptors  {matched.sum():5d}/{len(ref_keys)} matched, "
        f"{frac:.1%} within 10% L2 "
        f"({'OK' if matched.mean() >= 0.93 and frac >= 0.98 else 'FAIL'})"
    )
    if matched.mean() < 0.93 or frac < 0.98:
        failures.append("descriptors")

    print("PARITY", "PASS" if not failures else f"FAIL: {failures}")
    return 0 if not failures else 1


if __name__ == "__main__":
    raise SystemExit(main())
