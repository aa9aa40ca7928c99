"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on faked CPU devices
(XLA_FORCE_HOST_PLATFORM_DEVICE_COUNT), mirroring SURVEY.md section 4's
recommendation; real-TPU execution is exercised separately by bench.py and
the driver's graft entry.
"""

import os

# The environment pins JAX_PLATFORMS=axon (the real-TPU tunnel) and the axon
# plugin ignores the env var, so force CPU through jax.config instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


def load_image(name: str) -> np.ndarray:
    """Load a PNG as float32 in [0, 1], shape [H, W, C] or [H, W]."""
    from PIL import Image

    with Image.open(FIXTURES / name) as im:
        arr = np.asarray(im, dtype=np.float32) / 255.0
    return arr


def load_keypoint_list(name: str) -> np.ndarray:
    """IPOL keypoint list: one 'row col sigma theta...' line per keypoint."""
    rows = []
    with open(FIXTURES / name) as f:
        for line in f:
            parts = line.split()
            if parts:
                rows.append([float(p) for p in parts[:4]])
    return np.asarray(rows, dtype=np.float32)


def load_descriptors(name: str = "butterfly-descriptors.txt"):
    """IPOL descriptor file: 'row col sigma theta f0..f127 orihist0..35'
    per line (168 columns; the trailing 36 are the orientation histogram).
    Returns (keys [N,4], features [N,128] int, ori_hists [N,36] float)."""
    keys, feats, hists = [], [], []
    with open(FIXTURES / name) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            keys.append([float(p) for p in parts[:4]])
            feats.append([int(float(p)) for p in parts[4:132]])
            hists.append([float(p) for p in parts[132:168]])
    return (
        np.asarray(keys, dtype=np.float32),
        np.asarray(feats, dtype=np.int32),
        np.asarray(hists, dtype=np.float32),
    )


@pytest.fixture(scope="session")
def butterfly() -> np.ndarray:
    return load_image("butterfly.png")


@pytest.fixture(scope="session")
def butterfly_extraction(butterfly):
    """ONE full SIFT extraction of the butterfly fixture shared by the
    detection- and descriptor-parity modules (each used to compile its
    own full pipeline at ~2 min per module on forced-CPU; the session
    scope pays it once — VERDICT r4 #8). Returns
    ``(keypoints, descriptors, counters)`` with int counters."""
    from siftmetal_tpu.config import SiftConfig
    from siftmetal_tpu.sift.extract import SIFT

    sift = SIFT(butterfly.shape[0], butterfly.shape[1], SiftConfig())
    kps, descs, counters = sift.extract(butterfly)
    return kps, descs, {k: int(v) for k, v in counters.items()}
