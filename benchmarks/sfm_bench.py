"""SfM back-end throughput + trajectory quality on the 208-keyframe orbit.

The front-end (SIFT extraction) has carried the repo's only performance
number; this gives the SfM back-end one (VERDICT r4 #9): keyframes/s
through the full incremental driver — PnP registration, guided
re-matching, triangulation + merge/cull defenses, local-window BA every
8 keyframes, gated loop-closure detection at the end — plus the base
ATE the r4 flagship test asserts.

Scene: the same 208-keyframe cylinder-wall orbit as
tests/test_sfm.py::test_long_sequence_sfm_200_keyframes.

Usage: python benchmarks/sfm_bench.py [--plain-init] [--frames N]
  --plain-init  bootstrap from the first two frames (pre-r5 behavior)
                instead of the delayed wide-pair bootstrap.

Backend: forced CPU — the driver is a host loop of many small jitted
steps, and the remote-TPU tunnel's per-call latency (~1 ms) would
measure the tunnel, not the algorithm; on-host CPU is representative of
the orchestration cost the back-end actually pays.
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from siftmetal_tpu.slam.camera import project  # noqa: E402
from siftmetal_tpu.slam.sfm import SfmConfig, SfmMap  # noqa: E402
from siftmetal_tpu.slam.trajectory import (  # noqa: E402
    ate_rmse,
    camera_centers,
)


def build_scene(n_frames=208, n_lm=4000, seed=23):
    rng = np.random.default_rng(seed)
    k = np.array([[400, 0, 320], [0, 400, 240], [0, 0, 1]], np.float32)
    ang = rng.uniform(0, 2 * np.pi, n_lm)
    lms = np.stack(
        [10 * np.cos(ang), rng.uniform(-3, 3, n_lm), 10 * np.sin(ang)],
        axis=1,
    ).astype(np.float32)
    descs = rng.integers(0, 200, (n_lm, 128)).astype(np.uint8)
    cams = np.zeros((n_frames, 6), np.float32)
    for f in range(n_frames):
        yaw = 2 * np.pi * f / (n_frames - 2)
        cams[f, 1] = yaw
        cams[f, 3] = 3.0 * np.sin(yaw)
        cams[f, 5] = 3.0 * (1 - np.cos(yaw))
    frames = []
    for f in range(n_frames):
        uvs = np.asarray(
            jax.vmap(
                lambda p, f=f: project(jnp.asarray(cams[f]), jnp.asarray(k), p)
            )(jnp.asarray(lms))
        )
        depth = SfmMap._depths(cams[f], lms)
        inside = (
            (depth > 1.0)
            & (uvs[:, 0] > 0) & (uvs[:, 0] < 640)
            & (uvs[:, 1] > 0) & (uvs[:, 1] < 480)
        )
        uvs = uvs + rng.normal(0, 0.2, uvs.shape)
        xy = uvs[:, ::-1].copy()
        frames.append(
            (
                jnp.asarray(xy.astype(np.float32)),
                jnp.asarray(descs),
                jnp.asarray(inside),
            )
        )
    return k, cams, frames


def main():
    plain = "--plain-init" in sys.argv[1:]
    n_frames = 208
    for i, a in enumerate(sys.argv[1:]):
        if a == "--frames":
            n_frames = int(sys.argv[2 + i])
    k, cams, frames = build_scene(n_frames=n_frames)
    cfg = SfmConfig(new_landmarks_per_frame=256)
    smap = SfmMap(k, cfg)

    t0 = time.perf_counter()
    if plain:
        smap.initialize(frames[0], frames[1])
        start = 2
    else:
        w, n0 = smap.initialize_delayed(frames[: cfg.bootstrap_max_delay + 1])
        print(json.dumps({"bootstrap_pair": [0, int(w)], "n_init": int(n0)}))
        start = 1
    n_fail = 0
    for fi, f in enumerate(frames[start:], start=start):
        ok, n_in, _ = smap.add_frame(f)
        if not ok:
            n_fail += 1
            continue
        if fi % 8 == 0:
            smap.bundle_adjust(window=16)
    edges = smap.detect_loop_closures()
    if edges:
        smap.optimize_pose_graph(loop_closures=edges, n_iterations=60)
    dt = time.perf_counter() - t0

    n = smap.n_cameras
    base_ate = ate_rmse(
        camera_centers(smap.cameras[:n]), camera_centers(cams[: n])
    )
    alive = smap.lm_alive[: smap.n_landmarks]
    d = smap.lm_desc[: smap.n_landmarks][alive]
    _, counts = np.unique(d, axis=0, return_counts=True)
    dup_frac = float(counts.sum() - len(counts)) / max(int(alive.sum()), 1)
    print(
        json.dumps(
            {
                "metric": "sfm_keyframes_per_s",
                "value": round(n / dt, 2),
                "unit": "keyframes/s (CPU host loop)",
                "n_keyframes": n,
                "n_failed": n_fail,
                "wall_s": round(dt, 1),
                "ate": round(float(base_ate), 4),
                "dup_frac": round(dup_frac, 4),
                "n_landmarks_alive": int(alive.sum()),
                "n_closure_edges": len(edges),
                "closure_min_target": (
                    min(e[0] for e in edges) if edges else None
                ),
                "init": "plain" if plain else "delayed",
            }
        )
    )


if __name__ == "__main__":
    main()
