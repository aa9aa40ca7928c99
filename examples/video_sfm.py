"""End-to-end demo: frames -> SIFT -> matching -> incremental SfM -> ATE.

Runs on any backend (CPU included). Generates a synthetic textured scene,
renders a camera sweep, extracts SIFT on every frame, reconstructs the
trajectory with the incremental SfM driver, bundle-adjusts, and reports
reprojection RMS + ATE against the ground-truth trajectory. Also writes
keypoint/match visualizations and a TUM-format trajectory.

Usage:
    python examples/video_sfm.py [out_dir]
"""

import pathlib
import sys

# Allow running straight from a source checkout: put the repo root on the
# path (the package also installs normally via pyproject.toml).
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp


def textured_scene(rng, n_blobs=2500):
    """A wall of small Gaussian blobs at varying depths (z in [6, 9])."""
    centers = rng.uniform([-6, -4, 6], [6, 4, 9], (n_blobs, 3))
    amps = rng.uniform(0.4, 1.0, n_blobs) * rng.choice(
        [-1.0, 1.0], n_blobs
    )
    widths = rng.uniform(1.5, 6.0, n_blobs)  # blob radius in PIXELS
    return centers, amps, widths


def render(cam, k, centers, amps, widths, h, w):
    """Crude splat renderer: project blob centers, draw Gaussians."""
    from siftmetal_tpu.slam.camera import project

    uv = np.asarray(
        jax.vmap(lambda p: project(jnp.asarray(cam), jnp.asarray(k), p))(
            jnp.asarray(centers.astype(np.float32))
        )
    )
    img = np.full((h, w), 0.5, dtype=np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for (u, v), a, r in zip(uv, amps, widths):
        if not (-20 < u < w + 20 and -20 < v < h + 20):
            continue
        sel = (np.abs(xx - u) < 3 * r) & (np.abs(yy - v) < 3 * r)
        img[sel] += 0.25 * a * np.exp(
            -((xx[sel] - u) ** 2 + (yy[sel] - v) ** 2) / (2 * r * r)
        )
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def main(out_dir="/tmp/video_sfm"):
    from siftmetal_tpu import SIFT, SiftConfig
    from siftmetal_tpu.slam.sfm import SfmConfig, SfmMap
    from siftmetal_tpu.slam.trajectory import ate_rmse, camera_centers
    from siftmetal_tpu.utils.checkpoint import save_map, save_trajectory_tum
    from siftmetal_tpu.utils.viz import draw_keypoints

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    h, w = 240, 320
    k = np.array(
        [[260, 0, w / 2], [0, 260, h / 2], [0, 0, 1]], dtype=np.float32
    )

    centers, amps, widths = textured_scene(rng)
    n_frames = 5
    cams = np.zeros((n_frames, 6), dtype=np.float32)
    cams[:, 3] = np.linspace(0, 1.2, n_frames)       # truck right
    cams[:, 1] = np.linspace(0, 0.06, n_frames)      # slight pan

    print("rendering + extracting...")
    sift = SIFT(h, w, SiftConfig(max_descriptors=4096))
    frames = []
    for i in range(n_frames):
        img = render(cams[i], k, centers, amps, widths, h, w)
        kps, descs, counters = sift.extract(img)
        frames.append(
            (
                jnp.stack([descs.x, descs.y], axis=1),
                descs.features,
                descs.valid,
            )
        )
        n = int(np.asarray(descs.valid).sum())
        print(f"  frame {i}: {n} descriptors")
        if i == 0:
            v = np.asarray(descs.valid)
            draw_keypoints(
                img,
                np.asarray(descs.x)[v],
                np.asarray(descs.y)[v],
                np.asarray(descs.sigma)[v],
                np.asarray(descs.theta)[v],
                path=str(out / "frame0_keypoints.png"),
            )

    print("reconstructing...")
    smap = SfmMap(k, SfmConfig(max_cameras=8, match_ratio_threshold=0.8))
    n0 = smap.initialize(frames[0], frames[1])
    print(f"  bootstrap: {n0} landmarks")
    for i, f in enumerate(frames[2:], start=2):
        ok, n_in, n_new = smap.add_frame(f)
        if not ok:
            print(f"  frame {i}: tracking failed ({n_in} inliers), skipped")
            continue
        print(f"  frame {i}: {n_in} PnP inliers, {n_new} new landmarks")
    stats = smap.bundle_adjust()
    print(
        f"  BA cost {float(stats.initial_cost):.1f} -> "
        f"{float(stats.final_cost):.1f}; reproj RMS "
        f"{smap.reprojection_rms():.3f}px"
    )

    est = camera_centers(smap.cameras[: smap.n_cameras])
    gt = camera_centers(cams)
    ate = ate_rmse(est, gt)
    print(f"  ATE (similarity-aligned): {ate:.4f} (baseline 1.2 units)")

    save_map(str(out / "map.npz"), smap)
    save_trajectory_tum(
        str(out / "trajectory_tum.txt"), np.arange(n_frames) * 0.1,
        smap.cameras[: smap.n_cameras],
    )
    print(f"artifacts in {out}")
    return ate


if __name__ == "__main__":
    ate = main(*(sys.argv[1:] or []))
    assert ate < 0.1, f"trajectory diverged: ATE {ate}"
    print("OK")
