"""Two-image matching demo: extract, match, RANSAC-verify, visualize.

The end-user workflow the reference demonstrates in its DescriptorTests
(extract -> match -> draw correspondences), plus the homography
verification it lacks. Works on any backend.

Usage:
    python examples/match_pair.py image_a image_b [out_dir]
    python examples/match_pair.py            # butterfly vs rotated butterfly
"""

import pathlib
import sys

# Allow running straight from a source checkout: put the repo root on the
# path (the package also installs normally via pyproject.toml).
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp


def main(path_a=None, path_b=None, out_dir="/tmp/match_pair"):
    from siftmetal_tpu import SIFT, SiftConfig
    from siftmetal_tpu.geometry import find_homography
    from siftmetal_tpu.match import geometry_score, match_bruteforce
    from siftmetal_tpu.ops.image import rgb_to_gray
    from siftmetal_tpu.ops.warp import similarity_homography, warp_perspective
    from siftmetal_tpu.utils.io import load_image
    from siftmetal_tpu.utils.viz import draw_matches

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    if path_a is None:
        path_a = str(
            pathlib.Path(__file__).parents[1]
            / "tests" / "fixtures" / "butterfly.png"
        )
    img_a = load_image(path_a)
    gray_a = np.asarray(rgb_to_gray(img_a)) if img_a.ndim == 3 else img_a

    if path_b is None:
        h, w = gray_a.shape
        hmat = similarity_homography(
            np.deg2rad(20.0), 0.95, center=(h / 2, w / 2)
        )
        gray_b = np.asarray(
            warp_perspective(jnp.asarray(gray_a), jnp.asarray(hmat), (h, w))
        )
        print("image B = A rotated 20deg, scaled 0.95")
    else:
        img_b = load_image(path_b)
        gray_b = np.asarray(rgb_to_gray(img_b)) if img_b.ndim == 3 else img_b

    sift_a = SIFT(*gray_a.shape)
    sift_b = (
        sift_a if gray_a.shape == gray_b.shape else SIFT(*gray_b.shape)
    )
    _, da, _ = sift_a.extract(gray_a)
    _, db, _ = sift_b.extract(gray_b)
    na = int(np.asarray(da.valid).sum())
    nb = int(np.asarray(db.valid).sum())
    print(f"descriptors: A {na}, B {nb}")

    m = match_bruteforce(da.features, db.features, da.valid, db.valid)
    n_m = int(m.count)
    print(f"putative matches: {n_m}")

    xy_a = jnp.stack([da.x, da.y], axis=1)
    xy_b = jnp.stack([db.x, db.y], axis=1)
    gscore = float(geometry_score(m, xy_a, xy_b))
    print(f"geometry-consistency score: {gscore:.3f}")

    src = xy_a
    dst = xy_b[m.target_idx]
    res = find_homography(
        jax.random.PRNGKey(0), src, dst, m.valid, inlier_threshold=3.0
    )
    n_in = int(res.n_inliers)
    print(f"RANSAC homography inliers: {n_in}/{n_m}")

    inl = np.asarray(res.inliers)
    pairs = [
        (i, int(np.asarray(m.target_idx)[i]))
        for i in np.nonzero(inl)[0][:150]
    ]
    draw_matches(
        gray_a, np.asarray(xy_a), gray_b, np.asarray(xy_b), pairs,
        path=str(out / "matches.png"),
    )
    print(f"wrote {out / 'matches.png'}")
    return n_m, n_in, gscore


if __name__ == "__main__":
    args = sys.argv[1:]
    n_m, n_in, gscore = main(*args)
    if len(args) == 0:  # self-test mode
        assert n_m > 300, n_m
        assert n_in > 0.8 * n_m, (n_in, n_m)
        assert gscore > 0.8, gscore
        print("OK")
