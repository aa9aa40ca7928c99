"""Generator for the committed procedural test images (proc_*.png).

No network egress is available in the build environment, so the
repeatability battery runs on deterministic procedural images with a
natural-image-like spectrum instead of Oxford/HPatches downloads:
multi-octave value noise (1/f-ish power spectrum) composited with
geometric structures (discs, bars, gradients) that give SIFT corners and
blobs at many scales. Re-running this script reproduces the committed
PNGs bit-exactly (fixed seeds).
"""

import pathlib

import numpy as np


def _value_noise(rng, h, w, octaves=6, persistence=0.55):
    img = np.zeros((h, w), np.float64)
    amp = 1.0
    for o in range(octaves):
        gh = max(2, h >> (octaves - 1 - o))
        gw = max(2, w >> (octaves - 1 - o))
        grid = rng.uniform(-1, 1, (gh, gw))
        yi = np.linspace(0, gh - 1, h)
        xi = np.linspace(0, gw - 1, w)
        y0 = np.floor(yi).astype(int)
        x0 = np.floor(xi).astype(int)
        y1 = np.minimum(y0 + 1, gh - 1)
        x1 = np.minimum(x0 + 1, gw - 1)
        fy = (yi - y0)[:, None]
        fx = (xi - x0)[None, :]
        fy = fy * fy * (3 - 2 * fy)
        fx = fx * fx * (3 - 2 * fx)
        a = grid[np.ix_(y0, x0)]
        b = grid[np.ix_(y0, x1)]
        c = grid[np.ix_(y1, x0)]
        d = grid[np.ix_(y1, x1)]
        img += amp * ((a * (1 - fx) + b * fx) * (1 - fy)
                      + (c * (1 - fx) + d * fx) * fy)
        amp *= persistence
    return img


def _shapes(rng, h, w, n=60):
    img = np.zeros((h, w), np.float64)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    for _ in range(n):
        kind = rng.integers(0, 3)
        cy, cx = rng.uniform(0, h), rng.uniform(0, w)
        amp = rng.uniform(-0.6, 0.6)
        if kind == 0:      # disc
            r = rng.uniform(3, 40)
            img += amp * ((yy - cy) ** 2 + (xx - cx) ** 2 < r * r)
        elif kind == 1:    # rotated bar
            th = rng.uniform(0, np.pi)
            wl = rng.uniform(2, 12)
            ln = rng.uniform(20, 120)
            u = (yy - cy) * np.cos(th) + (xx - cx) * np.sin(th)
            v = -(yy - cy) * np.sin(th) + (xx - cx) * np.cos(th)
            img += amp * ((np.abs(u) < wl) & (np.abs(v) < ln))
        else:              # gaussian blob
            s = rng.uniform(4, 30)
            img += amp * np.exp(
                -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s)
            )
    return img


def make(seed: int, h: int = 480, w: int = 640) -> np.ndarray:
    rng = np.random.default_rng(seed)
    img = 0.7 * _value_noise(rng, h, w) + _shapes(rng, h, w)
    lo, hi = np.percentile(img, [1, 99])
    img = np.clip((img - lo) / (hi - lo), 0, 1)
    return (img * 255).astype(np.uint8)


if __name__ == "__main__":
    from PIL import Image

    out = pathlib.Path(__file__).parent
    for name, seed in [("proc_a", 7), ("proc_b", 21), ("proc_c", 99)]:
        Image.fromarray(make(seed)).save(out / f"{name}.png")
        print(name, "written")
