"""Dev helper: compute and cache butterfly DoG stacks to /tmp for fast
numpy-side iteration on detection numerics (not a test)."""

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from conftest import load_image  # noqa: E402  (forces CPU backend)

import jax  # noqa: E402
import numpy as np  # noqa: E402

from siftmetal_tpu.config import SiftConfig  # noqa: E402
from siftmetal_tpu.ops.image import rgb_to_gray  # noqa: E402
from siftmetal_tpu.sift.pyramid import build_pyramid  # noqa: E402
from siftmetal_tpu.sift.detect import extrema_mask  # noqa: E402

if __name__ == "__main__":
    cfg = SiftConfig()
    gray = rgb_to_gray(load_image("butterfly.png"))
    n_oct = cfg.num_octaves(*gray.shape)
    gaussians, dogs = jax.jit(build_pyramid, static_argnums=(1, 2))(
        gray, cfg, n_oct
    )
    out = {}
    for o in range(n_oct):
        out[f"g{o}"] = np.asarray(gaussians[o])
        out[f"d{o}"] = np.asarray(dogs[o])
        out[f"m{o}"] = np.asarray(jax.jit(extrema_mask)(dogs[o]))
    np.savez("/tmp/stacks.npz", n_oct=n_oct, **out)
    print("saved", n_oct, "octaves")
