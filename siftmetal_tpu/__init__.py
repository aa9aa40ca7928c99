"""siftmetal_tpu — a TPU-native SIFT + SfM framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
lukevanin/SIFTMetal (Swift + Metal, single-GPU), extended with the
two-view geometry, SfM/BA back-end, and multi-chip SPMD layers the
reference lacks. See README.md for the layer map and SURVEY.md for the
reference analysis this was built against.

Public entry points:

    from siftmetal_tpu import SIFT, SiftConfig
    sift = SIFT(height, width)
    keypoints, descriptors, counters = sift.extract(image)

    from siftmetal_tpu.match import match_bruteforce
    from siftmetal_tpu.geometry import find_homography, find_fundamental
    from siftmetal_tpu.slam import SfmMap, bundle_adjust
"""

from .config import DEFAULT_CONFIG, SiftConfig
from .sift.extract import SIFT, Descriptors, extract, extract_gray
from .sift.detect import Keypoints

__all__ = [
    "DEFAULT_CONFIG",
    "SIFT",
    "SiftConfig",
    "Descriptors",
    "Keypoints",
    "extract",
    "extract_gray",
]

__version__ = "0.1.0"
