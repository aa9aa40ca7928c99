from .extract import SIFT, Descriptors, extract, extract_gray
from .detect import Keypoints, detect, gather_keypoints
from .pyramid import build_pyramid

__all__ = [
    "SIFT", "Descriptors", "Keypoints", "extract", "extract_gray",
    "detect", "gather_keypoints", "build_pyramid",
]
