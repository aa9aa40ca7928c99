"""Image loading and the IPOL text interchange format.

Replaces the reference's CoreImage/CoreVideo interop
(/root/reference Sources/SIFTMetal/Utilities/ImageConversion.swift:14-47,
CoreVideoMetalCache.swift:12-33) with PIL/numpy ingest, and adopts the
IPOL descriptor text format as the serialization format (SURVEY.md §5
"worth adopting as an interchange format"; parsed by the reference's tests
at Tests/SIFTMetalTests/DescriptorTests.swift:176-216).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def load_image(path: str) -> np.ndarray:
    """PNG/JPEG -> float32 [H, W, C] (or [H, W]) in [0, 1], gamma space
    (the pipeline deliberately works on gamma-encoded values, matching the
    reference; DifferenceOfGaussians.swift:242-243)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im, dtype=np.float32) / 255.0


def save_image(path: str, image: np.ndarray) -> None:
    from PIL import Image

    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    Image.fromarray(img).save(path)


def write_keypoints(
    path: str,
    x: np.ndarray,
    y: np.ndarray,
    sigma: np.ndarray,
    theta: Optional[np.ndarray] = None,
    valid: Optional[np.ndarray] = None,
) -> int:
    """IPOL keypoint list: 'x y sigma theta' per line (x = row)."""
    sel = (
        np.asarray(valid).astype(bool)
        if valid is not None
        else np.ones(len(np.asarray(x)), dtype=bool)
    )
    th = np.asarray(theta) if theta is not None else np.zeros(len(sel))
    n = 0
    with open(path, "w") as f:
        for i in np.nonzero(sel)[0]:
            f.write(
                f"{float(x[i]):.6f} {float(y[i]):.6f} "
                f"{float(sigma[i]):.6f} {float(th[i]):.6f}\n"
            )
            n += 1
    return n


def read_keypoints(path: str) -> np.ndarray:
    """-> [N, 4] (x=row, y=col, sigma, theta)."""
    rows = []
    with open(path) as f:
        for line in f:
            p = line.split()
            if p:
                rows.append([float(v) for v in p[:4]])
    return np.asarray(rows, dtype=np.float32)


def write_descriptors(
    path: str,
    x: np.ndarray,
    y: np.ndarray,
    sigma: np.ndarray,
    theta: np.ndarray,
    features: np.ndarray,
    valid: Optional[np.ndarray] = None,
) -> int:
    """IPOL descriptor file: 'x y sigma theta f0..f127' per line."""
    sel = (
        np.asarray(valid).astype(bool)
        if valid is not None
        else np.ones(len(np.asarray(x)), dtype=bool)
    )
    feats = np.asarray(features)
    n = 0
    with open(path, "w") as f:
        for i in np.nonzero(sel)[0]:
            head = (
                f"{float(x[i]):.6f} {float(y[i]):.6f} "
                f"{float(sigma[i]):.6f} {float(theta[i]):.6f}"
            )
            body = " ".join(str(int(v)) for v in feats[i])
            f.write(head + " " + body + "\n")
            n += 1
    return n


def read_descriptors(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """-> (keys [N, 4], features [N, 128] uint8). Ignores any trailing
    columns (the IPOL demo appends the 36-bin orientation histogram)."""
    keys, feats = [], []
    with open(path) as f:
        for line in f:
            p = line.split()
            if not p:
                continue
            keys.append([float(v) for v in p[:4]])
            feats.append([int(float(v)) for v in p[4:132]])
    return (
        np.asarray(keys, dtype=np.float32),
        np.asarray(feats, dtype=np.uint8),
    )
