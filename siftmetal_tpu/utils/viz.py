"""Visual debugging: keypoint / match overlays.

TPU-framework equivalent of the reference's CoreGraphics renderer
(/root/reference Sources/SIFTMetal/Utilities/SIFTRenderer.swift:5-256:
drawKeypoints :11, drawDescriptors :77, drawMatches :113) using
matplotlib's Agg backend; functions return RGB uint8 arrays and can
optionally write PNGs.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def _figure_to_rgb(fig) -> np.ndarray:
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())
    return buf[..., :3].copy()


def _to_display(image: np.ndarray) -> np.ndarray:
    img = np.asarray(image)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    return img[..., :3]


def draw_keypoints(
    image: np.ndarray,
    x: np.ndarray,
    y: np.ndarray,
    sigma: np.ndarray,
    theta: Optional[np.ndarray] = None,
    valid: Optional[np.ndarray] = None,
    color: str = "lime",
    path: Optional[str] = None,
) -> np.ndarray:
    """Circles of radius sigma (+ orientation spokes) over the image.

    x = row, y = col (detector convention; SIFTRenderer.drawKeypoints
    analogue)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = _to_display(image)
    if valid is not None:
        sel = np.asarray(valid).astype(bool)
        x, y, sigma = np.asarray(x)[sel], np.asarray(y)[sel], np.asarray(sigma)[sel]
        theta = np.asarray(theta)[sel] if theta is not None else None

    h, w = img.shape[:2]
    fig = plt_figure_for(img)
    ax = fig.axes[0]
    for i in range(len(x)):
        c = plt.Circle(
            (y[i], x[i]), max(float(sigma[i]), 1.0),
            fill=False, color=color, linewidth=0.8,
        )
        ax.add_patch(c)
        if theta is not None:
            r = max(float(sigma[i]), 1.0)
            # theta measured from the row axis toward the col axis.
            ax.plot(
                [y[i], y[i] + r * np.sin(theta[i])],
                [x[i], x[i] + r * np.cos(theta[i])],
                color=color, linewidth=0.8,
            )
    out = _figure_to_rgb(fig)
    if path:
        import matplotlib.pyplot as plt

        fig.savefig(path, dpi=100)
    import matplotlib.pyplot as plt

    plt.close(fig)
    return out


def plt_figure_for(img: np.ndarray):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    h, w = img.shape[:2]
    fig = plt.figure(figsize=(w / 100, h / 100), dpi=100)
    ax = fig.add_axes([0, 0, 1, 1])
    ax.imshow(img)
    ax.set_xlim(0, w)
    ax.set_ylim(h, 0)
    ax.axis("off")
    return fig


def draw_descriptors(
    image: np.ndarray,
    x: np.ndarray,
    y: np.ndarray,
    sigma: np.ndarray,
    theta: np.ndarray,
    valid: Optional[np.ndarray] = None,
    n_histograms: int = 4,
    color: str = "orange",
    path: Optional[str] = None,
) -> np.ndarray:
    """Rotated 4x4 descriptor sampling grids over the image
    (SIFTRenderer.drawDescriptors analogue, SIFTRenderer.swift:77-111).

    Each keypoint gets its oriented descriptor footprint: a square of
    side ``n_histograms * 3 * sigma`` (the per-cell width 3*sigma matches
    the descriptor kernel's histogramWidth, SIFTDescriptor.metal:160-166)
    rotated by theta, with the interior cell gridlines drawn. x = row,
    y = col (detector convention, as draw_keypoints)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = _to_display(image)
    if valid is not None:
        sel = np.asarray(valid).astype(bool)
        x, y = np.asarray(x)[sel], np.asarray(y)[sel]
        sigma, theta = np.asarray(sigma)[sel], np.asarray(theta)[sel]

    fig = plt_figure_for(img)
    ax = fig.axes[0]
    for i in range(len(x)):
        half = 0.5 * n_histograms * 3.0 * max(float(sigma[i]), 1.0)
        ct, st = np.cos(float(theta[i])), np.sin(float(theta[i]))
        # Grid lines in the keypoint frame (u along theta, v across),
        # mapped to image coords: row = x + u*ct - v*st, col = y + u*st
        # + v*ct (theta measured from the row axis toward the col axis,
        # matching draw_keypoints' spokes).
        ts = np.linspace(-half, half, n_histograms + 1)
        for t in ts:
            for (u0, v0, u1, v1) in (
                (t, -half, t, half),  # lines across v
                (-half, t, half, t),  # lines across u
            ):
                r0, c0 = x[i] + u0 * ct - v0 * st, y[i] + u0 * st + v0 * ct
                r1, c1 = x[i] + u1 * ct - v1 * st, y[i] + u1 * st + v1 * ct
                ax.plot([c0, c1], [r0, r1], color=color, linewidth=0.5)
        # Orientation spoke from center to the grid edge.
        ax.plot(
            [y[i], y[i] + half * st], [x[i], x[i] + half * ct],
            color=color, linewidth=0.8,
        )
    out = _figure_to_rgb(fig)
    if path:
        fig.savefig(path, dpi=100)
    plt.close(fig)
    return out


def draw_matches(
    image_a: np.ndarray,
    xy_a: np.ndarray,
    image_b: np.ndarray,
    xy_b: np.ndarray,
    pairs: Sequence[Tuple[int, int]],
    path: Optional[str] = None,
) -> np.ndarray:
    """Side-by-side correspondence rendering (drawMatches analogue):
    xy_* are [N, 2] (row, col); pairs are (idx_a, idx_b)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    a = _to_display(image_a)
    b = _to_display(image_b)
    h = max(a.shape[0], b.shape[0])
    canvas = np.zeros((h, a.shape[1] + b.shape[1], 3), dtype=np.uint8)
    canvas[: a.shape[0], : a.shape[1]] = a
    canvas[: b.shape[0], a.shape[1]:] = b
    off = a.shape[1]

    fig = plt_figure_for(canvas)
    ax = fig.axes[0]
    cmap = plt.get_cmap("hsv")
    for n, (i, j) in enumerate(pairs):
        color = cmap((n * 0.61803) % 1.0)
        ax.plot(
            [xy_a[i][1], xy_b[j][1] + off],
            [xy_a[i][0], xy_b[j][0]],
            color=color, linewidth=0.6,
        )
    out = _figure_to_rgb(fig)
    if path:
        fig.savefig(path, dpi=100)
    plt.close(fig)
    return out
