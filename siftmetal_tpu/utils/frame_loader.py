"""ctypes binding for the native frame-ingest library (native/frameloader.cpp).

The C++ runtime does what the reference's CoreVideo/CoreImage utilities do
(/root/reference Sources/SIFTMetal/Utilities/CoreVideoMetalCache.swift:12-33,
ImageConversion.swift:14-47) for a TPU host: decode + pixel-convert frames
on CPU worker threads into float32 grayscale buffers ready for one
``jax.device_put`` per batch. Falls back to a pure-Python (PIL) path when
the shared library hasn't been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_LIB_PATH = (
    pathlib.Path(__file__).resolve().parents[2] / "native" / "libframeloader.so"
)
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.fl_rgb_to_gray_f32.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_void_p,
    ]
    lib.fl_bgra_to_gray_f32.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
    ]
    lib.fl_yuv420_y_to_gray_f32.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_void_p,
    ]
    lib.fl_load_pnm_gray.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.fl_load_pnm_gray.restype = ctypes.c_int
    lib.fl_loader_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.fl_loader_create.restype = ctypes.c_void_p
    lib.fl_loader_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.fl_loader_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.fl_loader_next.restype = ctypes.c_int
    lib.fl_loader_error_count.argtypes = [ctypes.c_void_p]
    lib.fl_loader_error_count.restype = ctypes.c_int
    lib.fl_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def build(quiet: bool = True) -> bool:
    """Compile the shared library with the repo Makefile; returns success."""
    native = _LIB_PATH.parent
    try:
        subprocess.run(
            ["make", "-C", str(native)],
            check=True,
            capture_output=quiet,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    return _load() is not None


def native_available() -> bool:
    return _load() is not None


def rgb_to_gray(rgb: np.ndarray) -> np.ndarray:
    """uint8 [H, W, 3|4] -> float32 [H, W] gray (BT.709, gamma space)."""
    lib = _load()
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w, c = rgb.shape
    if lib is None:
        arr = rgb[..., :3].astype(np.float32) / 255.0
        weights = np.array(
            [0.212639005871510, 0.715168678767756, 0.072192315360734],
            dtype=np.float32,
        )
        return arr @ weights
    out = np.empty((h, w), dtype=np.float32)
    lib.fl_rgb_to_gray_f32(
        rgb.ctypes.data, h * w, c, out.ctypes.data
    )
    return out


def bgra_to_gray(bgra: np.ndarray) -> np.ndarray:
    lib = _load()
    bgra = np.ascontiguousarray(bgra, dtype=np.uint8)
    h, w, _ = bgra.shape
    if lib is None:
        return rgb_to_gray(bgra[..., [2, 1, 0]])
    out = np.empty((h, w), dtype=np.float32)
    lib.fl_bgra_to_gray_f32(bgra.ctypes.data, h * w, out.ctypes.data)
    return out


def yuv420_to_gray(y_plane: np.ndarray, video_range: bool = False) -> np.ndarray:
    lib = _load()
    y_plane = np.ascontiguousarray(y_plane, dtype=np.uint8)
    if lib is None:
        y = y_plane.astype(np.float32)
        if video_range:
            return np.clip((y - 16.0) / 219.0, 0.0, 1.0)
        return y / 255.0
    out = np.empty(y_plane.shape, dtype=np.float32)
    lib.fl_yuv420_y_to_gray_f32(
        y_plane.ctypes.data, y_plane.size, int(video_range), out.ctypes.data
    )
    return out


def load_pnm_gray(path: str) -> np.ndarray:
    """PGM/PPM file -> float32 [H, W] gray via the native decoder."""
    lib = _load()
    if lib is None:
        from PIL import Image

        with Image.open(path) as im:
            arr = np.asarray(im, dtype=np.uint8)
        if arr.ndim == 3:
            return rgb_to_gray(arr)
        return arr.astype(np.float32) / 255.0
    max_px = 64 * 1024 * 1024
    out = np.empty(max_px, dtype=np.float32)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.fl_load_pnm_gray(
        path.encode(), out.ctypes.data, max_px, ctypes.byref(w), ctypes.byref(h)
    )
    if rc != 0:
        raise IOError(f"fl_load_pnm_gray({path}) -> {rc}")
    return out[: w.value * h.value].reshape(h.value, w.value).copy()


class FrameLoader:
    """Multithreaded prefetching PNM batch loader (native threads).

    Usage:
        fl = FrameLoader(480, 640, n_threads=8)
        fl.submit_all(paths)
        batch = fl.next_batch(8)   # [8, 480, 640] float32
    """

    def __init__(self, height: int, width: int, n_threads: int = 4):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native frameloader not built; run make -C native "
                "(or use utils.io.load_image)"
            )
        self._lib = lib
        self.height = height
        self.width = width
        self._h = lib.fl_loader_create(width, height, n_threads)

    def submit(self, path: str) -> None:
        self._lib.fl_loader_submit(self._h, path.encode())

    def submit_all(self, paths: Sequence[str]) -> None:
        for p in paths:
            self.submit(p)

    def next_frame(self) -> np.ndarray:
        out = np.empty((self.height, self.width), dtype=np.float32)
        rc = self._lib.fl_loader_next(self._h, out.ctypes.data)
        if rc != 0:
            raise RuntimeError("no pending frames")
        return out

    def next_batch(self, n: int) -> np.ndarray:
        return np.stack([self.next_frame() for _ in range(n)])

    @property
    def error_count(self) -> int:
        return self._lib.fl_loader_error_count(self._h)

    def close(self) -> None:
        if self._h:
            self._lib.fl_loader_destroy(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
