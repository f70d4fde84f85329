"""ctypes bindings for the native JPEG decode pool (native/decode_pool.cc).

The TPU-native stand-in for the reference's TF C++ decode_jpeg stage
(SURVEY.md §2.7): batch JPEG→fixed-size-RGB decode runs in real OS threads
behind ONE GIL-releasing C call, with libjpeg DCT-domain downscale. Falls
back gracefully (callers check `available()`) when the toolchain or libjpeg
is missing — the cv2/PIL path in pipeline.py remains the default.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO_ROOT / "native" / "decode_pool.cc"
_SO = _REPO_ROOT / "native" / "build" / "libdecode_pool.so"

_lib = None
_lib_err: str | None = None
_lock = threading.Lock()


def _build() -> None:
    _SO.parent.mkdir(parents=True, exist_ok=True)
    subprocess.run(
        [
            os.environ.get("CXX", "g++"),
            "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
            str(_SRC), "-o", str(_SO), "-ljpeg",
        ],
        check=True,
        capture_output=True,
        text=True,
    )


def _load():
    global _lib, _lib_err
    with _lock:
        if _lib is not None or _lib_err is not None:
            return _lib
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                _build()
            lib = ctypes.CDLL(str(_SO))
            lib.dp_create.restype = ctypes.c_void_p
            lib.dp_create.argtypes = [ctypes.c_int]
            lib.dp_destroy.argtypes = [ctypes.c_void_p]
            lib.dp_decode_batch.restype = ctypes.c_int
            lib.dp_decode_batch.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_long),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte),
            ]
            lib.dp_decode_batch_yuv420.restype = ctypes.c_int
            lib.dp_decode_batch_yuv420.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_long),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte),
                ctypes.POINTER(ctypes.c_ubyte),
            ]
            lib.dp_resize_yuv420_batch.restype = ctypes.c_int
            lib.dp_resize_yuv420_batch.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte),
                ctypes.POINTER(ctypes.c_ubyte),
            ]
            _lib = lib
        except Exception as e:  # missing toolchain/libjpeg → fallback path
            _lib_err = f"{type(e).__name__}: {e}"
        return _lib


def available() -> bool:
    return _load() is not None


class NativeDecoder:
    """Thread-pool JPEG decoder: bytes → (N, size, size, 3) uint8 RGB."""

    def __init__(self, num_threads: int = 8):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native decoder unavailable: {_lib_err}")
        self._lib = lib
        self._pool = lib.dp_create(num_threads)

    def decode_batch(self, jpegs: list[bytes], size: int) -> np.ndarray:
        n = len(jpegs)
        out = np.empty((n, size, size, 3), np.uint8)
        bufs = (ctypes.c_char_p * n)(*jpegs)
        lens = (ctypes.c_long * n)(*[len(j) for j in jpegs])
        nfail = self._lib.dp_decode_batch(
            self._pool, n, bufs, lens, size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        )
        if nfail:
            raise ValueError(f"{nfail}/{n} JPEGs failed to decode")
        return out

    def decode_batch_yuv420(
        self, jpegs: list[bytes], size: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """bytes → (Y (N, S, S), CbCr (N, S/2, S/2, 2)) uint8 planes.

        Half the bytes of RGB on the host→device wire; the device converts
        back to RGB inside the fused preprocess (augment.yuv420_to_rgb_batch).
        JPEG chroma is natively 4:2:0, so no source fidelity is lost."""
        assert size % 2 == 0, "yuv420 needs an even decode size"
        n = len(jpegs)
        out_y = np.empty((n, size, size), np.uint8)
        out_uv = np.empty((n, size // 2, size // 2, 2), np.uint8)
        bufs = (ctypes.c_char_p * n)(*jpegs)
        lens = (ctypes.c_long * n)(*[len(j) for j in jpegs])
        nfail = self._lib.dp_decode_batch_yuv420(
            self._pool, n, bufs, lens, size,
            out_y.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            out_uv.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        )
        if nfail:
            raise ValueError(f"{nfail}/{n} JPEGs failed to decode")
        return out_y, out_uv

    def resize_yuv420_batch(
        self, frames: np.ndarray, size: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Decoded RGB (N, H, W, 3) uint8 → resized planar (y, uv).

        The streaming hot path: bilinear resize + BT.601 conversion on the
        pool's OS threads behind one GIL-releasing call — replaces
        per-frame cv2.resize + numpy color math (infer video mode)."""
        assert size % 2 == 0, "yuv420 needs an even size"
        frames = np.ascontiguousarray(frames, dtype=np.uint8)
        n, h, w = frames.shape[:3]
        out_y = np.empty((n, size, size), np.uint8)
        out_uv = np.empty((n, size // 2, size // 2, 2), np.uint8)
        self._lib.dp_resize_yuv420_batch(
            self._pool, n,
            frames.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            h, w, size,
            out_y.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            out_uv.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        )
        return out_y, out_uv

    def __del__(self):
        pool = getattr(self, "_pool", None)
        if pool:
            self._lib.dp_destroy(pool)
            self._pool = None
