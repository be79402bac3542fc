"""Native IO runtime: ctypes bindings + on-demand g++ build.

``load_batch`` is the C++ threaded decode/preprocess pipeline
(``io_runtime.cc``); the Python pipeline falls back to the cv2 path when the
native library cannot be built (no compiler / headers). The library builds
once per machine into a cache keyed by the source hash
(``$I2VSGG_CACHE_DIR`` or ``~/.cache/i2vsgg``) — never committed, so a fresh
clone always builds for the local toolchain, and a source edit always
triggers a rebuild (content hash, not mtime: git does not preserve mtimes).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "io_runtime.cc")

_lib = None
_lock = threading.Lock()
_build_error: Optional[str] = None


def _so_path() -> str:
    cache = os.environ.get(
        "I2VSGG_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "i2vsgg"))
    with open(_SRC, "rb") as f:
        tag = hashlib.sha1(f.read()).hexdigest()[:12]
    return os.path.join(cache, f"libi2vsgg_io-{tag}.so")


def _build(so: str) -> Optional[str]:
    # no -march=native: the cache dir may be shared (NFS home) and a SIGILL
    # from an incompatible binary cannot be caught; -O3 generic keeps the
    # decode/resize loops fast enough (libjpeg/libpng dominate anyway)
    os.makedirs(os.path.dirname(so), exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", so, "-ljpeg", "-lpng", "-lpthread"]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except Exception as e:                             # pragma: no cover
        return f"{type(e).__name__}: {e}"
    if r.returncode != 0:                              # pragma: no cover
        return r.stderr[-2000:]
    return None


def get_lib():
    """Build (once) and load the native library, or None with a reason."""
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            return None
        so = _so_path()
        if not os.path.exists(so):
            err = _build(so)
            if err:
                _build_error = err
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError as e:                           # pragma: no cover
            _build_error = f"CDLL failed: {e}"
            return None
        lib.i2v_load_batch.restype = ctypes.c_int
        lib.i2v_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),            # paths
            ctypes.POINTER(ctypes.c_uint8),             # flips
            ctypes.c_int,                               # n
            ctypes.POINTER(ctypes.c_float),             # pixel_means
            ctypes.c_int, ctypes.c_int, ctypes.c_int,   # target, pad_h, pad_w
            ctypes.POINTER(ctypes.c_float),             # out_images
            ctypes.POINTER(ctypes.c_float),             # out_scales
            ctypes.POINTER(ctypes.c_int32),             # out_hw
            ctypes.c_int,                               # n_threads
        ]
        lib.i2v_decode.restype = ctypes.c_int
        lib.i2v_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32)]
        lib.i2v_pack_planes.restype = ctypes.c_int
        lib.i2v_pack_planes.argtypes = [
            ctypes.POINTER(ctypes.c_float),             # in (B,H,W,3) f32
            ctypes.c_int, ctypes.c_int, ctypes.c_int,   # b, h, w
            ctypes.c_int, ctypes.c_int,                 # hq, wq
            ctypes.POINTER(ctypes.c_uint16),            # out planes (bf16)
            ctypes.c_int,                               # n_threads
        ]
        _lib = lib
        return _lib


def build_error() -> Optional[str]:
    return _build_error


def available() -> bool:
    return get_lib() is not None


def load_batch(paths: Sequence[str], flips: Sequence[bool],
               pixel_means: Sequence[float], target_size: int,
               pad_h: int, pad_w: int, n_threads: int = 8
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode + preprocess a batch natively.

    Returns (images (N, pad_h, pad_w, 3) float32, scales (N,), hw (N, 2)).
    Raises RuntimeError if any image fails to decode.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError(f"native IO unavailable: {_build_error}")
    n = len(paths)
    images = np.zeros((n, pad_h, pad_w, 3), np.float32)
    scales = np.zeros((n,), np.float32)
    hw = np.zeros((n, 2), np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_flips = np.asarray(flips, np.uint8)
    c_means = np.asarray(pixel_means, np.float32)
    failed = lib.i2v_load_batch(
        c_paths, c_flips.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n,
        c_means.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        target_size, pad_h, pad_w,
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n_threads)
    if failed:
        bad = [p for p, s in zip(paths, scales) if s == 0.0]
        raise RuntimeError(f"{failed} images failed to decode: {bad[:3]}")
    return images, scales, hw


def pack_planes(x: np.ndarray, hq: int, wq: int,
                n_threads: int = 8) -> Optional[np.ndarray]:
    """Native conv1 parity-plane packer (the host-planes serving input
    contract): (B, H, W, 3) f32 -> (B, 2, 2, 3, hq, wq) bf16, bit-identical
    to ``ops.pallas.conv1_kernel.pack_conv1_planes_np`` (RNE rounding) at a
    fraction of the numpy cost. Returns None when the native lib is
    unavailable (caller falls back to numpy)."""
    lib = get_lib()
    if lib is None:
        return None
    import ml_dtypes
    x = np.ascontiguousarray(x, np.float32)
    b, h, w, c = x.shape
    assert c == 3
    out = np.zeros((b, 2, 2, 3, hq, wq), np.uint16)
    lib.i2v_pack_planes(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), b, h, w, hq, wq,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), n_threads)
    return out.view(ml_dtypes.bfloat16)


def decode_image(path: str) -> np.ndarray:
    """Decode one image to (H, W, 3) BGR uint8 (parity probe)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError(f"native IO unavailable: {_build_error}")
    hw = np.zeros((2,), np.int32)
    rc = lib.i2v_decode(path.encode(), None, 0,
                        hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc:
        raise FileNotFoundError(path)
    buf = np.empty((int(hw[0]), int(hw[1]), 3), np.uint8)
    lib.i2v_decode(path.encode(),
                   buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                   buf.size, hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return buf
