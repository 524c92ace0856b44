"""ctypes bridge to the native fast packer (flute_tpu/csrc/fastpack.cpp).

The framework's host-native layer: offline packing of large checkpoints is
a pure-CPU bit-shuffle over tens of GB — the one place where numpy loops
genuinely hurt. The shared library is built on demand with g++ (no
pybind11/torch build machinery — contrast the reference's CUDAExtension
setup, setup.py:78-103) and falls back to the numpy implementation in
flute_tpu/packing.py when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "csrc", "fastpack.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "csrc", "libfastpack.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build(march: str = "-march=native") -> bool:
    # -march=native first: the int32 shift/or shuffle vectorizes (AVX2 runs
    # the 8192x8192 plane 2.3x faster than generic, measured on the build
    # host). A native .so copied between machines can SIGILL at call time
    # (uncatchable through ctypes), so get_lib() always validates through
    # the subprocess self-check and falls back to an -mtune=generic build —
    # the same check that protects against a stale/foreign binary.
    cmd = [
        "g++", "-O3", march, "-std=c++17", "-shared", "-fPIC",
        "-pthread", _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _selfcheck_subprocess() -> bool:
    """Run a tiny pack/unpack round-trip in a *subprocess* so that a library
    built for another microarchitecture faults the child, not us."""
    import sys

    code = (
        "import numpy as np, flute_tpu.native as nat;"
        "rng = np.random.default_rng(0);"
        "c = rng.integers(0, 16, (256, 8), dtype=np.int32);"
        "w = nat.pack_plane(c, 0, 4, 256);"
        "u = nat.unpack_plane(w, 4, 256);"
        "assert u is not None and np.array_equal(u, c);"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            timeout=60,
            env={**os.environ, "FLUTE_TPU_NATIVE_SELFCHECK": "1"},
        )
        return r.returncode == 0
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable.

    A pre-existing .so is only trusted after a subprocess self-check (it may
    have been built on a different machine); a freshly built one is used
    directly."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            fresh = os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)
            if fresh and os.environ.get("FLUTE_TPU_NATIVE_SELFCHECK") != "1":
                if not _selfcheck_subprocess():
                    fresh = False  # stale/foreign binary: rebuild
            if not fresh:
                if not _build():  # vectorized for this host
                    return None
                if (
                    os.environ.get("FLUTE_TPU_NATIVE_SELFCHECK") != "1"
                    and not _selfcheck_subprocess()
                ):
                    # native codegen faulted the child (exotic toolchain /
                    # cross-build): fall back to the portable binary
                    if not (
                        _build("-mtune=generic") and _selfcheck_subprocess()
                    ):
                        return None
            lib = ctypes.CDLL(_LIB)
            for fn in (
                lib.flute_pack_plane,
                lib.flute_unpack_plane,
                lib.flute_pack_w3_wide,
                lib.flute_unpack_w3_wide,
            ):
                fn.restype = ctypes.c_int
            lib.flute_pack_plane.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int64,
            ]
            lib.flute_unpack_plane.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int, ctypes.c_int64,
            ]
            wide_args = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,
            ]
            lib.flute_pack_w3_wide.argtypes = wide_args
            lib.flute_unpack_w3_wide.argtypes = wide_args
            for fn in (lib.flute_pack_w4_sym, lib.flute_unpack_w4_sym):
                fn.restype = ctypes.c_int
                fn.argtypes = wide_args
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return get_lib() is not None


def pack_plane(
    codes: np.ndarray, shift: int, plane_bits: int, chunk: int
) -> Optional[np.ndarray]:
    """Native pack of one plane from full codes [K, N]; None if no lib."""
    lib = get_lib()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, dtype=np.int32)
    k, n = codes.shape
    out = np.empty((k * plane_bits // 32, n), np.int32)
    rc = lib.flute_pack_plane(
        codes.ctypes.data, out.ctypes.data, k, n, shift, plane_bits, chunk
    )
    if rc != 0:
        raise ValueError(f"flute_pack_plane failed (rc={rc})")
    return out


def unpack_plane(
    words: np.ndarray, plane_bits: int, chunk: int
) -> Optional[np.ndarray]:
    """Native unpack of one plane to subcodes [K, N]; None if no lib."""
    lib = get_lib()
    if lib is None:
        return None
    words = np.ascontiguousarray(words, dtype=np.int32)
    rows, n = words.shape
    k = rows * 32 // plane_bits
    out = np.empty((k, n), np.int32)
    rc = lib.flute_unpack_plane(
        words.ctypes.data, out.ctypes.data, k, n, plane_bits, chunk
    )
    if rc != 0:
        raise ValueError(f"flute_unpack_plane failed (rc={rc})")
    return out


def pack_w3_wide(codes: np.ndarray, chunk: int) -> Optional[np.ndarray]:
    """Native wide 3-bit pack: codes [K, N] -> words [3K/32, N]; None if
    no lib."""
    lib = get_lib()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, dtype=np.int32)
    k, n = codes.shape
    out = np.empty((k * 3 // 32, n), np.int32)
    rc = lib.flute_pack_w3_wide(codes.ctypes.data, out.ctypes.data, k, n, chunk)
    if rc != 0:
        raise ValueError(f"flute_pack_w3_wide failed (rc={rc})")
    return out


def pack_w4_sym(codes: np.ndarray, chunk: int) -> Optional[np.ndarray]:
    """Native sign-symmetric 4-bit pack: codes [K, N] (sign-magnitude) ->
    words [K/8, N]; None if no lib."""
    lib = get_lib()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, dtype=np.int32)
    k, n = codes.shape
    out = np.empty((k // 8, n), np.int32)
    rc = lib.flute_pack_w4_sym(codes.ctypes.data, out.ctypes.data, k, n, chunk)
    if rc != 0:
        raise ValueError(f"flute_pack_w4_sym failed (rc={rc})")
    return out


def unpack_w4_sym(words: np.ndarray, chunk: int) -> Optional[np.ndarray]:
    """Native sign-symmetric 4-bit unpack: words [K/8, N] -> codes [K, N];
    None if no lib."""
    lib = get_lib()
    if lib is None:
        return None
    words = np.ascontiguousarray(words, dtype=np.int32)
    rows, n = words.shape
    k = rows * 8
    out = np.empty((k, n), np.int32)
    rc = lib.flute_unpack_w4_sym(words.ctypes.data, out.ctypes.data, k, n, chunk)
    if rc != 0:
        raise ValueError(f"flute_unpack_w4_sym failed (rc={rc})")
    return out


def unpack_w3_wide(words: np.ndarray, chunk: int) -> Optional[np.ndarray]:
    """Native wide 3-bit unpack: words [3K/32, N] -> codes [K, N]; None if
    no lib."""
    lib = get_lib()
    if lib is None:
        return None
    words = np.ascontiguousarray(words, dtype=np.int32)
    rows, n = words.shape
    k = rows * 32 // 3
    out = np.empty((k, n), np.int32)
    rc = lib.flute_unpack_w3_wide(
        words.ctypes.data, out.ctypes.data, k, n, chunk
    )
    if rc != 0:
        raise ValueError(f"flute_unpack_w3_wide failed (rc={rc})")
    return out
