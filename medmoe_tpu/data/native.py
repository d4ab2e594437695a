"""ctypes bindings for the native C++ data-loader (native/medmoe_native.cpp).

Provides the fused JPEG decode→resize→normalize path and tar indexing with
transparent fallback to the pure-python implementations when the shared
library hasn't been built. Build with::

    python -m medmoe_tpu.data.native --build

(or cmake in native/). The library is auto-discovered next to the native/
sources or via MEDMOE_NATIVE_LIB.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import List, Optional, Sequence, Tuple

import numpy as np

from medmoe_tpu.data.transforms import NORM_STATS

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_CANDIDATES = (
    os.environ.get("MEDMOE_NATIVE_LIB", ""),
    os.path.join(_NATIVE_DIR, "libmedmoe_native.so"),
    os.path.join(_NATIVE_DIR, "build", "libmedmoe_native.so"),
)


class _TarEntry(ctypes.Structure):
    _fields_ = [("name", ctypes.c_char * 256),
                ("offset", ctypes.c_uint64),
                ("size", ctypes.c_uint64)]


_lib: Optional[ctypes.CDLL] = None
_lib_checked = False


def load_library() -> Optional[ctypes.CDLL]:
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    for path in _LIB_CANDIDATES:
        if path and os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                continue
            lib.mn_tar_index.restype = ctypes.c_long
            lib.mn_tar_index.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(_TarEntry))]
            lib.mn_free.argtypes = [ctypes.c_void_p]
            lib.mn_decode_resize_normalize.restype = ctypes.c_int
            lib.mn_decode_resize_normalize.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float)]
            lib.mn_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
                ctypes.c_int]
            _lib = lib
            return _lib
    return None


def available() -> bool:
    return load_library() is not None


def build(verbose: bool = True) -> str:
    """Compile the shared library with g++ (no cmake needed)."""
    out = os.path.join(_NATIVE_DIR, "libmedmoe_native.so")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", out, os.path.join(_NATIVE_DIR, "medmoe_native.cpp"),
           "-ljpeg", "-pthread"]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    global _lib_checked
    _lib_checked = False
    return out


def tar_index(path: str) -> List[Tuple[str, int, int]]:
    """[(member_name, payload_offset, size)] for a tar shard."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library not built")
    entries = ctypes.POINTER(_TarEntry)()
    n = lib.mn_tar_index(path.encode(), ctypes.byref(entries))
    if n < 0:
        raise OSError(f"cannot index tar {path}")
    out = [(entries[i].name.decode(), int(entries[i].offset),
            int(entries[i].size)) for i in range(n)]
    lib.mn_free(entries)
    return out


def _stats(norm: str) -> Tuple[np.ndarray, np.ndarray]:
    mean, std = NORM_STATS[norm]
    return (np.asarray(mean, np.float32), np.asarray(std, np.float32))


def decode_resize_normalize(jpeg: bytes, size: int,
                            norm: str = "imagenet") -> np.ndarray:
    """Fused single-image decode; raises ValueError on corrupt input."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library not built")
    mean, std = _stats(norm)
    out = np.empty((size, size, 3), np.float32)
    rc = lib.mn_decode_resize_normalize(
        jpeg, len(jpeg), size,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise ValueError("JPEG decode failed")
    return out


def decode_batch(jpegs: Sequence[bytes], size: int, norm: str = "imagenet",
                 num_threads: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Fused multithreaded batch decode → ([N,S,S,3] f32, ok mask [N])."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library not built")
    n = len(jpegs)
    mean, std = _stats(norm)
    out = np.empty((n, size, size, 3), np.float32)
    ok = np.empty((n,), np.int32)
    arr_t = ctypes.c_char_p * n
    len_t = ctypes.c_size_t * n
    datas = arr_t(*jpegs)
    lens = len_t(*(len(j) for j in jpegs))
    lib.mn_decode_batch(
        datas, lens, n, size,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads)
    return out, ok == 0


if __name__ == "__main__":
    if "--build" in sys.argv:
        path = build()
        print(f"built {path}; available={available()}")
    else:
        print(f"native library available: {available()}")
