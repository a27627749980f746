"""ctypes bindings for the native (C++) components.

``load_nf4core()`` returns the bound library or None; callers keep a NumPy
fallback so the framework works without a toolchain. The library is built
on demand (one g++ invocation, no external deps) and cached next to the
source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libnf4core.so")
_lib = None
_tried = False


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64 = ctypes.c_int64
    lib.nf4_swap_nibbles.argtypes = [u8p, i64]
    lib.nf4_dequant.argtypes = [u8p, f32p, f32p, f32p, i64, i64]
    lib.nf4_quant.argtypes = [f32p, f32p, u8p, f32p, i64, i64]
    lib.nf4_dequant_absmax.argtypes = [u8p, f32p, f32p, ctypes.c_float, f32p, i64, i64, i64]
    lib.nf4core_abi_version.restype = ctypes.c_int
    return lib


def load_nf4core(build: bool = True) -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried and not build:
        return None
    _tried = True
    if not os.path.exists(_LIB_PATH) and build:
        try:
            subprocess.run(
                ["sh", os.path.join(_DIR, "build.sh")],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if os.path.exists(_LIB_PATH):
        try:
            _lib = _bind(ctypes.CDLL(_LIB_PATH))
            assert _lib.nf4core_abi_version() == 1
        except Exception:
            _lib = None
    return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def native_dequant(packed: np.ndarray, absmax: np.ndarray, code: np.ndarray,
                   blocksize: int) -> Optional[np.ndarray]:
    lib = load_nf4core()
    if lib is None:
        return None
    n = packed.size * 2
    packed = np.ascontiguousarray(packed.reshape(-1))
    absmax = np.ascontiguousarray(absmax, dtype=np.float32).reshape(-1)
    code = np.ascontiguousarray(code, dtype=np.float32)
    out = np.empty(n, dtype=np.float32)
    lib.nf4_dequant(
        _ptr(packed, ctypes.c_uint8), _ptr(absmax, ctypes.c_float),
        _ptr(code, ctypes.c_float), _ptr(out, ctypes.c_float), n, blocksize,
    )
    return out


def native_quant(w: np.ndarray, code: np.ndarray, blocksize: int):
    lib = load_nf4core()
    if lib is None:
        return None
    w = np.ascontiguousarray(w, dtype=np.float32).reshape(-1)
    code = np.ascontiguousarray(code, dtype=np.float32)
    packed = np.empty(w.size // 2, dtype=np.uint8)
    absmax = np.empty(w.size // blocksize, dtype=np.float32)
    lib.nf4_quant(
        _ptr(w, ctypes.c_float), _ptr(code, ctypes.c_float),
        _ptr(packed, ctypes.c_uint8), _ptr(absmax, ctypes.c_float),
        w.size, blocksize,
    )
    return packed, absmax


def native_swap_nibbles(data: np.ndarray) -> Optional[np.ndarray]:
    lib = load_nf4core()
    if lib is None:
        return None
    out = np.ascontiguousarray(data.reshape(-1)).copy()
    lib.nf4_swap_nibbles(_ptr(out, ctypes.c_uint8), out.size)
    return out.reshape(data.shape)


def native_dequant_absmax(q: np.ndarray, nested_absmax: np.ndarray,
                          code256: np.ndarray, offset: float,
                          nested_blocksize: int) -> Optional[np.ndarray]:
    lib = load_nf4core()
    if lib is None:
        return None
    q = np.ascontiguousarray(q.reshape(-1))
    na = np.ascontiguousarray(nested_absmax, dtype=np.float32).reshape(-1)
    code256 = np.ascontiguousarray(code256, dtype=np.float32)
    out = np.empty(q.size, dtype=np.float32)
    lib.nf4_dequant_absmax(
        _ptr(q, ctypes.c_uint8), _ptr(na, ctypes.c_float),
        _ptr(code256, ctypes.c_float), ctypes.c_float(offset),
        _ptr(out, ctypes.c_float), q.size, nested_blocksize, na.size,
    )
    return out


# ---------------------------------------------------------------------------
# Native block allocator (prefix-sharing KV block manager)
# ---------------------------------------------------------------------------

_BA_PATH = os.path.join(_DIR, "libblockalloc.so")
_ba_lib = None


def load_blockalloc(build: bool = True):
    global _ba_lib
    if _ba_lib is not None:
        return _ba_lib
    if not os.path.exists(_BA_PATH) and build:
        try:
            subprocess.run(
                ["sh", os.path.join(_DIR, "build.sh")],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if os.path.exists(_BA_PATH):
        try:
            lib = ctypes.CDLL(_BA_PATH)
            i32p = ctypes.POINTER(ctypes.c_int32)
            i64p = ctypes.POINTER(ctypes.c_int64)
            lib.ba_create.restype = ctypes.c_void_p
            lib.ba_create.argtypes = [ctypes.c_int64]
            lib.ba_destroy.argtypes = [ctypes.c_void_p]
            lib.ba_num_free.restype = ctypes.c_int64
            lib.ba_num_free.argtypes = [ctypes.c_void_p]
            lib.ba_allocate.argtypes = [ctypes.c_void_p, ctypes.c_int64, i32p]
            lib.ba_release.argtypes = [ctypes.c_void_p, i32p, ctypes.c_int64]
            lib.ba_prefix_lookup.argtypes = [
                ctypes.c_void_p, ctypes.c_int32, i32p, ctypes.c_int, i32p
            ]
            lib.ba_register.argtypes = [
                ctypes.c_void_p, ctypes.c_int32, i32p, ctypes.c_int, ctypes.c_int32
            ]
            lib.ba_stats.argtypes = [ctypes.c_void_p, i64p, i64p]
            assert lib.ba_abi_version() == 1
            _ba_lib = lib
        except Exception:
            _ba_lib = None
    return _ba_lib


class NativeBlockAllocator:
    """Prefix-sharing KV block manager over the C++ core.

    Same alloc/free surface as engine.kv_cache.BlockAllocator, plus
    prefix_lookup/register for radix-style prompt-prefix reuse."""

    def __init__(self, num_blocks: int):
        lib = load_blockalloc()
        if lib is None:
            raise RuntimeError("libblockalloc.so unavailable")
        self._lib = lib
        self._h = ctypes.c_void_p(lib.ba_create(num_blocks))
        self.num_blocks = num_blocks

    def __del__(self):
        try:
            self._lib.ba_destroy(self._h)
        except Exception:
            pass

    @property
    def num_free(self) -> int:
        return self._lib.ba_num_free(self._h)

    def can_allocate(self, n: int) -> bool:
        return self.num_free >= n

    def allocate(self, n: int):
        out = (ctypes.c_int32 * n)()
        if self._lib.ba_allocate(self._h, n, out) != 0:
            raise RuntimeError(f"KV cache exhausted: want {n} blocks, have {self.num_free}")
        return list(out)

    def free(self, blocks):
        arr = (ctypes.c_int32 * len(blocks))(*blocks)
        self._lib.ba_release(self._h, arr, len(blocks))

    def prefix_lookup(self, parent: int, tokens) -> Optional[int]:
        arr = (ctypes.c_int32 * len(tokens))(*tokens)
        out = ctypes.c_int32(-1)
        hit = self._lib.ba_prefix_lookup(
            self._h, parent, arr, len(tokens), ctypes.byref(out)
        )
        return int(out.value) if hit else None

    def register_prefix(self, parent: int, tokens, block: int) -> None:
        arr = (ctypes.c_int32 * len(tokens))(*tokens)
        self._lib.ba_register(self._h, parent, arr, len(tokens), block)

    def stats(self):
        h, m = ctypes.c_int64(), ctypes.c_int64()
        self._lib.ba_stats(self._h, ctypes.byref(h), ctypes.byref(m))
        return {"prefix_hits": h.value, "prefix_misses": m.value}
