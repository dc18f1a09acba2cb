"""Native (C++) runtime components, loaded via ctypes.

Build happens lazily on first import (g++ -O2 -shared), cached next to the
source keyed by source mtime. No pybind11 in this image, hence the C ABI.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "allocator.cpp")
_LIB = os.path.join(_DIR, "_liballocator.so")

_lib = None
_load_error: Optional[str] = None


def _build() -> None:
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def _get_lib():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.pa_create.restype = ctypes.c_void_p
        lib.pa_create.argtypes = [ctypes.c_int32] * 5
        lib.pa_destroy.argtypes = [ctypes.c_void_p]
        i32p = ctypes.POINTER(ctypes.c_int32)
        for name, res, args in [
            ("pa_num_free", ctypes.c_int32, [ctypes.c_void_p]),
            ("pa_can_allocate", ctypes.c_int32,
             [ctypes.c_void_p, ctypes.c_int64]),
            ("pa_has_seq", ctypes.c_int32, [ctypes.c_void_p, ctypes.c_int64]),
            ("pa_seq_len", ctypes.c_int64, [ctypes.c_void_p, ctypes.c_int64]),
            ("pa_num_seq_pages", ctypes.c_int32,
             [ctypes.c_void_p, ctypes.c_int64]),
            ("pa_allocate", ctypes.c_int32,
             [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, i32p]),
            ("pa_reserve", ctypes.c_int32,
             [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, i32p]),
            ("pa_advance", ctypes.c_int32,
             [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]),
            ("pa_append_token", ctypes.c_int32,
             [ctypes.c_void_p, ctypes.c_int64]),
            ("pa_free_seq", ctypes.c_int32,
             [ctypes.c_void_p, ctypes.c_int64, i32p]),
            ("pa_fork", ctypes.c_int32,
             [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]),
            ("pa_cow_last", ctypes.c_int32,
             [ctypes.c_void_p, ctypes.c_int64, i32p]),
            ("pa_padded_table", ctypes.c_int32,
             [ctypes.c_void_p, ctypes.c_int64, i32p]),
            ("pa_release_for_swap", ctypes.c_int32,
             [ctypes.c_void_p, ctypes.c_int64, i32p]),
            ("pa_ref_page", ctypes.c_int32,
             [ctypes.c_void_p, ctypes.c_int32]),
            ("pa_unref_page", ctypes.c_int32,
             [ctypes.c_void_p, ctypes.c_int32]),
            ("pa_adopt", ctypes.c_int32,
             [ctypes.c_void_p, ctypes.c_int64, i32p, ctypes.c_int32,
              ctypes.c_int64]),
        ]:
            fn = getattr(lib, name)
            fn.restype = res
            fn.argtypes = args
        _lib = lib
    except Exception as e:  # pragma: no cover - toolchain missing
        _load_error = str(e)
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


class NativePageAllocator:
    """ctypes wrapper exposing the same interface as memory.allocator.
    PageAllocator (the Python behavioral spec)."""

    def __init__(self, num_pages: int, page_size: int,
                 pages_per_seq_max: int,
                 window_pages: Optional[int] = None,
                 run_pages: int = 1):
        lib = _get_lib()
        if lib is None:
            raise RuntimeError(f"native allocator unavailable: {_load_error}")
        self._lib = lib
        self._h = lib.pa_create(num_pages, page_size, pages_per_seq_max,
                                0 if window_pages is None else window_pages,
                                max(1, run_pages))
        self.num_pages = num_pages
        self.page_size = page_size
        self.pages_per_seq_max = pages_per_seq_max
        self.window_pages = window_pages
        self.run_pages = 1 if window_pages is not None else max(1, run_pages)
        self._scratch = np.empty(pages_per_seq_max, np.int32)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.pa_destroy(self._h)
            self._h = None

    def _buf(self):
        return self._scratch.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32))

    def _check(self, code: int, op: str) -> int:
        from ..allocator import OutOfPages

        if code == -2:
            raise OutOfPages(f"{op}: KV page pool exhausted")
        if code == -3:
            raise ValueError(f"{op}: exceeds per-sequence page limit")
        if code == -4:
            raise ValueError(f"{op}: unknown or duplicate sequence")
        return code

    # -- queries ------------------------------------------------------------
    @property
    def num_free_pages(self) -> int:
        return self._lib.pa_num_free(self._h)

    def pages_needed(self, num_tokens: int) -> int:
        return -(-num_tokens // self.page_size)

    def phys_pages_needed(self, num_tokens: int) -> int:
        n = self.pages_needed(num_tokens)
        if self.window_pages is not None:
            n = min(n, self.window_pages)
        return n

    def can_allocate(self, num_tokens: int) -> bool:
        return bool(self._lib.pa_can_allocate(self._h, num_tokens))

    def has_seq(self, seq_id: int) -> bool:
        return bool(self._lib.pa_has_seq(self._h, seq_id))

    def seq_len(self, seq_id: int) -> int:
        return self._check(self._lib.pa_seq_len(self._h, seq_id), "seq_len")

    def seq_pages(self, seq_id: int) -> List[int]:
        n = self._check(
            self._lib.pa_padded_table(self._h, seq_id, self._buf()),
            "seq_pages")
        return [int(p) for p in self._scratch[:n]]

    # -- allocation ---------------------------------------------------------
    def allocate(self, seq_id: int, num_tokens: int) -> List[int]:
        n = self._check(
            self._lib.pa_allocate(self._h, seq_id, num_tokens, self._buf()),
            "allocate")
        return [int(p) for p in self._scratch[:n]]

    def reserve(self, seq_id: int, extra_tokens: int) -> List[int]:
        n = self._check(
            self._lib.pa_reserve(self._h, seq_id, extra_tokens, self._buf()),
            "reserve")
        return [int(p) for p in self._scratch[:n]]

    def advance(self, seq_id: int, n_tokens: int) -> None:
        code = self._lib.pa_advance(self._h, seq_id, n_tokens)
        if code == -3:
            raise ValueError("advance beyond reserved pages")
        self._check(code, "advance")

    def append_token(self, seq_id: int):
        code = self._check(self._lib.pa_append_token(self._h, seq_id),
                           "append_token")
        return None if code == -1 else code

    def free(self, seq_id: int) -> List[int]:
        n = self._check(
            self._lib.pa_free_seq(self._h, seq_id, self._buf()), "free")
        return [int(p) for p in self._scratch[:n]]

    # -- COW ----------------------------------------------------------------
    def fork(self, parent_seq_id: int, child_seq_id: int) -> None:
        self._check(
            self._lib.pa_fork(self._h, parent_seq_id, child_seq_id), "fork")

    def cow_last_page(self, seq_id: int):
        code = self._check(
            self._lib.pa_cow_last(self._h, seq_id, self._buf()),
            "cow_last_page")
        if code == 0:
            return None
        return (int(self._scratch[0]), int(self._scratch[1]))

    # -- tables / swap ------------------------------------------------------
    def padded_table(self, seq_id: int) -> np.ndarray:
        self._check(
            self._lib.pa_padded_table(self._h, seq_id, self._buf()),
            "padded_table")
        return self._scratch.copy()

    def release_for_swap(self, seq_id: int) -> List[int]:
        n = self._check(
            self._lib.pa_release_for_swap(self._h, seq_id, self._buf()),
            "release_for_swap")
        return [int(p) for p in self._scratch[:n]]

    def allocate_for_swap_in(self, seq_id: int, num_tokens: int) -> List[int]:
        return self.allocate(seq_id, num_tokens)

    # -- prefix-cache sharing ------------------------------------------------
    def ref_page(self, page: int) -> None:
        self._check(self._lib.pa_ref_page(self._h, page), "ref_page")

    def unref_page(self, page: int) -> None:
        self._check(self._lib.pa_unref_page(self._h, page), "unref_page")

    def adopt(self, seq_id: int, pages: List[int], num_tokens: int) -> None:
        arr = np.asarray(pages, np.int32)
        self._check(self._lib.pa_adopt(
            self._h, seq_id,
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(pages), num_tokens), "adopt")
