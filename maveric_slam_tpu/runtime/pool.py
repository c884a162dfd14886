"""ctypes bindings for the native runtime (see native/feature_pool.cc).

Builds the shared library on first use (g++, ~1 s) and caches it next to
the sources. The pool mirrors the reference's host-side map bookkeeping
(include/local_feature_pool.h) as production C++; the device-resident
variant lives in mapping/feature_pool.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmaveric_runtime.so")
_BUILD_LOCK = threading.Lock()
_lib = None


def _load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    with _BUILD_LOCK:
        if _lib is not None:
            return _lib
        src = os.path.join(_NATIVE_DIR, "feature_pool.cc")
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(src):
            subprocess.run(
                ["make", "-s", "-C", _NATIVE_DIR], check=True, capture_output=True
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.pool_create.restype = ctypes.c_void_p
        lib.pool_create.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.pool_destroy.argtypes = [ctypes.c_void_p]
        lib.pool_size.argtypes = [ctypes.c_void_p]
        lib.pool_size.restype = ctypes.c_int
        lib.pool_load_factor.argtypes = [ctypes.c_void_p]
        lib.pool_load_factor.restype = ctypes.c_float
        lib.pool_observe.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        lib.pool_observe.restype = ctypes.c_int
        lib.pool_observe_batch.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.pool_observe_batch.restype = ctypes.c_int
        lib.pool_last_seen.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.pool_last_seen.restype = ctypes.c_int
        lib.pool_num_sightings.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.pool_num_sightings.restype = ctypes.c_int
        lib.pool_remove_old.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.pool_valid_keys.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int,
        ]
        lib.pool_valid_keys.restype = ctypes.c_int
        lib.pool_check_invariant.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.pool_check_invariant.restype = ctypes.c_int
        lib.lcd_intersect.argtypes = [
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int,
        ]
        lib.lcd_intersect.restype = ctypes.c_int
        _lib = lib
    return _lib


class FeaturePool:
    """Host feature pool: word-id keyed sightings with an age-out window.

    Capacity/window defaults follow the reference envelope
    (local_feature_pool.h:11-14: capacity 3000, 8-frame window).
    """

    def __init__(self, capacity: int = 3000, max_frames: int = 8):
        self._lib = _load_library()
        self._handle = self._lib.pool_create(capacity, max_frames)
        if not self._handle:
            raise ValueError("bad pool parameters")
        self.capacity = capacity
        self.max_frames = max_frames

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.pool_destroy(self._handle)
            self._handle = None

    def observe(self, word_id: int, frame_num: int) -> bool:
        """Record a sighting; True if a new feature was created."""
        r = self._lib.pool_observe(self._handle, word_id, frame_num)
        if r < 0:
            raise OverflowError("feature pool full")
        return bool(r)

    def observe_batch(self, word_ids: np.ndarray, frame_num: int) -> int:
        ids = np.ascontiguousarray(word_ids, np.int32)
        r = self._lib.pool_observe_batch(self._handle, ids, len(ids), frame_num)
        if r < 0:
            raise OverflowError("feature pool full")
        return r

    def remove_old(self, current_frame: int) -> None:
        self._lib.pool_remove_old(self._handle, current_frame)

    def last_seen(self, word_id: int) -> int:
        return self._lib.pool_last_seen(self._handle, word_id)

    def num_sightings(self, word_id: int) -> int:
        return self._lib.pool_num_sightings(self._handle, word_id)

    def valid_keys(self) -> np.ndarray:
        out = np.empty(self.capacity, np.int32)
        n = self._lib.pool_valid_keys(self._handle, out, self.capacity)
        return out[:n]

    def check_invariant(self, current_frame: int) -> int:
        """0 when consistent; nonzero code identifies the broken invariant."""
        return self._lib.pool_check_invariant(self._handle, current_frame)

    def __len__(self) -> int:
        return self._lib.pool_size(self._handle)

    @property
    def load_factor(self) -> float:
        return self._lib.pool_load_factor(self._handle)


def lcd_intersect(a: np.ndarray, b: np.ndarray) -> int:
    """Sorted-id intersection count (native merge-join, lcd_main.c:52-74)."""
    lib = _load_library()
    a = np.ascontiguousarray(a, np.int32)
    b = np.ascontiguousarray(b, np.int32)
    return lib.lcd_intersect(a, len(a), b, len(b))
