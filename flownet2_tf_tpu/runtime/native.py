"""ctypes bindings for the native IO runtime (libflownet_io.so).

Builds on demand with the runtime Makefile (g++); every entry point has
a pure-Python fallback elsewhere in the package, so the framework works
without a compiler — the native path is the host-IO fast lane
(multithreaded TFRecord decode + batch assembly), replacing the
reference's TF C++ input runtime.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")
)
_LIB_PATH = os.path.join(_REPO_ROOT, "build", "libflownet_io.so")
_MAKE_DIR = os.path.dirname(os.path.abspath(__file__))

_lock = threading.Lock()
_native = None
_native_failed = False


def _build_library() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _MAKE_DIR, "all"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


class NativeIO:
    """Thin typed wrapper over libflownet_io."""

    def __init__(self, lib):
        self._lib = lib
        lib.fnio_crc32c.restype = ctypes.c_uint32
        lib.fnio_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.fnio_tfrecord_open.restype = ctypes.c_void_p
        lib.fnio_tfrecord_open.argtypes = [ctypes.c_char_p]
        lib.fnio_tfrecord_count.restype = ctypes.c_int64
        lib.fnio_tfrecord_count.argtypes = [ctypes.c_void_p]
        lib.fnio_tfrecord_size.restype = ctypes.c_int64
        lib.fnio_tfrecord_size.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.fnio_tfrecord_read.restype = ctypes.c_int
        lib.fnio_tfrecord_read.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p,
        ]
        lib.fnio_tfrecord_close.argtypes = [ctypes.c_void_p]
        lib.fnio_read_flo.restype = ctypes.c_int
        lib.fnio_read_flo.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        lib.fnio_write_flo.restype = ctypes.c_int
        lib.fnio_write_flo.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.fnio_read_ppm.restype = ctypes.c_int
        lib.fnio_read_ppm.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        lib.fnio_decode_batch.restype = ctypes.c_int
        lib.fnio_decode_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        lib.fnio_decode_batch_u8.restype = ctypes.c_int
        lib.fnio_decode_batch_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]

    # -- scalar helpers ------------------------------------------------------

    def crc32c(self, data: bytes) -> int:
        return int(self._lib.fnio_crc32c(data, len(data)))

    def read_flo(self, path) -> np.ndarray:
        w = ctypes.c_int32()
        h = ctypes.c_int32()
        rc = self._lib.fnio_read_flo(
            os.fsencode(path), None, ctypes.byref(w), ctypes.byref(h), 0
        )
        if rc != 0:
            raise ValueError(f"fnio_read_flo({path}) dims failed: {rc}")
        out = np.empty((h.value, w.value, 2), np.float32)
        rc = self._lib.fnio_read_flo(
            os.fsencode(path),
            out.ctypes.data_as(ctypes.c_void_p),
            ctypes.byref(w),
            ctypes.byref(h),
            out.size,
        )
        if rc != 0:
            raise ValueError(f"fnio_read_flo({path}) failed: {rc}")
        return out

    def write_flo(self, flow: np.ndarray, path) -> None:
        flow = np.ascontiguousarray(flow, np.float32)
        h, w = flow.shape[:2]
        rc = self._lib.fnio_write_flo(
            os.fsencode(path), flow.ctypes.data_as(ctypes.c_void_p), w, h
        )
        if rc != 0:
            raise ValueError(f"fnio_write_flo({path}) failed: {rc}")

    def read_ppm(self, path) -> np.ndarray:
        w = ctypes.c_int32()
        h = ctypes.c_int32()
        rc = self._lib.fnio_read_ppm(
            os.fsencode(path), None, ctypes.byref(w), ctypes.byref(h), 0
        )
        if rc != 0:
            raise ValueError(f"fnio_read_ppm({path}) dims failed: {rc}")
        out = np.empty((h.value, w.value, 3), np.uint8)
        rc = self._lib.fnio_read_ppm(
            os.fsencode(path),
            out.ctypes.data_as(ctypes.c_void_p),
            ctypes.byref(w),
            ctypes.byref(h),
            out.size,
        )
        if rc != 0:
            raise ValueError(f"fnio_read_ppm({path}) failed: {rc}")
        return out

    # -- TFRecord batch pipeline ---------------------------------------------

    def tfrecord_open(self, path):
        handle = self._lib.fnio_tfrecord_open(os.fsencode(path))
        if not handle:
            raise ValueError(f"fnio_tfrecord_open({path}) failed")
        return handle

    def tfrecord_count(self, handle) -> int:
        return int(self._lib.fnio_tfrecord_count(handle))

    def tfrecord_close(self, handle) -> None:
        self._lib.fnio_tfrecord_close(handle)

    def decode_batch(self, handle, indices, height, width, n_threads=4,
                     raw_uint8=False):
        """Decode a batch of records. ``raw_uint8`` keeps the images
        uint8 (the [0,1] float conversion then happens on device inside
        the jitted step) — the host fast path on low-core hosts."""
        indices = np.ascontiguousarray(indices, np.int64)
        n = len(indices)
        # more threads than cores only thrash (measured: 4 threads on
        # this 1-core host ran 2x slower than numpy single-threaded)
        n_threads = max(1, min(int(n_threads), os.cpu_count() or 1))
        img_dtype = np.uint8 if raw_uint8 else np.float32
        fn = (self._lib.fnio_decode_batch_u8 if raw_uint8
              else self._lib.fnio_decode_batch)
        image_a = np.empty((n, height, width, 3), img_dtype)
        image_b = np.empty((n, height, width, 3), img_dtype)
        flow = np.empty((n, height, width, 2), np.float32)
        rc = fn(
            handle,
            indices.ctypes.data_as(ctypes.c_void_p),
            n,
            height,
            width,
            image_a.ctypes.data_as(ctypes.c_void_p),
            image_b.ctypes.data_as(ctypes.c_void_p),
            flow.ctypes.data_as(ctypes.c_void_p),
            int(n_threads),
        )
        if rc != 0:
            reasons = {
                -2: "record index out of range",
                -3: "read failed",
                -4: "Example parse failed (missing feature?)",
                -5: f"feature byte-size mismatch for {height}x{width} "
                    "(wrong IMAGE_HEIGHT/IMAGE_WIDTH for these records?)",
            }
            raise ValueError(
                f"fnio_decode_batch failed: {rc} "
                f"({reasons.get(rc, 'unknown')})"
            )
        return {"image_a": image_a, "image_b": image_b, "flow": flow}


def get_native_io(build: bool = True):
    """Load (building if needed) the native library; None on failure."""
    global _native, _native_failed
    with _lock:
        if _native is not None:
            return _native
        if _native_failed:
            return None
        if not os.path.exists(_LIB_PATH):
            if not build or not _build_library():
                _native_failed = True
                return None
        try:
            _native = NativeIO(ctypes.CDLL(_LIB_PATH))
        except OSError:
            _native_failed = True
            return None
        except AttributeError:
            # Stale prebuilt library (build/ outlives a source update) that
            # lacks a newer entry point: rebuild once and retry. The stale
            # image is already mapped into this process and dlopen caches by
            # inode, so the old file must be unlinked first or the retry
            # would resolve to the same handle.
            _native = None
            try:
                os.unlink(_LIB_PATH)
            except OSError:
                pass
            if build and _build_library():
                try:
                    _native = NativeIO(ctypes.CDLL(_LIB_PATH))
                except (OSError, AttributeError):
                    _native = None
            if _native is None:
                _native_failed = True
                return None
        return _native


def native_available() -> bool:
    return get_native_io() is not None
