"""Python binding for the native async output writer (native/quilt.cc).

The quilting layer of this framework (see quilt.cc header for the reference
mapping).  Builds the shared library on first use with g++ if it is not
already present; degrades to synchronous writes when no compiler is
available so the framework never hard-depends on the native path.
"""

from __future__ import annotations

import atexit
import ctypes
import io
import os
import subprocess
import threading

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "quilt.cc")
_LIB = os.path.join(_REPO_ROOT, "native", "libquilt.so")

_lock = threading.Lock()
_lib = None
_started = False


def _build() -> str | None:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    try:
        subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-pthread",
                        "-o", _LIB, _SRC], check=True, capture_output=True)
        return _LIB
    except Exception:
        return None


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        path = _build()
        if path is None:
            _lib = False
            return _lib
        lib = ctypes.CDLL(path)
        lib.quilt_start.argtypes = [ctypes.c_int]
        lib.quilt_start.restype = ctypes.c_int
        lib.quilt_submit.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                     ctypes.c_int64]
        lib.quilt_submit.restype = ctypes.c_int
        lib.quilt_pending.restype = ctypes.c_int64
        lib.quilt_flush.restype = ctypes.c_int
        _lib = lib
        return _lib


class QuiltWriter:
    """Async file writer; context-manager that flushes on exit."""

    def __init__(self, n_threads: int = 2):
        global _started
        self.lib = _load()
        self.async_ok = bool(self.lib)
        if self.async_ok and not _started:
            self.lib.quilt_start(n_threads)
            atexit.register(self.lib.quilt_stop)   # join workers at exit
            _started = True

    def submit_bytes(self, path: str, data: bytes) -> None:
        if self.async_ok:
            rc = self.lib.quilt_submit(path.encode(), data, len(data))
            if rc != 0:
                raise RuntimeError(f"quilt_submit failed rc={rc}")
        else:  # synchronous fallback
            with open(path, "wb") as f:
                f.write(data)

    def submit_npz(self, path: str, save_fn) -> None:
        """Serialize via ``save_fn(file_like)`` in memory, write async."""
        buf = io.BytesIO()
        save_fn(buf)
        self.submit_bytes(path, buf.getvalue())

    def pending(self) -> int:
        return int(self.lib.quilt_pending()) if self.async_ok else 0

    def flush(self) -> int:
        """Wait for all queued writes; returns number of write errors."""
        return int(self.lib.quilt_flush()) if self.async_ok else 0

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.flush()
        return False
