"""ctypes bindings for the native buffered dump writer (csrc/io_writer.cpp),
compiled on demand with g++; falls back to Python file I/O when no compiler
is available."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(os.path.dirname(_HERE))
_SRC = os.path.join(_ROOT, "csrc", "io_writer.cpp")
_SO = os.path.join(_HERE, "_libvpic_io.so")

_lib = None
_lock = threading.Lock()


def _build():
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
         _SRC, "-o", _SO],
        check=True, capture_output=True)


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.vpic_write_file.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                            ctypes.c_size_t]
            lib.vpic_write_file.restype = ctypes.c_int
            lib.vpic_writer_open.argtypes = [ctypes.c_char_p]
            lib.vpic_writer_open.restype = ctypes.c_void_p
            lib.vpic_writer_write.argtypes = [ctypes.c_void_p,
                                              ctypes.c_void_p,
                                              ctypes.c_size_t]
            lib.vpic_writer_write.restype = ctypes.c_int
            lib.vpic_writer_close.argtypes = [ctypes.c_void_p]
            lib.vpic_writer_close.restype = ctypes.c_longlong
            _lib = lib
        except Exception:
            _lib = False  # no toolchain: Python fallback
        return _lib


def write_file(path: str, data: bytes) -> None:
    lib = _load()
    if lib:
        buf = ctypes.create_string_buffer(data, len(data))
        rc = lib.vpic_write_file(path.encode(), buf, len(data))
        if rc != 0:
            raise IOError(f"native write failed: {path}")
        return
    with open(path, "wb") as fh:
        fh.write(data)


class AsyncWriter:
    """Double-buffered async file writer (P2PIOPolicy analogue)."""

    def __init__(self, path: str):
        self._lib = _load()
        self._path = path
        if self._lib:
            self._h = self._lib.vpic_writer_open(path.encode())
            if not self._h:
                raise IOError(f"cannot open {path}")
            self._fh = None
        else:
            self._h = None
            self._fh = open(path, "wb")

    def write(self, data: bytes):
        if self._h:
            buf = ctypes.create_string_buffer(data, len(data))
            if self._lib.vpic_writer_write(self._h, buf, len(data)):
                raise IOError("native enqueue failed")
        else:
            self._fh.write(data)

    def close(self) -> int:
        if self._h:
            n = self._lib.vpic_writer_close(self._h)
            self._h = None
            if n < 0:
                raise IOError(f"async write failed: {self._path}")
            return int(n)
        self._fh.close()
        return 0
