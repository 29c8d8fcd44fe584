"""ctypes binding + on-demand build for the native tar reader (zt_tar.cc).

Builds the shared library with g++ on first use (cached next to the
source); falls back cleanly if no compiler is available — callers check
``available()`` and use the Python tarfile path otherwise.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Iterator, Optional

log = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "zt_tar.cc")
_LIB = os.path.join(_HERE, "libzt_tar.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    # build to a per-process temp file, then atomic rename: concurrent
    # loader processes must never dlopen a half-written .so
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError) as e:
        log.warning("native tar reader build failed (%s); using python tarfile",
                    e)
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:  # corrupt/stale .so: fall back, don't crash
            log.warning("native tar reader unloadable (%s); using python "
                        "tarfile", e)
            _build_failed = True
            return None
        lib.zt_open.restype = ctypes.c_void_p
        lib.zt_open.argtypes = [ctypes.c_char_p]
        lib.zt_count.restype = ctypes.c_long
        lib.zt_count.argtypes = [ctypes.c_void_p]
        lib.zt_name.restype = ctypes.c_char_p
        lib.zt_name.argtypes = [ctypes.c_void_p, ctypes.c_long]
        lib.zt_size.restype = ctypes.c_long
        lib.zt_size.argtypes = [ctypes.c_void_p, ctypes.c_long]
        lib.zt_read.restype = ctypes.c_long
        lib.zt_read.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                ctypes.c_void_p, ctypes.c_long]
        lib.zt_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class NativeTar:
    """Indexed random-access tar (native).  Context-manager friendly."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native tar reader unavailable")
        self._lib = lib
        self._h = lib.zt_open(path.encode())
        if not self._h:
            raise OSError(f"zt_open failed for {path}")
        self.path = path

    def __len__(self) -> int:
        return self._lib.zt_count(self._h)

    def name(self, i: int) -> str:
        nm = self._lib.zt_name(self._h, i)
        if nm is None:
            raise IndexError(i)
        return nm.decode()

    def read(self, i: int) -> bytes:
        size = self._lib.zt_size(self._h, i)
        if size < 0:
            raise IndexError(i)
        buf = ctypes.create_string_buffer(size)
        got = self._lib.zt_read(self._h, i, buf, size)
        if got != size:
            raise OSError(f"short read: {got} != {size} ({self.path}:{i})")
        return buf.raw

    def close(self):
        if self._h:
            self._lib.zt_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def native_tar_samples(url: str) -> Iterator[dict]:
    """Drop-in for wds.tar_samples using the native reader: yields
    {'__key__': ..., '<ext>': bytes, ...} grouped by basename prefix."""
    with NativeTar(url) as tar:
        current_key, sample = None, {}
        for i in range(len(tar)):
            name = tar.name(i)
            base = os.path.basename(name)
            if "." not in base:
                key, ext = base, ""
            else:
                key, ext = base.split(".", 1)
            key = os.path.join(os.path.dirname(name), key)
            if key != current_key:
                if sample:
                    yield sample
                current_key, sample = key, {"__key__": key}
            sample[ext] = tar.read(i)
        if sample:
            yield sample
