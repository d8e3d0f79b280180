"""Native (C++) components, compiled on demand with g++ and loaded via
ctypes.  The shared objects are cached next to the sources and rebuilt
whenever a source file is newer."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS = {}


def _build(name: str, sources, link=("-lz",), cflags=()) -> str:
    so_path = os.path.join(_DIR, f"lib{name}.so")
    srcs = [os.path.join(_DIR, s) for s in sources]
    if (not os.path.exists(so_path)
            or any(os.path.getmtime(s) > os.path.getmtime(so_path)
                   for s in srcs)):
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", *cflags,
               *srcs, "-o", so_path + ".tmp", *link]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        os.replace(so_path + ".tmp", so_path)
    return so_path


def load(name: str, sources, link=("-lz",), cflags=()) -> ctypes.CDLL:
    with _LOCK:
        if name not in _LIBS:
            _LIBS[name] = ctypes.CDLL(_build(name, sources, link, cflags))
        return _LIBS[name]
