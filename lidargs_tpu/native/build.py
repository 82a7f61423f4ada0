"""Lazy build of the native shared object (g++ -O3 -fopenmp)."""
from __future__ import annotations

import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "lidargs_native.cpp")
_SO = os.path.join(_DIR, "liblidargs_native.so")
_LOCK = threading.Lock()


def ensure_built() -> str:
    """Compile lidargs_native.cpp if the .so is missing or stale."""
    with _LOCK:
        if (os.path.exists(_SO)
                and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
            return _SO
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-fopenmp",
            "-march=native", _SRC, "-o", _SO + ".tmp",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            # no -march=native / no OpenMP toolchains: degrade gracefully
            cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                   _SRC, "-o", _SO + ".tmp"]
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        os.replace(_SO + ".tmp", _SO)
        return _SO
