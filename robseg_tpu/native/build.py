"""Tiny build-and-load helper for the ctypes native extensions."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_CACHE = {}


def _build(name: str) -> Optional[str]:
    src = os.path.join(_DIR, f"{name}.cpp")
    so = os.path.join(_DIR, f"lib{name}.so")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", so, src],
            check=True, capture_output=True, timeout=120)
        return so
    except Exception:
        return None


def load_library(name: str) -> Optional[ctypes.CDLL]:
    """Compile (if needed) and dlopen lib<name>.so; None if unavailable."""
    with _LOCK:
        if name in _CACHE:
            return _CACHE[name]
        so = _build(name)
        lib = None
        if so is not None:
            try:
                lib = ctypes.CDLL(so)
            except OSError:
                lib = None
        _CACHE[name] = lib
        return lib


def native_available(name: str) -> bool:
    return load_library(name) is not None
