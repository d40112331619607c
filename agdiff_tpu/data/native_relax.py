"""ctypes loader for the native geometry-relaxation kernel (native/relax.cpp).

Same build-on-first-use pattern as chem/native_rmsd.py: compiles with g++
into native/build/, falls back to the pure-numpy implementation in
data/synthetic.py when the toolchain is unavailable. The native kernel is
~100x the Python loop (113 ms -> ~1 ms per Drugs-size molecule), which is
what makes 8k-molecule rich synthetic datasets cheap to regenerate.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "relax.cpp")
_BUILD_DIR = os.path.join(_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "librelax.so")

_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if (os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return _SO
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
               "-o", _SO]
        subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, or None if the toolchain is unavailable."""
    global _lib, _failed
    with _lock:
        if _lib is None and not _failed:
            try:
                lib = ctypes.CDLL(_build())
            except (OSError, subprocess.CalledProcessError,
                    FileNotFoundError):
                _failed = True
                return None
            ip = ctypes.POINTER(ctypes.c_int)
            dp = ctypes.POINTER(ctypes.c_double)
            up = ctypes.POINTER(ctypes.c_ubyte)
            lib.agdiff_relax.restype = None
            lib.agdiff_relax.argtypes = [
                ctypes.c_int, dp,
                ctypes.c_int, ip, ip, dp,
                ctypes.c_int, ip, ip, dp,
                up, ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ]
            _lib = lib
    return _lib


def _split(constraints: Sequence[tuple]):
    if len(constraints) == 0:
        z = np.zeros(0, np.int32)
        return z, z, np.zeros(0, np.float64)
    i, j, d = zip(*constraints)
    return (np.ascontiguousarray(i, np.int32),
            np.ascontiguousarray(j, np.int32),
            np.ascontiguousarray(d, np.float64))


def relax(pos: np.ndarray, constraints: List[tuple], exclude: np.ndarray,
          iters: int, step: float, repulse: float,
          polish: Optional[List[tuple]]) -> Optional[np.ndarray]:
    """Native twin of synthetic._relax; returns None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    p = np.ascontiguousarray(pos, np.float64)
    ci, cj, cd = _split(constraints)
    pi, pj, pd = _split(polish if polish is not None else constraints)
    ex = np.ascontiguousarray(exclude.astype(np.uint8))
    lib.agdiff_relax(
        p.shape[0], p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(ci), ci.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        cj.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        cd.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(pi), pi.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        pj.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        pd.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ex.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        int(iters), float(step), float(repulse),
    )
    return p
