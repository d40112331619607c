"""ctypes loader for the native RMSD kernel (native/rmsd.cpp).

Builds the shared library on first use with g++ (-O3 -fopenmp), caches it in
native/build/, and exposes numpy-friendly wrappers. chem/rmsd.py falls back
to the pure-numpy implementation when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from agdiff_tpu.chem.mol import Molecule

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "rmsd.cpp")
_BUILD_DIR = os.path.join(_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "librmsd.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if (
        os.path.exists(_SO)
        and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)
    ):
        return _SO
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
        "-std=c++17", _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        # retry without -march=native / -fopenmp for minimal toolchains
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
        subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_build())
            ip = ctypes.POINTER(ctypes.c_int)
            dp = ctypes.POINTER(ctypes.c_double)
            lib.agdiff_enumerate_automorphisms.restype = ctypes.c_int
            lib.agdiff_enumerate_automorphisms.argtypes = [
                ctypes.c_int, ip, ip, ctypes.c_int, ip]
            lib.agdiff_rmsd_confusion.restype = None
            lib.agdiff_rmsd_confusion.argtypes = [
                ctypes.c_int, dp, ctypes.c_int, dp, ctypes.c_int, ip,
                ctypes.c_int, dp]
            lib.agdiff_best_rmsd.restype = ctypes.c_double
            lib.agdiff_best_rmsd.argtypes = [
                ctypes.c_int, dp, dp, ip, ctypes.c_int]
            _lib = lib
    return _lib


def _as_int_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def _as_double_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def enumerate_automorphisms(
    labels: np.ndarray, adj_type: np.ndarray, max_maps: int = 10000
) -> np.ndarray:
    """(num_perms, N) automorphism permutations of a labeled graph."""
    lib = get_lib()
    n = len(labels)
    labels = np.ascontiguousarray(labels, np.int32)
    adj = np.ascontiguousarray(adj_type, np.int32)
    out = np.zeros((max_maps, n), np.int32)
    count = lib.agdiff_enumerate_automorphisms(
        n, _as_int_ptr(labels), _as_int_ptr(adj), max_maps, _as_int_ptr(out)
    )
    return out[:count]


def rmsd_confusion_matrix(
    mol: Molecule,
    pos_refs: np.ndarray,
    pos_gens: np.ndarray,
    strip_hydrogens: bool = True,
    max_maps: int = 10000,
) -> np.ndarray:
    """Native (num_ref, num_gen) symmetry-aware best-RMSD matrix."""
    lib = get_lib()
    pos_refs = np.asarray(pos_refs, np.float64).reshape(-1, mol.num_nodes, 3)
    pos_gens = np.asarray(pos_gens, np.float64).reshape(-1, mol.num_nodes, 3)
    if strip_hydrogens:
        keep = mol.atom_type != 1
        heavy = mol.heavy_atom_subset()
        labels, adj = heavy.atom_type, heavy.bond_adjacency()
        pos_refs = pos_refs[:, keep]
        pos_gens = pos_gens[:, keep]
    else:
        labels, adj = mol.atom_type, mol.bond_adjacency()
    perms = enumerate_automorphisms(labels, adj, max_maps=max_maps)
    n = len(labels)
    refs = np.ascontiguousarray(pos_refs)
    gens = np.ascontiguousarray(pos_gens)
    perms = np.ascontiguousarray(perms, np.int32)
    out = np.zeros((len(refs), len(gens)), np.float64)
    lib.agdiff_rmsd_confusion(
        n, _as_double_ptr(refs), len(refs), _as_double_ptr(gens), len(gens),
        _as_int_ptr(perms), len(perms), _as_double_ptr(out),
    )
    return out


def best_rmsd(
    mol: Molecule, pos_ref: np.ndarray, pos_gen: np.ndarray,
    strip_hydrogens: bool = True, max_maps: int = 10000,
) -> float:
    return float(
        rmsd_confusion_matrix(
            mol, pos_ref[None], pos_gen[None],
            strip_hydrogens=strip_hydrogens, max_maps=max_maps,
        )[0, 0]
    )
