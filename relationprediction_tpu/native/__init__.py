"""Native (C++) host-pipeline kernels with ctypes bindings.

The device side of this framework is JAX/XLA; the host side's hot loops
(neighborhood sampling, negative sampling) are C++ compiled on first use
(g++ -O3 -shared) and loaded via ctypes. Falls back to the numpy
implementations in relationprediction_tpu.sampling when no toolchain is
available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "sampler.cpp")
_LIB_PATH = os.path.join(_HERE, "_libsampler.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _LIB_PATH, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        stale = (not os.path.exists(_LIB_PATH)
                 or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC))
        if stale and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None

        lib.sample_edge_neighborhood.restype = ctypes.c_int
        lib.sample_edge_neighborhood.argtypes = [
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint64,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        lib.negative_sample.restype = None
        lib.negative_sample.argtypes = [
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def sample_edge_neighborhood(adj, sample_size: int, seed: int) -> np.ndarray:
    """Native degree-weighted neighborhood sampling over an
    AdjacencyIndex. Raises RuntimeError if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native sampler unavailable (no g++?)")
    out = np.empty(sample_size, dtype=np.int32)
    rc = lib.sample_edge_neighborhood(
        np.ascontiguousarray(adj.sorted_edges, dtype=np.int32),
        np.ascontiguousarray(adj.sorted_others, dtype=np.int32),
        np.ascontiguousarray(adj.offsets, dtype=np.int64),
        np.ascontiguousarray(adj.degrees, dtype=np.int64),
        adj.n_entities, adj.n_edges, sample_size, seed, out)
    if rc != 0:
        raise RuntimeError(f"native sampler failed (rc={rc}): "
                           f"sample_size {sample_size} > available edges?")
    return out


def negative_sample(triples: np.ndarray, rate: int, n_entities: int,
                    seed: int):
    """Native negative sampling; returns (triples [(rate+1)N, 3], labels)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native sampler unavailable (no g++?)")
    triples = np.ascontiguousarray(triples, dtype=np.int32)
    n = len(triples)
    out = np.empty(((rate + 1) * n, 3), dtype=np.int32)
    labels = np.empty((rate + 1) * n, dtype=np.float32)
    lib.negative_sample(triples, n, rate, n_entities, seed, out, labels)
    return out, labels
