"""Centroid-linkage AHC binding (C++), with scipy fallback.

Behavioral parity: reference `AHCClustering.cluster` FFI usage
(`Diarizer/Offline/Clustering/AHCClustering.swift:40-67`): L2-normalized
embeddings in, SciPy-format dendrogram out; cosine threshold converted to
Euclidean via sqrt(2-2cos) at the call site.
"""

from __future__ import annotations

import ctypes

import numpy as np

from fluidaudio_tpu.native import load_native
from fluidaudio_tpu.utils.logging import get_logger

logger = get_logger("native.fastcluster")


class FastClusterError(RuntimeError):
    pass


_ERRORS = {1: "invalid argument", 2: "allocation failure", 3: "NaN in input", 4: "overflow"}


def native_available() -> bool:
    lib = load_native()
    return lib is not None and hasattr(lib, "fastcluster_compute_centroid_linkage")


def centroid_linkage(points: np.ndarray) -> np.ndarray:
    """[n, d] float -> SciPy dendrogram [(n-1), 4] (centroid linkage)."""
    pts = np.ascontiguousarray(points, dtype=np.float64)
    n, d = pts.shape
    if n < 2:
        return np.zeros((0, 4), np.float64)

    lib = load_native()
    if lib is not None and hasattr(lib, "fastcluster_centroid_linkage_lw"):
        # fast path: one BLAS gemm builds the squared-distance matrix, then
        # Lance-Williams centroid merges run O(n) each (native/fastcluster.h)
        # — hour-scale diarization (n in the thousands) clusters in O(n^2)
        sq = np.einsum("ij,ij->i", pts, pts)
        # in-place: broadcast temporaries here are 3x n^2 doubles and cost
        # more wall-clock than the entire merge loop at n=6000
        sqdist = pts @ pts.T
        sqdist *= -2.0
        sqdist += sq[:, None]
        sqdist += sq[None, :]
        np.maximum(sqdist, 0.0, out=sqdist)
        fn = lib.fastcluster_centroid_linkage_lw
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_double),
        ]
        out = np.zeros(((n - 1), 4), np.float64)
        rc = fn(
            sqdist.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        if rc != 0:
            raise FastClusterError(f"fastcluster: {_ERRORS.get(rc, rc)}")
        return out
    if lib is not None:
        # stale .so without the LW symbol: original point-based path
        fn = lib.fastcluster_compute_centroid_linkage
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_long,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_double),
        ]
        out = np.zeros(((n - 1), 4), np.float64)
        rc = fn(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n,
            d,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        if rc != 0:
            raise FastClusterError(f"fastcluster: {_ERRORS.get(rc, rc)}")
        return out

    logger.warning("native fastcluster unavailable; using scipy fallback")
    from scipy.cluster.hierarchy import linkage

    return linkage(pts, method="centroid")


def cut_tree(dendrogram: np.ndarray, n: int, threshold: float) -> np.ndarray:
    """Flat cluster labels (0..k-1, order of first appearance) at threshold."""
    if n <= 0:
        return np.zeros(0, np.int64)
    if n == 1 or dendrogram.shape[0] == 0:
        return np.zeros(n, np.int64)
    lib = load_native()
    if lib is not None and hasattr(lib, "fastcluster_cut_tree"):
        fn = lib.fastcluster_cut_tree
        fn.restype = ctypes.c_long
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_long,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_long),
        ]
        den = np.ascontiguousarray(dendrogram, np.float64)
        labels = np.zeros(n, np.int64)
        k = fn(
            den.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n,
            float(threshold),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        )
        if k < 0:
            raise FastClusterError(f"cut_tree: {_ERRORS.get(-k, k)}")
        return labels
    from scipy.cluster.hierarchy import fcluster

    raw = fcluster(np.asarray(dendrogram, np.float64), t=threshold, criterion="distance")
    # renumber to order of first appearance
    remap: dict[int, int] = {}
    out = np.zeros(n, np.int64)
    for i, c in enumerate(raw):
        if c not in remap:
            remap[c] = len(remap)
        out[i] = remap[c]
    return out
