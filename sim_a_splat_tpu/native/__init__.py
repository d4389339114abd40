"""Native host-side geometry kernels (C++, ctypes-bound).

The TPU-native replacement of the reference's Open3D C++ usage
(match_splat.py:206-227 ICP correspondences, :240-251 RaycastingScene
occupancy/distance — SURVEY.md native components N8/N9): a 3-D KD-tree
and a triangle BVH implemented in ``geometry.cpp`` and compiled on first
use with the system ``g++`` into a cache directory.  Everything degrades
gracefully: if no compiler is available, ``available()`` is False and the
callers (tools/registration.py, tools/masks.py) keep their numpy/scipy
paths.

The build is keyed on the source hash, so editing ``geometry.cpp``
invalidates the cached ``.so`` automatically.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_SRCS = [Path(__file__).with_name("geometry.cpp"),
         Path(__file__).with_name("recorder.cpp")]
_LIB = None
_TRIED = False


def _cache_dir() -> Path:
    base = os.environ.get("SAS_NATIVE_CACHE") or os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "sim_a_splat_tpu")
    p = Path(base)
    p.mkdir(parents=True, exist_ok=True)
    return p


def _build() -> Path | None:
    h = hashlib.sha256()
    for s in _SRCS:
        h.update(s.read_bytes())
    out = _cache_dir() / f"_native_{h.hexdigest()[:16]}.so"
    if out.exists():
        return out
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td) / "native.so"
        cmd = (["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread"]
               + [str(s) for s in _SRCS] + ["-lz", "-o", str(tmp)])
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        except (OSError, subprocess.SubprocessError):
            return None
        tmp.replace(out)
    return out


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("SAS_NO_NATIVE"):
        return None
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(str(path))
    except OSError:
        return None
    c_d = ctypes.POINTER(ctypes.c_double)
    c_i = ctypes.POINTER(ctypes.c_int64)
    c_u8 = ctypes.POINTER(ctypes.c_uint8)
    lib.sas_kd_build.restype = ctypes.c_void_p
    lib.sas_kd_build.argtypes = [c_d, ctypes.c_int64]
    lib.sas_kd_query.argtypes = [ctypes.c_void_p, c_d, ctypes.c_int64, c_i, c_d]
    lib.sas_kd_free.argtypes = [ctypes.c_void_p]
    lib.sas_bvh_build.restype = ctypes.c_void_p
    lib.sas_bvh_build.argtypes = [c_d, ctypes.c_int64, c_i, ctypes.c_int64]
    lib.sas_bvh_distance.argtypes = [ctypes.c_void_p, c_d, ctypes.c_int64,
                                     c_d, c_i]
    lib.sas_bvh_occupancy.argtypes = [ctypes.c_void_p, c_d, ctypes.c_int64,
                                      c_u8]
    lib.sas_bvh_free.argtypes = [ctypes.c_void_p]
    lib.sas_npz_write.restype = ctypes.c_int64
    lib.sas_npz_write.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        c_i, c_i, ctypes.POINTER(ctypes.c_void_p), c_i, ctypes.c_int32]
    _LIB = lib
    return lib


def available() -> bool:
    """True when the compiled native library is usable on this host."""
    return _load() is not None


class KDTree:
    """Nearest-neighbour index over (N, 3) points (median-split KD-tree).

    Drop-in for the correspondence queries scipy's cKDTree served in
    tools/registration.py (reference: Open3D ICP internals).
    """

    def __init__(self, points: np.ndarray):
        lib = _load()
        if lib is None:
            raise RuntimeError("native geometry library unavailable")
        self._lib = lib
        pts = np.ascontiguousarray(points, np.float64)
        if pts.ndim != 2 or pts.shape[1] != 3:
            raise ValueError(f"expected (N, 3) points, got {pts.shape}")
        self._keep = pts
        self._h = lib.sas_kd_build(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(pts))

    def query(self, q: np.ndarray):
        """→ (dist (M,), index (M,)) of the nearest point for each query."""
        qq = np.ascontiguousarray(np.atleast_2d(q), np.float64)
        m = len(qq)
        idx = np.empty(m, np.int64)
        dist = np.empty(m, np.float64)
        self._lib.sas_kd_query(
            self._h, qq.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), m,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            dist.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return dist, idx

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.sas_kd_free(h)
            self._h = None


class TriBVH:
    """Triangle BVH: exact point→mesh distance and +z ray-parity occupancy
    (the RaycastingScene.compute_{distance,occupancy} analogue)."""

    def __init__(self, vertices: np.ndarray, faces: np.ndarray):
        lib = _load()
        if lib is None:
            raise RuntimeError("native geometry library unavailable")
        self._lib = lib
        v = np.ascontiguousarray(vertices, np.float64)
        f = np.ascontiguousarray(faces, np.int64)
        if v.ndim != 2 or v.shape[1] != 3 or f.ndim != 2 or f.shape[1] != 3:
            raise ValueError(f"bad mesh arrays {v.shape} {f.shape}")
        self._keep = (v, f)
        self._h = lib.sas_bvh_build(
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(v),
            f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(f))

    def distance(self, points: np.ndarray):
        """→ (dist (M,), nearest triangle index (M,))."""
        p = np.ascontiguousarray(np.atleast_2d(points), np.float64)
        m = len(p)
        dist = np.empty(m, np.float64)
        tri = np.empty(m, np.int64)
        self._lib.sas_bvh_distance(
            self._h, p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), m,
            dist.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            tri.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return dist, tri

    def occupancy(self, points: np.ndarray) -> np.ndarray:
        """→ (M,) bool point-in-mesh (watertight assumption)."""
        p = np.ascontiguousarray(np.atleast_2d(points), np.float64)
        m = len(p)
        out = np.empty(m, np.uint8)
        self._lib.sas_bvh_occupancy(
            self._h, p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), m,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out.astype(bool)

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.sas_bvh_free(h)
            self._h = None


def npz_write(path: str | os.PathLike, arrays: dict, level: int = 6) -> None:
    """Write ``arrays`` (str → ndarray) as a standard ``.npz`` readable by
    ``np.load``, with members deflate-compressed in parallel C++ threads.

    The datagen-rate shard writer behind utils.episodes.EpisodeRecorder
    (the zarr role the reference pins but never implements).  Raises
    RuntimeError if the native library is unavailable and OSError on zip32
    overflow (callers fall back to ``np.savez_compressed``).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native geometry library unavailable")
    def _contig(v):
        a = np.asarray(v)
        # ascontiguousarray would promote 0-d to (1,); 0-d is already contiguous
        return a if a.ndim == 0 else np.ascontiguousarray(a)

    items = [(str(k), _contig(v)) for k, v in arrays.items()]
    n = len(items)
    names = (ctypes.c_char_p * n)(*[k.encode() for k, _ in items])
    descrs = (ctypes.c_char_p * n)(
        *[np.lib.format.dtype_to_descr(a.dtype).encode() for _, a in items])
    ndims = np.asarray([a.ndim for _, a in items], np.int64)
    shapes = np.asarray(
        [d for _, a in items for d in a.shape] or [0], np.int64)
    data = (ctypes.c_void_p * n)(*[a.ctypes.data for _, a in items])
    nbytes = np.asarray([a.nbytes for _, a in items], np.int64)
    rc = lib.sas_npz_write(
        str(path).encode(), n, names, descrs,
        ndims.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        shapes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        data, nbytes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        int(level))
    if rc != 0:
        raise OSError(f"sas_npz_write failed with code {rc}")


__all__ = ["available", "KDTree", "TriBVH", "npz_write"]
