"""ASCII point-cloud loading: .pts / .txt (the reference's pc_loader).

Semantics of ref src/pc_loader.cpp:17-90: for ``.pts`` the first line is the
point count; otherwise the count is the number of remaining lines.  Each
point line is whitespace-tokenized ``x y z [extras ignored]``.

A native C++ fast path (native/pc_loader.cpp via ctypes) is used when the
shared library has been built; the NumPy path is the always-available
fallback and the behavioral oracle.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_NATIVE = None


def _native_lib():
    global _NATIVE
    if _NATIVE is not None:
        return _NATIVE or None
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        "native",
        "libvofod_native.so",
    )
    if not os.path.exists(path):
        _NATIVE = False
        return None
    lib = ctypes.CDLL(path)
    lib.vofod_load_cloud.restype = ctypes.c_longlong
    lib.vofod_load_cloud.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_longlong,
    ]
    lib.vofod_count_points.restype = ctypes.c_longlong
    lib.vofod_count_points.argtypes = [ctypes.c_char_p]
    _NATIVE = lib
    return lib


def load_cloud(path: str, use_native: bool = True) -> np.ndarray:
    """Load an ASCII cloud; returns float32 [N, 3].

    Raises FileNotFoundError / ValueError like the reference logs errors
    (pc_loader.cpp:21-27 bad file, :52-60 bad line).
    """
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    if use_native:
        lib = _native_lib()
        if lib is not None:
            n = lib.vofod_count_points(path.encode())
            if n < 0:
                raise ValueError(f"cannot parse {path!r} (native loader)")
            out = np.empty((int(n), 3), np.float32)
            got = lib.vofod_load_cloud(
                path.encode(),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                int(n),
            )
            if got < 0:
                raise ValueError(f"cannot parse {path!r} (native loader)")
            return out[: int(got)]
    return _load_cloud_np(path)


def _load_cloud_np(path: str) -> np.ndarray:
    with open(path) as f:
        lines = [ln for ln in (l.strip() for l in f) if ln]
    if not lines:
        return np.zeros((0, 3), np.float32)
    start = 0
    declared = None
    if path.endswith(".pts"):
        # first line is the point count (ref pc_loader.cpp:31-40)
        toks = lines[0].split()
        if len(toks) == 1:
            try:
                declared = int(toks[0])
                start = 1
            except ValueError:
                declared = None
    pts = []
    for ln in lines[start:]:
        toks = ln.split()
        if len(toks) < 3:
            raise ValueError(f"bad point line in {path!r}: {ln!r}")
        pts.append((float(toks[0]), float(toks[1]), float(toks[2])))
    out = np.asarray(pts, np.float32).reshape(-1, 3)
    if declared is not None and declared != len(out):
        # the reference trusts the declared count for preallocation but
        # reads what is there; mirror: return what was read
        pass
    return out


def save_cloud(path: str, pts: np.ndarray, pts_header: bool | None = None):
    """Write an ASCII cloud (count header for .pts)."""
    pts = np.asarray(pts).reshape(-1, 3)
    header = pts_header if pts_header is not None else path.endswith(".pts")
    with open(path, "w") as f:
        if header:
            f.write(f"{len(pts)}\n")
        for x, y, z in pts:
            f.write(f"{x} {y} {z}\n")
