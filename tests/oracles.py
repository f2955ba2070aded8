"""NumPy reference implementations of the reference-C++ semantics.

Written from the behavior of /root/reference (cited per function), these are
the golden oracles the TPU kernels are tested against on tiny grids.
"""

from __future__ import annotations

import math

import numpy as np


def ball_offsets_np(radius: float):
    r = int(math.floor(radius))
    out = []
    for dz in range(-r, r + 1):
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                if dz * dz + dy * dy + dx * dx <= radius * radius + 1e-9:
                    out.append((dz, dy, dx))
    return out


def ball_pool_min_np(a: np.ndarray, radius: float) -> np.ndarray:
    fill = np.iinfo(a.dtype).max if a.dtype.kind == "i" else np.inf
    out = np.full_like(a, fill)
    nz, ny, nx = a.shape
    for dz, dy, dx in ball_offsets_np(radius):
        src = np.full_like(out, fill)
        zs = slice(max(0, -dz), min(nz, nz - dz))
        ys = slice(max(0, -dy), min(ny, ny - dy))
        xs = slice(max(0, -dx), min(nx, nx - dx))
        zs2 = slice(max(0, dz), min(nz, nz + dz))
        ys2 = slice(max(0, dy), min(ny, ny + dy))
        xs2 = slice(max(0, dx), min(nx, nx + dx))
        src[zs, ys, xs] = a[zs2, ys2, xs2]
        out = np.minimum(out, src)
    return out


def euclidean_clusters_np(occupied: np.ndarray, radius: float):
    """ECE over occupied voxels with tolerance = radius index units
    (ref vofod_nodelet.cpp:689-698 on voxel-center points)."""
    offs = ball_offsets_np(radius)
    labels = -np.ones(occupied.shape, np.int64)
    nz, ny, nx = occupied.shape
    comp = 0
    for z0, y0, x0 in zip(*np.nonzero(occupied)):
        if labels[z0, y0, x0] >= 0:
            continue
        stack = [(z0, y0, x0)]
        labels[z0, y0, x0] = comp
        while stack:
            z, y, x = stack.pop()
            for dz, dy, dx in offs:
                zz, yy, xx = z + dz, y + dy, x + dx
                if 0 <= zz < nz and 0 <= yy < ny and 0 <= xx < nx:
                    if occupied[zz, yy, xx] and labels[zz, yy, xx] < 0:
                        labels[zz, yy, xx] = comp
                        stack.append((zz, yy, xx))
        comp += 1
    return labels, comp


def dda_raylen_np(
    shape, origin, voxel, starts, dirs, lengths, valid
) -> np.ndarray:
    """Per-ray Amanatides–Woo accumulation (ref voxel_map.cpp:229-263).

    shape = (nz, ny, nx); origin = world coords of voxel (0,0,0) low corner.
    """
    nz, ny, nx = shape
    out = np.zeros(shape, np.float64)
    ox, oy, oz = origin
    for s, d, L, v in zip(starts, dirs, lengths, valid):
        if not v or L <= 0:
            continue
        absdir = np.abs(d)
        step = np.sign(d).astype(int)
        with np.errstate(divide="ignore"):
            tdelta = np.where(absdir > 0, voxel / absdir, np.inf)
        cur = np.floor((s - [ox, oy, oz]) / voxel).astype(int)  # (x, y, z)
        ctr = (cur + 0.5) * voxel + [ox, oy, oz] - s
        with np.errstate(divide="ignore", invalid="ignore"):
            tmax = np.where(
                absdir > 0, (voxel / 2 + step * ctr) / absdir, np.inf
            )
        last = np.where(step > 0, [nx - 1, ny - 1, nz - 1], 0)
        prev = 0.0
        while prev < L:
            i = int(np.argmin(tmax))
            dist = tmax[i]
            dd = min(dist, L) - prev
            out[cur[2], cur[1], cur[0]] += dd
            prev = dist
            if cur[i] == last[i]:
                break
            cur[i] += step[i]
            tmax[i] += tdelta[i]
    return out


def explore_to_ground_np(
    vals: np.ndarray, start_xyz, unknown_thr, ground_thr, max_voxel_dist
):
    """DFS of ref voxel_map.cpp:402-488. start_xyz = (ix, iy, iz).

    Returns (connected, explored_unknown set of (ix, iy, iz))."""
    nz, ny, nx = vals.shape
    x0, y0, z0 = start_xyz
    if x0 <= 0 or y0 <= 0 or z0 <= 0:
        return True, set()
    if x0 >= nx - 1 or y0 >= ny - 1 or z0 >= nz - 1:
        return True, set()
    explored = set()
    explored_unknown = []
    to_explore = [(x0, y0, z0)]
    while to_explore:
        cur = to_explore.pop()
        x, y, z = cur
        v = vals[z, y, x]
        if v > ground_thr:
            return True, set()
        if v > unknown_thr:
            explored_unknown.append(cur)
            manh = abs(x - x0) + abs(y - y0) + abs(z - z0)
            if manh == max_voxel_dist - 1:
                return True, set()
            for dx, dy, dz in (
                (1, 0, 0), (0, 1, 0), (0, 0, 1), (-1, 0, 0), (0, -1, 0), (0, 0, -1),
            ):
                xx, yy, zz = x + dx, y + dy, z + dz
                if not (0 <= xx < nx and 0 <= yy < ny and 0 <= zz < nz):
                    continue
                # ref bounds guards (expand only if strictly inside)
                if dx > 0 and x >= nx - 1:
                    continue
                if dy > 0 and y >= ny - 1:
                    continue
                if dz > 0 and z >= nz - 1:
                    continue
                if dx < 0 and x <= 0:
                    continue
                if dy < 0 and y <= 0:
                    continue
                if dz < 0 and z <= 0:
                    continue
                cand = (xx, yy, zz)
                manh2 = abs(xx - x0) + abs(yy - y0) + abs(zz - z0)
                if cand not in explored and manh2 <= max_voxel_dist:
                    to_explore.append(cand)
        explored.add(cur)
    return False, set(explored_unknown)
