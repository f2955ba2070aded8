"""MaskCreator tool: accumulate a sensor FOV mask from live scans.

Reference: the second nodelet, vofod/MaskCreator (src/mask_creator.cpp):
pixels that EVER return ``range == 0`` across accumulated scans are marked
occluded (cloud_callback :217-235); ~save / ~reset services (:193-211,
253-260).  Here the accumulation is a trivial jitted reduce over the scan
stream and the mask is written as .npy or .png.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class MaskCreator:
    def __init__(self, vertical_rays: int, horizontal_rays: int):
        self.h = vertical_rays
        self.w = horizontal_rays
        self._acc = jnp.ones((vertical_rays * horizontal_rays,), jnp.bool_)
        self._n_scans = 0
        self._update = jax.jit(lambda acc, r: acc & (r > 0))

    def add_scan(self, ranges_mm: np.ndarray) -> None:
        r = jnp.asarray(np.asarray(ranges_mm).reshape(-1).astype(np.uint32))
        if r.shape[0] != self.h * self.w:
            raise ValueError("scan size mismatch")
        self._acc = self._update(self._acc, r)
        self._n_scans += 1

    @property
    def n_scans(self) -> int:
        return self._n_scans

    def mask(self) -> np.ndarray:
        """uint8 [H, W]; 1 = pixel usable (had a return in some scan)."""
        return np.asarray(self._acc).reshape(self.h, self.w).astype(np.uint8)

    def save(self, path: str) -> None:
        """~save service (ref mask_creator.cpp:253-260)."""
        m = self.mask()
        if path.endswith(".npy"):
            np.save(path, m)
            return
        try:
            from PIL import Image  # optional

            Image.fromarray(m * 255).save(path)
        except ImportError:
            np.save(path + ".npy", m)

    def reset(self) -> None:
        """~reset service."""
        self._acc = jnp.ones((self.h * self.w,), jnp.bool_)
        self._n_scans = 0
