"""ctypes bindings for the native host kernels (boxseg_native.cpp).

Auto-builds the shared library with g++ on first use (no pybind11 in the
image; CPython-independent C ABI via ctypes).  All functions degrade
gracefully: `geodesic_available()` reports whether the extension built, and
the connected-component helpers fall back to scipy when it didn't.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "libboxseg_native.so"
_LIB: Optional[ctypes.CDLL] = None
_BUILD_TRIED = False


def _build() -> bool:
    src = _DIR / "boxseg_native.cpp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(src),
           "-o", str(_SO)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _BUILD_TRIED
    if _LIB is not None:
        return _LIB
    if not _SO.exists():
        if _BUILD_TRIED:
            return None
        _BUILD_TRIED = True
        if not _build():
            return None
    lib = ctypes.CDLL(str(_SO))
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    c = ctypes.c_int
    cf = ctypes.c_float
    lib.geodesic2d_raster_scan.argtypes = [f32p, u8p, f32p, c, c, cf, c]
    lib.geodesic3d_raster_scan.argtypes = [f32p, u8p, f32p, c, c, c,
                                           cf, cf, cf, cf, c]
    lib.label_components_3d.argtypes = [u8p, i32p, c, c, c, c]
    lib.label_components_3d.restype = c
    lib.largest_component_3d.argtypes = [u8p, u8p, c, c, c, c]
    lib.largest_component_3d.restype = ctypes.c_long
    _LIB = lib
    return lib


def geodesic_available() -> bool:
    return _load() is not None


def geodesic_distance(image: np.ndarray, seeds: np.ndarray, lamb: float = 1.0,
                      iterations: int = 4,
                      spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0)
                      ) -> np.ndarray:
    """Raster-scan geodesic distance from seed voxels (GeodisTK semantics:
    lamb=0 spatial-only, lamb=1 intensity-gradient-only)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native extension unavailable (g++ build failed)")
    image = np.ascontiguousarray(image, np.float32)
    seeds = np.ascontiguousarray(seeds, np.uint8)
    dist = np.empty(image.shape, np.float32)
    if image.ndim == 2:
        lib.geodesic2d_raster_scan(image, seeds, dist, image.shape[0],
                                   image.shape[1], float(lamb), int(iterations))
    elif image.ndim == 3:
        lib.geodesic3d_raster_scan(image, seeds, dist, image.shape[0],
                                   image.shape[1], image.shape[2],
                                   float(spacing[0]), float(spacing[1]),
                                   float(spacing[2]), float(lamb),
                                   int(iterations))
    else:
        raise ValueError(f"2D/3D only, got ndim={image.ndim}")
    return dist


def label_components(mask: np.ndarray, connectivity: int = 1):
    """3D connected-component labeling → (labels int32, count).  Falls back
    to scipy.ndimage.label when the native library is unavailable."""
    mask3 = mask[None] if mask.ndim == 2 else mask
    lib = _load()
    if lib is None:
        from scipy import ndimage as ndi
        struct = ndi.generate_binary_structure(mask3.ndim, connectivity)
        labels, n = ndi.label(mask3, struct)
        labels = labels.astype(np.int32)
    else:
        m = np.ascontiguousarray(mask3 != 0, np.uint8)
        labels = np.empty(m.shape, np.int32)
        n = lib.label_components_3d(m, labels, m.shape[0], m.shape[1],
                                    m.shape[2], int(connectivity))
    if mask.ndim == 2:
        labels = labels[0]
    return labels, int(n)


def largest_component(mask: np.ndarray, connectivity: int = 1) -> np.ndarray:
    """Largest connected component as a binary mask (native fast path for the
    eval postprocess hot loop, reference array_kits.py:357-384)."""
    mask3 = mask[None] if mask.ndim == 2 else mask
    lib = _load()
    if lib is None:
        from boxsegliver_tpu.ops.array_kits import get_largest_component
        return get_largest_component(mask, rank=mask.ndim)
    m = np.ascontiguousarray(mask3 != 0, np.uint8)
    out = np.empty(m.shape, np.uint8)
    lib.largest_component_3d(m, out, m.shape[0], m.shape[1], m.shape[2],
                             int(connectivity))
    if mask.ndim == 2:
        out = out[0]
    return out.astype(mask.dtype) if mask.dtype != np.uint8 else out
