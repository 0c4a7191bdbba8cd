"""ctypes bindings for the native preprocessing core (preprocess.cc).

Builds ``libpreprocess.so`` on first import if a compiler is available;
falls back transparently to the numpy implementations otherwise (check
``AVAILABLE``). Used by the data pipeline's hot per-sample paths.
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libpreprocess.so")
_SRC = os.path.join(_DIR, "preprocess.cc")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i64, u64, f32, f64, i32 = (ctypes.c_int64, ctypes.c_uint64,
                               ctypes.c_float, ctypes.c_double, ctypes.c_int)
    pf = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    pu = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    pi = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.hu_window_normalize.argtypes = [pf, i64, f32, f32, f32, f32]
    lib.scale_intensity_range.argtypes = [pf, i64, f32, f32, f32, f32, i32]
    lib.crop3d_f32.argtypes = [pf] + [i64] * 9 + [pf]
    lib.crop3d_u8.argtypes = [pu] + [i64] * 9 + [pu]
    lib.sample_crop_centers.argtypes = ([pu] + [i64] * 6 + [f64, f64, i64, u64, pi])
    lib.sample_crop_centers.restype = i32
    _lib = lib
    return lib


AVAILABLE = _load() is not None


def hu_window_normalize(img: np.ndarray, low: float, high: float,
                        mean: float, std: float) -> np.ndarray:
    """In-place-capable native HU window + standardise; returns float32."""
    lib = _load()
    out = np.ascontiguousarray(img, np.float32)
    if out is img:
        out = img.copy()
    if lib is None:
        return ((np.clip(out, low, high) - mean) / std).astype(np.float32)
    lib.hu_window_normalize(out, out.size, low, high, mean, 1.0 / std)
    return out


def crop3d(volume: np.ndarray, start, size) -> np.ndarray:
    """Native strided crop of a contiguous (H, W, D) volume."""
    lib = _load()
    x, y, z = (int(v) for v in start)
    sh, sw, sd = (int(v) for v in size)
    if lib is None:
        return np.ascontiguousarray(
            volume[x:x + sh, y:y + sw, z:z + sd])
    volume = np.ascontiguousarray(volume)
    if volume.dtype == np.float32:
        out = np.empty((sh, sw, sd), np.float32)
        lib.crop3d_f32(volume, *volume.shape, x, y, z, sh, sw, sd, out)
    elif volume.dtype == np.uint8:
        out = np.empty((sh, sw, sd), np.uint8)
        lib.crop3d_u8(volume, *volume.shape, x, y, z, sh, sw, sd, out)
    else:
        return np.ascontiguousarray(volume[x:x + sh, y:y + sw, z:z + sd])
    return out


def sample_crop_centers(label: np.ndarray, size, pos: float, neg: float,
                        n_samples: int, seed: int) -> np.ndarray:
    """Native pos/neg-biased crop origins; (n_samples, 3) int64 or None."""
    lib = _load()
    if lib is None:
        return None
    label = np.ascontiguousarray(label, np.uint8)
    out = np.empty((n_samples, 3), np.int64)
    rc = lib.sample_crop_centers(
        label, *label.shape, *(int(s) for s in size),
        float(pos), float(neg), int(n_samples),
        np.uint64(seed % (2 ** 64)), out)
    if rc != 0:
        return None
    return out
