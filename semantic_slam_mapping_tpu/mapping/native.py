"""ctypes bindings for the native voxel-map runtime (native/voxel_map.cpp).

The C++ hash-map accumulator replaces the Python-dict GlobalMap insert loop
(the reference keeps this role in native PCL, mapper.cpp:106-170). Falls
back transparently to the pure-Python GlobalMap when the shared library has
not been built (``native/build.sh``)."""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = Path(__file__).resolve().parents[2] / "native" / "lib" / \
    "libssm_native.so"
_BUILD = Path(__file__).resolve().parents[2] / "native" / "build.sh"
_lib = None


def _load(build_if_missing: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and build_if_missing and _BUILD.exists():
        try:
            subprocess.run(["sh", str(_BUILD)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.voxel_map_create.restype = ctypes.c_void_p
    lib.voxel_map_create.argtypes = [ctypes.c_float]
    lib.voxel_map_destroy.argtypes = [ctypes.c_void_p]
    lib.voxel_map_clear.argtypes = [ctypes.c_void_p]
    lib.voxel_map_insert.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
    lib.voxel_map_size.restype = ctypes.c_int64
    lib.voxel_map_size.argtypes = [ctypes.c_void_p]
    lib.voxel_map_extract.restype = ctypes.c_int64
    lib.voxel_map_extract.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64]
    lib.voxel_map_save_pcd.restype = ctypes.c_int
    lib.voxel_map_save_pcd.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                       ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeVoxelMap:
    """Global voxel map backed by the C++ hash-map accumulator.

    API mirrors mapping.mapper.GlobalMap (insert_cloud / as_arrays /
    save_pcd / len)."""

    def __init__(self, resolution: float):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native library not built; run native/build.sh")
        self._lib = lib
        self._h = lib.voxel_map_create(ctypes.c_float(resolution))
        self.resolution = resolution
        self.updates = 0

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.voxel_map_destroy(self._h)
            self._h = None

    def insert(self, xyz: np.ndarray, rgb: np.ndarray,
               label: Optional[np.ndarray] = None,
               valid: Optional[np.ndarray] = None):
        xyz = np.ascontiguousarray(xyz, np.float32)
        rgb = np.ascontiguousarray(rgb, np.float32)
        n = len(xyz)
        lbl = (np.ascontiguousarray(label, np.int32)
               if label is not None else None)
        val = (np.ascontiguousarray(valid, np.uint8)
               if valid is not None else None)
        fptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        self._lib.voxel_map_insert(
            self._h, fptr(xyz), fptr(rgb),
            lbl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
            if lbl is not None else None,
            val.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
            if val is not None else None,
            ctypes.c_int64(n))
        self.updates += 1

    def insert_cloud(self, cloud):
        """Accepts a mapping.mapper.FrameCloud."""
        self.insert(np.asarray(cloud.xyz), np.asarray(cloud.rgb),
                    np.asarray(cloud.label),
                    np.asarray(cloud.valid).astype(np.uint8))

    def clear(self):
        self._lib.voxel_map_clear(self._h)

    def __len__(self) -> int:
        return int(self._lib.voxel_map_size(self._h))

    def as_arrays(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        n = len(self)
        xyz = np.empty((n, 3), np.float32)
        rgb = np.empty((n, 3), np.float32)
        lbl = np.empty(n, np.int32)
        fptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        got = self._lib.voxel_map_extract(
            self._h, fptr(xyz), fptr(rgb),
            lbl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int64(n))
        return xyz[:got], rgb[:got], lbl[:got]

    def save_pcd(self, path: str, binary: bool = True) -> None:
        rc = self._lib.voxel_map_save_pcd(
            self._h, str(path).encode(), 1 if binary else 0)
        if rc != 0:
            raise IOError(f"failed to write {path}")


def make_global_map(resolution: float):
    """NativeVoxelMap when built, else the pure-Python GlobalMap."""
    if available():
        return NativeVoxelMap(resolution)
    from semantic_slam_mapping_tpu.config import MapperConfig
    from semantic_slam_mapping_tpu.mapping.mapper import GlobalMap
    return GlobalMap(MapperConfig(resolution=resolution))
