"""ctypes binding to the native int8 runtime (``native/``).

Builds and loads ``libdfqrt.so``; exposes a numpy forward matching the
JAX engine's semantics. The reference's analog is driving ncnn from
Python via subprocess (``convert_ncnn.py``); here it's an in-process
C ABI.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libdfqrt.so")


def build_native(force: bool = False) -> str:
    """Build the native runtime with cmake+ninja; returns the .so path."""
    if os.path.exists(_LIB_PATH) and not force:
        return _LIB_PATH
    os.makedirs(_BUILD_DIR, exist_ok=True)
    subprocess.run(
        ["cmake", "-G", "Ninja", ".."],
        cwd=_BUILD_DIR, check=True, capture_output=True,
    )
    subprocess.run(
        ["ninja"], cwd=_BUILD_DIR, check=True, capture_output=True
    )
    return _LIB_PATH


class NativeModel:
    def __init__(self, prefix: str, lib_path: Optional[str] = None):
        lib_path = lib_path or build_native()
        self._lib = ctypes.CDLL(lib_path)
        self._lib.dfqrt_load.restype = ctypes.c_void_p
        self._lib.dfqrt_load.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        self._lib.dfqrt_free.argtypes = [ctypes.c_void_p]
        self._lib.dfqrt_forward.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        self._lib.dfqrt_num_outputs.argtypes = [ctypes.c_void_p]
        self._lib.dfqrt_output_ndim.argtypes = [ctypes.c_void_p, ctypes.c_int]
        self._lib.dfqrt_output_dims.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ]
        self._lib.dfqrt_output_data.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        self._lib.dfqrt_last_error.restype = ctypes.c_char_p
        self._handle = self._lib.dfqrt_load(
            (prefix + ".dfqparam").encode(), (prefix + ".dfqbin").encode()
        )
        if not self._handle:
            raise RuntimeError(
                f"dfqrt_load failed: {self._lib.dfqrt_last_error().decode()}"
            )

    def forward(self, x: np.ndarray) -> List[np.ndarray]:
        x = np.ascontiguousarray(x, np.float32)
        dims = (ctypes.c_int * x.ndim)(*x.shape)
        rc = self._lib.dfqrt_forward(
            self._handle,
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            dims,
            x.ndim,
        )
        if rc != 0:
            raise RuntimeError(
                f"dfqrt_forward failed: {self._lib.dfqrt_last_error().decode()}"
            )
        outs = []
        for i in range(self._lib.dfqrt_num_outputs(self._handle)):
            nd = self._lib.dfqrt_output_ndim(self._handle, i)
            od = (ctypes.c_int * nd)()
            self._lib.dfqrt_output_dims(self._handle, i, od)
            shape = tuple(od[j] for j in range(nd))
            buf = np.empty(shape, np.float32)
            self._lib.dfqrt_output_data(
                self._handle, i, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            )
            outs.append(buf)
        return outs

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.dfqrt_free(self._handle)
        except Exception:
            pass
