"""ctypes bindings to the native (C++) reblocking cascade.

Loads ``phd_qmclib_tpu/_native/libreblock.so`` when present (build with
``make -C csrc``); callers fall back to the vectorized NumPy
implementation otherwise.  Disable explicitly with
``PHD_QMCLIB_TPU_NATIVE=0``.
"""
import ctypes
import os
import pathlib
import typing as t

import numpy as np

__all__ = ["native_available", "otf_reblock_native"]

_LIB_PATH = (pathlib.Path(__file__).resolve().parent.parent
             / "_native" / "libreblock.so")

_lib = None
if os.environ.get("PHD_QMCLIB_TPU_NATIVE", "1") != "0" \
        and _LIB_PATH.exists():
    try:
        _lib = ctypes.CDLL(str(_LIB_PATH))
        _lib.otf_reblock_f64.restype = None
        _lib.otf_reblock_f64.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # data
            ctypes.c_int64,                   # n
            ctypes.c_int64,                   # num_cols
            ctypes.c_int64,                   # max_order
            ctypes.POINTER(ctypes.c_double),  # means_sum
            ctypes.POINTER(ctypes.c_double),  # means_sqr_sum
            ctypes.POINTER(ctypes.c_int64),   # num_blocks
        ]
    except OSError:  # pragma: no cover - corrupt/foreign binary
        _lib = None


def native_available() -> bool:
    return _lib is not None


def otf_reblock_native(data: np.ndarray, max_order: int) \
        -> t.Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Run the native cascade on ``data (n, num_cols)`` float64.

    Returns ``(means_sum, means_sqr_sum, num_blocks)`` each of shape
    ``(num_cols, max_order + 1)``.
    """
    assert _lib is not None
    data = np.ascontiguousarray(data, dtype=np.float64)
    n, num_cols = data.shape
    orders = max_order + 1
    means_sum = np.zeros((num_cols, orders), dtype=np.float64)
    means_sqr_sum = np.zeros((num_cols, orders), dtype=np.float64)
    num_blocks = np.zeros((num_cols, orders), dtype=np.int64)
    _lib.otf_reblock_f64(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, num_cols, max_order,
        means_sum.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        means_sqr_sum.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        num_blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return means_sum, means_sqr_sum, num_blocks
