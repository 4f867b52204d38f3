"""Native safetensors reader/writer (ctypes over native/safetensors.c).

The reference's checkpoint serialization rides the vendored Rust
`safetensors` crate (reference: train/convert_safetensors.py:6-16, MLX
`load_weights`); this is the framework's own implementation of the format.

- `load_file`: the C side parses the header; tensors are returned as
  zero-copy numpy views over a single `np.memmap` of the data section
  (the memmap slice keeps the mapping alive via `.base`). BF16 is
  supported through `ml_dtypes` — a dtype the Rust→numpy path rejects.
- `save_file`: the C side serializes the header and streams tensor bytes.

Falls back (ImportError-style, via `native_st_available()`) when no C
toolchain is present; callers keep the `safetensors` package as fallback.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from smoltts_tpu.native import build_native_lib

_SRC = Path(__file__).parent / "safetensors.c"


def _dtype_table():
    table = {
        "F64": np.dtype("<f8"),
        "F32": np.dtype("<f4"),
        "F16": np.dtype("<f2"),
        "I64": np.dtype("<i8"),
        "I32": np.dtype("<i4"),
        "I16": np.dtype("<i2"),
        "I8": np.dtype("i1"),
        "U8": np.dtype("u1"),
        "U16": np.dtype("<u2"),
        "U32": np.dtype("<u4"),
        "U64": np.dtype("<u8"),
        "BOOL": np.dtype(bool),
    }
    try:
        import ml_dtypes  # ships with jax

        table["BF16"] = np.dtype(ml_dtypes.bfloat16)
    except Exception:
        pass
    return table


_STR_TO_NP = _dtype_table()
_NP_TO_STR = {v: k for k, v in _STR_TO_NP.items()}


def _lib() -> Optional[ctypes.CDLL]:
    lib = build_native_lib(_SRC, "safetensors")
    if lib is None or getattr(lib, "_st_bound", False):
        return lib
    lib.st_open.restype = ctypes.c_void_p
    lib.st_open.argtypes = [ctypes.c_char_p]
    lib.st_error.restype = ctypes.c_char_p
    lib.st_error.argtypes = [ctypes.c_void_p]
    lib.st_data_start.restype = ctypes.c_uint64
    lib.st_data_start.argtypes = [ctypes.c_void_p]
    lib.st_count.restype = ctypes.c_int
    lib.st_count.argtypes = [ctypes.c_void_p]
    lib.st_name.restype = ctypes.c_char_p
    lib.st_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.st_dtype.restype = ctypes.c_char_p
    lib.st_dtype.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.st_ndim.restype = ctypes.c_int
    lib.st_ndim.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.st_shape.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int64)]
    lib.st_offsets.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.st_close.argtypes = [ctypes.c_void_p]
    lib.st_writer_new.restype = ctypes.c_void_p
    lib.st_writer_add.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int,
        ctypes.c_uint64,
    ]
    lib.st_writer_begin.restype = ctypes.c_int
    lib.st_writer_begin.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.st_writer_data.restype = ctypes.c_int
    lib.st_writer_data.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64]
    lib.st_writer_finish.restype = ctypes.c_int
    lib.st_writer_finish.argtypes = [ctypes.c_void_p]
    lib._st_bound = True
    return lib


def native_st_available() -> bool:
    return _lib() is not None


def load_file(path, mmap: bool = True) -> Dict[str, np.ndarray]:
    """Read a .safetensors file into {name: ndarray}.

    With mmap=True arrays are read-only zero-copy views over the file
    mapping; pass mmap=False for independent in-memory copies.
    """
    lib = _lib()
    if lib is None:
        raise RuntimeError("native safetensors unavailable (no C toolchain)")
    path = str(path)
    handle = lib.st_open(path.encode())
    if not handle:
        raise OSError(f"st_open failed for {path}")
    try:
        err = lib.st_error(handle)
        if err:
            raise ValueError(f"safetensors parse error in {path}: {err.decode()}")
        data_start = lib.st_data_start(handle)
        mm = np.memmap(path, dtype=np.uint8, mode="r")
        out: Dict[str, np.ndarray] = {}
        shape_buf = (ctypes.c_int64 * 8)()
        b = ctypes.c_uint64()
        e = ctypes.c_uint64()
        for i in range(lib.st_count(handle)):
            name = lib.st_name(handle, i).decode()
            dt_s = lib.st_dtype(handle, i).decode()
            if dt_s not in _STR_TO_NP:
                raise ValueError(f"unsupported dtype {dt_s} for tensor {name}")
            dt = _STR_TO_NP[dt_s]
            ndim = lib.st_ndim(handle, i)
            lib.st_shape(handle, i, shape_buf)
            shape = tuple(shape_buf[j] for j in range(ndim))
            lib.st_offsets(handle, i, ctypes.byref(b), ctypes.byref(e))
            nbytes = e.value - b.value
            expect = int(np.prod(shape, dtype=np.int64)) * dt.itemsize if shape else dt.itemsize
            if ndim == 0:
                expect = dt.itemsize
            if nbytes != expect:
                raise ValueError(
                    f"tensor {name}: data_offsets span {nbytes} bytes, expected {expect}"
                )
            lo = data_start + b.value
            arr = mm[lo : lo + nbytes].view(dt).reshape(shape)
            out[name] = np.array(arr) if not mmap else arr
        return out
    finally:
        lib.st_close(handle)


def save_file(tensors: Dict[str, np.ndarray], path) -> None:
    """Write {name: ndarray} as a .safetensors file (native writer)."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native safetensors unavailable (no C toolchain)")
    arrays = {}
    for name, a in tensors.items():
        a = np.ascontiguousarray(a)
        if a.dtype.byteorder == ">":
            a = a.astype(a.dtype.newbyteorder("<"))
        if a.dtype not in _NP_TO_STR:
            raise ValueError(f"unsupported numpy dtype {a.dtype} for tensor {name}")
        arrays[name] = a
    w = lib.st_writer_new()
    for name, a in arrays.items():
        shape = (ctypes.c_int64 * max(1, a.ndim))(*a.shape)
        lib.st_writer_add(
            w, name.encode(), _NP_TO_STR[a.dtype].encode(), shape, a.ndim, a.nbytes
        )
    if lib.st_writer_begin(w, str(path).encode()) != 0:
        lib.st_writer_finish(w)
        raise OSError(f"cannot write {path}")
    ok = True
    for a in arrays.values():
        if lib.st_writer_data(w, a.ctypes.data_as(ctypes.c_void_p), a.nbytes) != 0:
            ok = False
            break
    if lib.st_writer_finish(w) != 0 or not ok:
        raise OSError(f"write failed for {path}")
