"""Native (C) host-side components, loaded via ctypes.

The reference's performance-critical host code lives in vendored Rust
(HF `tokenizers`, `safetensors`); this package holds the framework's own
native equivalents. Components build on demand with the system compiler and
fall back to the pure-Python implementations when no toolchain is present.

Currently: `NativeByteTokenizer` — byte-level tokenizer over the smoltts
vocab with greedy longest-match special tokens (first-byte indexed),
vocab-identical to smoltts_tpu.tokenizer.ByteTokenizer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from pathlib import Path
from typing import List, Optional

_SRC = Path(__file__).parent / "tokenizer.c"
_LIB_CACHE: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False

# Generic on-demand builder, shared by all native components in this package.
_GENERIC_CACHE: dict = {}


def build_native_lib(src: Path, name: str, extra_flags=()) -> Optional[ctypes.CDLL]:
    """Compile `src` into a cached shared object and dlopen it.

    Returns None (and caches the failure) when no C toolchain is present, so
    callers can fall back to pure-Python implementations.
    """
    key = (str(src), name)
    if key in _GENERIC_CACHE:
        return _GENERIC_CACHE[key]
    so_path = Path(tempfile.gettempdir()) / f"smoltts_native_{name}.so"
    try:
        if not so_path.exists() or so_path.stat().st_mtime < src.stat().st_mtime:
            # Compile to a private temp path, then atomically publish:
            # concurrent processes (pytest-xdist workers) may race this
            # build, and `cc -o` writing the file another process is
            # dlopen()ing would hand out a torn .so.
            tmp = so_path.with_suffix(f".{os.getpid()}.tmp")
            subprocess.run(
                ["cc", "-O2", "-shared", "-fPIC", *extra_flags, str(src), "-o", str(tmp)],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(str(so_path))
    except Exception:
        _GENERIC_CACHE[key] = None
        return None
    _GENERIC_CACHE[key] = lib
    return lib


def _build_lib() -> Optional[ctypes.CDLL]:
    global _LIB_CACHE, _BUILD_FAILED
    if _LIB_CACHE is not None:
        return _LIB_CACHE
    if _BUILD_FAILED:
        return None
    so_path = Path(tempfile.gettempdir()) / "smoltts_native_tokenizer.so"
    try:
        if not so_path.exists() or so_path.stat().st_mtime < _SRC.stat().st_mtime:
            tmp = so_path.with_suffix(f".{os.getpid()}.tmp")  # atomic publish
            subprocess.run(
                ["cc", "-O2", "-shared", "-fPIC", str(_SRC), "-o", str(tmp)],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(str(so_path))
    except Exception:
        _BUILD_FAILED = True
        return None

    lib.smoltts_tokenizer_new.restype = ctypes.c_void_p
    lib.smoltts_tokenizer_free.argtypes = [ctypes.c_void_p]
    lib.smoltts_tokenizer_add_special.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.smoltts_tokenizer_finalize.argtypes = [ctypes.c_void_p]
    lib.smoltts_tokenizer_encode.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
    ]
    lib.smoltts_tokenizer_encode.restype = ctypes.c_int
    _LIB_CACHE = lib
    return lib


def native_available() -> bool:
    return _build_lib() is not None


class NativeByteTokenizer:
    """ctypes front-end over the C tokenizer; same API as ByteTokenizer."""

    def __init__(self, codebook_size: int = 2048):
        from smoltts_tpu.tokenizer import ByteTokenizer, special_token_list

        self._py = ByteTokenizer(codebook_size)  # decode + id lookups
        self.codebook_size = codebook_size
        self.vocab_size = self._py.vocab_size
        lib = _build_lib()
        if lib is None:
            raise RuntimeError("native tokenizer unavailable (no C toolchain)")
        self._lib = lib
        self._handle = lib.smoltts_tokenizer_new()
        for i, tok in enumerate(special_token_list(codebook_size)):
            lib.smoltts_tokenizer_add_special(
                self._handle, tok.encode("utf-8"), 256 + i
            )
        lib.smoltts_tokenizer_finalize(self._handle)

    def __del__(self):
        try:
            self._lib.smoltts_tokenizer_free(self._handle)
        except Exception:
            pass

    def token_to_id(self, token: str):
        return self._py.token_to_id(token)

    def id_to_token(self, idx: int):
        return self._py.id_to_token(idx)

    def decode(self, ids: List[int]) -> str:
        return self._py.decode(ids)

    def encode(self, text: str) -> List[int]:
        # HF byte-level semantics: latin-1 characters are vocab ids;
        # characters outside latin-1 are dropped (see ByteTokenizer).
        data = "".join(c for c in text if ord(c) < 256).encode("latin-1")
        cap = len(data) + 8
        buf = (ctypes.c_int32 * cap)()
        n = self._lib.smoltts_tokenizer_encode(
            self._handle, data, len(data), buf, cap
        )
        if n < 0:
            raise RuntimeError("tokenizer buffer overflow")
        return list(buf[:n])
