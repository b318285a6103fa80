"""ctypes wrapper for the C++ fast-BPE encoder (fast_bpe.cpp).

Builds the shared library lazily with g++ on first use (cached next to the
source; pybind11 is not in this image, so the C ABI + ctypes is the binding).
`SimpleTokenizer` uses this automatically when available and falls back to
the pure-Python merge loop otherwise — both paths are parity-tested.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fast_bpe.cpp")
_LIB = os.path.join(_HERE, "libfastbpe.so")
_BUILD_LOCK = threading.Lock()


def _build_lib() -> str:
    with _BUILD_LOCK:
        if (os.path.exists(_LIB)
                and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
            return _LIB
        tmp = _LIB + ".tmp"
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", tmp],
            check=True, capture_output=True)
        os.replace(tmp, _LIB)
        return _LIB


class FastBPE:
    """Drop-in replacement for the Python BPE merge loop + vocab lookup.

    Receives byte-mapped pre-tokens (see data/tokenizer.py: the regex
    pre-tokenizer and byte→unicode mapping stay in Python), returns ids.
    """

    def __init__(self, merges_path: str):
        lib = ctypes.CDLL(_build_lib())
        lib.fastbpe_create.restype = ctypes.c_void_p
        lib.fastbpe_create.argtypes = [ctypes.c_char_p]
        lib.fastbpe_destroy.argtypes = [ctypes.c_void_p]
        lib.fastbpe_encode.restype = ctypes.c_int32
        lib.fastbpe_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        self._lib = lib
        self._handle = lib.fastbpe_create(merges_path.encode())
        if not self._handle:
            raise RuntimeError(f"fastbpe_create failed for {merges_path}")

        # the byte→unicode map lives here (Python side of the split)
        from ..data.tokenizer import bytes_to_unicode
        self._byte_encoder = bytes_to_unicode()

        import regex as re
        self._pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
            r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE)

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.fastbpe_destroy(handle)
            self._handle = None

    def encode(self, text: str) -> List[int]:
        """`text` must already be cleaned/lowercased (SimpleTokenizer.encode
        does that before delegating here)."""
        be = self._byte_encoder
        pretokens = [
            "".join(be[b] for b in tok.encode("utf-8"))
            for tok in self._pat.findall(text)
        ]
        if not pretokens:
            return []
        payload = "\n".join(pretokens).encode("utf-8")
        cap = max(64, 4 * sum(len(p) for p in pretokens))
        buf = (ctypes.c_int32 * cap)()
        n = self._lib.fastbpe_encode(self._handle, payload, buf, cap)
        if n < 0:
            raise RuntimeError("fastbpe_encode overflow/error")
        return list(np.frombuffer(buf, dtype=np.int32, count=n))
