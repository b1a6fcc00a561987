"""JIT build + ctypes binding for the native audio kernels.

Parity note: the reference builds its only native component the same way —
at first use, with the system toolchain, cached on disk
(`torch.utils.cpp_extension.load`, bigvgan/alias_free_activation/cuda/
load.py:17-65). Here: g++ -O3 -shared, cached beside the source keyed by a
source hash, bound via ctypes (no pybind11 in this environment; ctypes
releases the GIL for the whole call, which is what lets the loader's
thread pool scale across cores).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading
from pathlib import Path
from typing import Optional

_SRC = Path(__file__).parent / "audio_kernels.cpp"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_FAILED = False


def _cache_dir() -> Path:
    root = os.environ.get("DMEL_NATIVE_CACHE") or os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "dmel_codec_tpu",
    )
    path = Path(root)
    path.mkdir(parents=True, exist_ok=True)
    return path


def _build() -> Path:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    out = _cache_dir() / f"audio_kernels_{tag}.so"
    if out.exists():
        return out
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td) / out.name
        base = [
            os.environ.get("CXX", "g++"),
            "-O3",
            "-shared",
            "-fPIC",
            "-std=c++17",
            str(_SRC),
            "-o",
            str(tmp),
        ]
        try:
            # -march=native vectorizes the decode/FIR loops; the .so is
            # cached per machine so native codegen is safe
            subprocess.run(
                base[:2] + ["-march=native"] + base[2:],
                check=True,
                capture_output=True,
            )
        except subprocess.CalledProcessError:
            subprocess.run(base, check=True, capture_output=True)
        os.replace(tmp, out)  # atomic: concurrent builders race safely
    return out


def load_library() -> Optional[ctypes.CDLL]:
    """Build (once) and load the kernels; None if no toolchain."""
    global _LIB, _FAILED
    if _LIB is not None or _FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        try:
            lib = ctypes.CDLL(str(_build()))
        except (OSError, subprocess.CalledProcessError):
            _FAILED = True
            return None
        lib.dmel_wav_info.restype = ctypes.c_int
        lib.dmel_wav_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.dmel_load_len.restype = ctypes.c_long
        lib.dmel_load_len.argtypes = [
            ctypes.c_char_p,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_int,
        ]
        lib.dmel_load_wav.restype = ctypes.c_long
        lib.dmel_load_wav.argtypes = [
            ctypes.c_char_p,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
        ]
        _LIB = lib
    return _LIB


def native_available() -> bool:
    return load_library() is not None
