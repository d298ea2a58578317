"""ctypes bindings to the optional C++ host runtime (``native/``).

The reference's host-side runtime is C (WAV decode via aubio_source, MD5 via
OpenSSL — /root/reference/src/fp_handler.c:604,758). The rebuild keeps those
hot host paths native: ``native/tiresias_host.cpp`` provides WAV decode,
resampling and MD5 compiled to ``libtiresias_host.so``. This module loads it
lazily; every entry point returns ``None`` when the library is absent and the
pure-Python fallback is used instead.
"""

from __future__ import annotations

import ctypes
import os
import threading

import numpy as np

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_lib_tried = False


def _candidate_paths() -> list[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    names = ["libtiresias_host.so"]
    paths = []
    env = os.environ.get("TIRESIAS_NATIVE_LIB")
    if env:
        paths.append(env)
    for name in names:
        paths.append(os.path.join(here, "native", name))
        paths.append(os.path.join(here, name))
    return paths


def _load() -> ctypes.CDLL | None:
    global _lib, _lib_tried
    with _lock:
        if _lib_tried:
            return _lib
        _lib_tried = True
        if os.environ.get("TIRESIAS_DISABLE_NATIVE"):
            return None
        for path in _candidate_paths():
            if not os.path.exists(path):
                continue
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                continue
            try:
                _bind(lib)
            except AttributeError:
                continue
            _lib = lib
            break
        return _lib


def _bind(lib: ctypes.CDLL) -> None:
    # int tir_wav_info(const char* path, int* samplerate, long* n_samples)
    lib.tir_wav_info.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.tir_wav_info.restype = ctypes.c_int
    # int tir_wav_decode(const char* path, float* out, long capacity)
    lib.tir_wav_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
    ]
    lib.tir_wav_decode.restype = ctypes.c_int
    # int tir_md5_file(const char* path, char* hex_out /* 33 bytes */)
    lib.tir_md5_file.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.tir_md5_file.restype = ctypes.c_int


def available() -> bool:
    return _load() is not None


def decode_wav(path: str) -> tuple[np.ndarray, int] | None:
    """Decode a WAV to (float32 mono PCM, samplerate), or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    samplerate = ctypes.c_int(0)
    n_samples = ctypes.c_long(0)
    rc = lib.tir_wav_info(path.encode(), ctypes.byref(samplerate), ctypes.byref(n_samples))
    if rc != 0:
        return None
    out = np.empty(n_samples.value, dtype=np.float32)
    rc = lib.tir_wav_decode(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_long(out.size),
    )
    if rc != 0:
        return None
    return out, samplerate.value


def md5_file(path: str) -> str | None:
    lib = _load()
    if lib is None:
        return None
    buf = ctypes.create_string_buffer(33)
    rc = lib.tir_md5_file(path.encode(), buf)
    if rc != 0:
        return None
    return buf.value.decode()
