"""Second decode oracle: the system's libmpg123 via ctypes.

Used to cross-check libav and to extract the Huffman-code regions where
libav's error concealment zeroes the granule (making them unobservable
through the first oracle).
"""

from __future__ import annotations

import ctypes
import os
import tempfile

import numpy as np

MPG123_MONO = 1
MPG123_STEREO = 2
MPG123_ENC_FLOAT_32 = 0x200
MPG123_OK = 0
MPG123_DONE = -12
MPG123_NEW_FORMAT = -11

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL("libmpg123.so.0")
    lib.mpg123_init()
    lib.mpg123_new.restype = ctypes.c_void_p
    lib.mpg123_new.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
    lib.mpg123_open.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.mpg123_close.argtypes = [ctypes.c_void_p]
    lib.mpg123_delete.argtypes = [ctypes.c_void_p]
    lib.mpg123_format_none.argtypes = [ctypes.c_void_p]
    lib.mpg123_format.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                  ctypes.c_int, ctypes.c_int]
    lib.mpg123_read.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t)]
    lib.mpg123_param.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                 ctypes.c_long, ctypes.c_double]
    _lib = lib
    return lib


def decode_frames_mpg123(frames: list[bytes], rate: int = 48000,
                         channels: int = 1) -> np.ndarray:
    lib = _load()
    blob = b"".join(frames)
    fd, path = tempfile.mkstemp(suffix=".mp3")
    out = bytearray()
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(blob)
        err = ctypes.c_int(0)
        h = ctypes.c_void_p(lib.mpg123_new(None, ctypes.byref(err)))
        assert h.value, "mpg123_new failed"
        try:
            lib.mpg123_param(h, 2, 0x20, 0.0)   # MPG123_FLAGS |= MPG123_QUIET
            lib.mpg123_format_none(h)
            assert lib.mpg123_format(
                h, rate, MPG123_MONO if channels == 1 else MPG123_STEREO,
                MPG123_ENC_FLOAT_32) == MPG123_OK
            assert lib.mpg123_open(h, path.encode()) == MPG123_OK
            buf = ctypes.create_string_buffer(1 << 16)
            done = ctypes.c_size_t(0)
            while True:
                rc = lib.mpg123_read(h, buf, len(buf), ctypes.byref(done))
                out.extend(buf.raw[: done.value])
                if rc not in (MPG123_OK, MPG123_NEW_FORMAT):
                    break
            lib.mpg123_close(h)
        finally:
            lib.mpg123_delete(h)
    finally:
        os.unlink(path)
    x = np.frombuffer(bytes(out), "<f4")
    if channels == 2:
        x = x.reshape(-1, 2).T
    return x
