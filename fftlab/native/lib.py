"""Loader for libfftlab_native.so (auto-builds via make, caches)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_ERR: str | None = None

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO = os.path.join(_NATIVE_DIR, "libfftlab_native.so")


def _build() -> None:
    subprocess.run(
        ["make", "-C", _NATIVE_DIR],
        check=True, capture_output=True, text=True, timeout=120,
    )


def _declare(lib: ctypes.CDLL) -> None:
    c = ctypes
    lib.fftlab_wav_info.restype = c.c_int32
    lib.fftlab_wav_info.argtypes = [
        c.c_char_p, c.POINTER(c.c_int32), c.POINTER(c.c_int32),
        c.POINTER(c.c_int64), c.POINTER(c.c_int32),
    ]
    lib.fftlab_wav_read_f32.restype = c.c_int64
    lib.fftlab_wav_read_f32.argtypes = [
        c.c_char_p, c.POINTER(c.c_float), c.c_int64,
    ]
    lib.fftlab_wav_write_pcm16.restype = c.c_int32
    lib.fftlab_wav_write_pcm16.argtypes = [
        c.c_char_p, c.POINTER(c.c_float), c.c_int64, c.c_int32, c.c_int32,
    ]
    lib.fftlab_ring_create.restype = c.c_void_p
    lib.fftlab_ring_create.argtypes = [c.c_int64]
    lib.fftlab_ring_destroy.restype = None
    lib.fftlab_ring_destroy.argtypes = [c.c_void_p]
    for name in ("fftlab_ring_capacity", "fftlab_ring_available",
                 "fftlab_ring_space"):
        fn = getattr(lib, name)
        fn.restype = c.c_int64
        fn.argtypes = [c.c_void_p]
    for name in ("fftlab_ring_write", "fftlab_ring_read"):
        fn = getattr(lib, name)
        fn.restype = c.c_int64
        fn.argtypes = [c.c_void_p, c.POINTER(c.c_float), c.c_int64]
    lib.fftlab_ring_peek_hop.restype = c.c_int64
    lib.fftlab_ring_peek_hop.argtypes = [
        c.c_void_p, c.POINTER(c.c_float), c.c_int64, c.c_int64,
    ]
    lib.fftlab_q15_fft.restype = c.c_int32
    lib.fftlab_q15_fft.argtypes = [
        c.POINTER(c.c_int16), c.POINTER(c.c_int16), c.c_int32, c.c_int32,
    ]
    lib.fftlab_q15_normalize.restype = c.c_int32
    lib.fftlab_q15_normalize.argtypes = [
        c.POINTER(c.c_int16), c.POINTER(c.c_int16), c.c_int32,
    ]
    lib.fftlab_fft64.restype = c.c_int32
    lib.fftlab_fft64.argtypes = [
        c.POINTER(c.c_double), c.POINTER(c.c_double),
        c.c_int64, c.c_int64, c.c_int32,
    ]


def load_native_lib() -> ctypes.CDLL:
    """Load (building if needed) the native library; raises RuntimeError
    with the build log if unavailable."""
    global _LIB, _ERR
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if _ERR is not None:
            raise RuntimeError(_ERR)
        try:
            # Run make unconditionally: the Makefile's '$(LIB): $(SRCS)'
            # deps make it a no-op when fresh, and it rebuilds after
            # native/*.cpp edits (loading only when the .so was missing
            # kept serving stale binaries). If the toolchain is absent
            # but a committed .so exists, fall back to loading it.
            try:
                _build()
            except (subprocess.CalledProcessError, OSError,
                    subprocess.TimeoutExpired):
                if not os.path.exists(_SO):
                    raise
            lib = ctypes.CDLL(_SO)
            # A stale prebuilt .so (toolchain absent, so no rebuild)
            # may predate newer symbols — AttributeError here must
            # become the same RuntimeError contract as a failed build,
            # not escape into native_available()/consumers.
            _declare(lib)
            _LIB = lib
            return lib
        except (subprocess.CalledProcessError, OSError,
                subprocess.TimeoutExpired, AttributeError) as e:
            detail = getattr(e, "stderr", "") or str(e)
            _ERR = f"native library unavailable: {detail}"
            raise RuntimeError(_ERR) from e


def native_available() -> bool:
    try:
        load_native_lib()
        return True
    except RuntimeError:
        return False
