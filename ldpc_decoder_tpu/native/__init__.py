"""ctypes bindings for the native host library (``src/ldpc_host.cpp``).

The library implements the framework's host-side hot path — seekable ChaCha8
keystream, reference-bit generation, channel noise, bit-packed syndromes and
the 32x32 bit transpose — natively (C++17 + OpenMP + AVX2 via
``-march=native``), mirroring the reference's AVX2 CPU layer
(chacha_stream.cpp, transpose.cpp, ldpc_code.cpp:256-286).

The shared object is built on demand with ``g++`` (no pybind11; plain
extern "C" + ctypes) and cached next to the source. ``available()`` reports
whether the toolchain produced a loadable library; all callers fall back to
the numpy implementations when it is False.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "ldpc_host.cpp")
_SO = os.path.join(_DIR, "_ldpc_host.so")

_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _build() -> str | None:
    """(Re)build the shared library if stale. Returns an error or None."""
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return None
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-fopenmp",
        "-march=native", "-o", _SO, _SRC,
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:  # no g++ etc.
        return f"build failed: {e}"
    if r.returncode != 0:
        return f"build failed: {r.stderr[-2000:]}"
    return None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        err = _build()
        if err is not None:
            _build_error = err
            print(f"ldpc_decoder_tpu.native: {err}", file=sys.stderr)
            return None
        lib = ctypes.CDLL(_SO)
        u64, i64 = ctypes.c_uint64, ctypes.c_int64
        p_u32 = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        p_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.ldpc_chacha_stream_words.argtypes = [u64, u64, u64, p_u32]
        lib.ldpc_gen_ref_words.argtypes = [u64, i64, i64, p_u32]
        lib.ldpc_add_noise_awgn.argtypes = [
            u64, i64, i64, i64, p_u32, ctypes.c_float, p_f32, i64]
        lib.ldpc_add_noise_bsc.argtypes = [
            u64, i64, i64, i64, p_u32, ctypes.c_float, p_f32, i64]
        lib.ldpc_compute_syndrome_words.argtypes = [
            p_i64, p_i32, i64, i64, p_u32, p_u32]
        lib.ldpc_deinterlace_words.argtypes = [p_u32, i64, i64, p_u32]
        lib.ldpc_native_version.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def stream_words(seed: int, start: int, count: int) -> np.ndarray:
    """Native twin of :func:`rng.chacha_np.stream_words` (word-exact)."""
    lib = _load()
    out = np.empty(count, dtype=np.uint32)
    lib.ldpc_chacha_stream_words(seed, start, count, out)
    return out


def gen_ref_words(start_index: int, n_vars: int, n_groups: int) -> np.ndarray:
    """[n_vars, n_groups] uint32 frame-interleaved reference bits
    (bit b of word [v, g] = bit v of frame 32g+b)."""
    lib = _load()
    out = np.empty((n_vars, n_groups), dtype=np.uint32)
    lib.ldpc_gen_ref_words(start_index, n_vars, n_groups, out.reshape(-1))
    return out


def add_noise(channel_type: str, param: float, vec_start: int,
              ref_words: np.ndarray, transmitted: int, n_frames: int,
              out: np.ndarray) -> None:
    """Fill ``out[:transmitted, :n_frames]`` (f32, C-contiguous rows of
    length out.shape[1]) with noisy channel values."""
    lib = _load()
    n_vars, n_groups = ref_words.shape
    assert out.dtype == np.float32 and out.flags.c_contiguous
    fn = {"awgn": lib.ldpc_add_noise_awgn,
          "bsc": lib.ldpc_add_noise_bsc}[channel_type]
    fn(vec_start, n_frames, transmitted, n_groups, ref_words.reshape(-1),
       param, out.reshape(-1), out.shape[1])


def compute_syndrome_words(offsets: np.ndarray, indices: np.ndarray,
                           ref_words: np.ndarray) -> np.ndarray:
    """[n_checks, n_groups] uint32 interleaved syndromes via CSR XOR."""
    lib = _load()
    n_checks = offsets.shape[0] - 1
    n_groups = ref_words.shape[1]
    out = np.empty((n_checks, n_groups), dtype=np.uint32)
    lib.ldpc_compute_syndrome_words(
        np.ascontiguousarray(offsets, np.int64),
        np.ascontiguousarray(indices, np.int32),
        n_checks, n_groups, np.ascontiguousarray(ref_words).reshape(-1),
        out.reshape(-1))
    return out


def deinterlace_words(words: np.ndarray) -> np.ndarray:
    """Frame-interleaved [n_words, n_groups] -> per-frame packed
    [n_groups*32, ceil(n_words/32)] uint32 (deinterlace,
    main.cpp:273-299): each frame's n_words bits pack 32 per word."""
    lib = _load()
    n_words, n_groups = words.shape
    n_out_words = (n_words + 31) // 32
    out = np.empty((n_groups * 32, n_out_words), dtype=np.uint32)
    lib.ldpc_deinterlace_words(
        np.ascontiguousarray(words).reshape(-1), n_words, n_groups,
        out.reshape(-1))
    return out
