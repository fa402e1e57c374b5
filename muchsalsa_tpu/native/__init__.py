"""Native (C++) host runtime loaded through ctypes.

Provides accelerated PAF parsing + string interning, FASTA/FASTQ
parsing, and reverse complement — the data plane the reference
implements in ``libms`` C++.  Auto-builds the shared library with g++
on first import; all callers fall back to the pure-Python paths when
the toolchain or library is unavailable (``native.available()``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "ms_native.cpp"
_LIB = _HERE / "libms_native.so"

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
             str(_SRC), "-o", str(_LIB)],
            check=True,
            capture_output=True,
            timeout=300,
        )
        return True
    except Exception:
        return False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("MS_TPU_NO_NATIVE"):
            return None
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            return None

        i64, i32, u8p = ctypes.c_int64, ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8)
        charp = ctypes.c_char_p
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)

        lib.ms_revcomp.argtypes = [u8p, u8p, i64]
        lib.ms_parse_paf.argtypes = [
            charp, i64, i32, i32,
            i32p, i32p, i32p, i32p, i32p, i32p, i32p, u8p, i64p, i64p, i64,
        ]
        lib.ms_parse_paf.restype = i64
        lib.ms_paf_count_lines.argtypes = [charp, i64]
        lib.ms_paf_count_lines.restype = i64
        lib.ms_paf_nano_names.restype = charp
        lib.ms_paf_illu_names.restype = charp
        lib.ms_parse_fasta.argtypes = [charp, i64, i32]
        lib.ms_parse_fasta.restype = i64
        lib.ms_fasta_seq_len.restype = i64
        lib.ms_fasta_names_len.restype = i64
        lib.ms_fasta_copy.argtypes = [u8p, i64p, ctypes.c_char_p]

        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def revcomp(seq: bytes) -> bytes:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = len(seq)
    out = np.empty(n, dtype=np.uint8)
    inp = np.frombuffer(seq, dtype=np.uint8)
    lib.ms_revcomp(
        inp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n,
    )
    return out.tobytes()


def parse_paf(data: bytes, min_matches: int, skip_last: bool):
    """Returns dict of arrays + (nano_names, illu_names) or None."""
    lib = _load()
    if lib is None:
        return None
    n_lines = lib.ms_paf_count_lines(data, len(data))
    cap = max(int(n_lines), 1)

    def a32():
        return np.zeros(cap, dtype=np.int32)

    illu_id, nano_id = a32(), a32()
    illu_start, illu_end = a32(), a32()
    nano_start, nano_end, nano_length = a32(), a32(), a32()
    direction = np.zeros(cap, dtype=np.uint8)
    score = np.zeros(cap, dtype=np.int64)
    line_idx = np.zeros(cap, dtype=np.int64)

    def p32(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    def p64(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    n = lib.ms_parse_paf(
        data, len(data), min_matches, 1 if skip_last else 0,
        p32(illu_id), p32(nano_id), p32(illu_start), p32(illu_end),
        p32(nano_start), p32(nano_end), p32(nano_length),
        direction.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        p64(score), p64(line_idx), cap,
    )
    if n < 0:
        lib.ms_paf_free()
        raise ValueError("Invalid PAF: fewer than 10 columns on some line")

    nano_names = lib.ms_paf_nano_names().decode()
    illu_names = lib.ms_paf_illu_names().decode()
    lib.ms_paf_free()

    sl = slice(0, n)
    return (
        {
            "illu_id": illu_id[sl].copy(),
            "nano_id": nano_id[sl].copy(),
            "illu_start": illu_start[sl].copy(),
            "illu_end": illu_end[sl].copy(),
            "nano_start": nano_start[sl].copy(),
            "nano_end": nano_end[sl].copy(),
            "nano_length": nano_length[sl].copy(),
            "direction": direction[sl].astype(bool),
            "score": score[sl].copy(),
            "line_idx": line_idx[sl].copy(),
        },
        nano_names.split("\n") if nano_names else [],
        illu_names.split("\n") if illu_names else [],
    )


def parse_fasta(data: bytes, is_fastq: bool):
    """Returns (names, seq_blob, offsets) or None."""
    lib = _load()
    if lib is None:
        return None
    n = lib.ms_parse_fasta(data, len(data), 1 if is_fastq else 0)
    if n == 0:
        lib.ms_fasta_free()
        return [], b"", np.zeros(1, dtype=np.int64)
    seq_len = lib.ms_fasta_seq_len()
    names_len = lib.ms_fasta_names_len()
    seq = np.empty(int(seq_len), dtype=np.uint8)
    offsets = np.empty(int(n) + 1, dtype=np.int64)
    names_buf = ctypes.create_string_buffer(int(names_len))
    lib.ms_fasta_copy(
        seq.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        names_buf,
    )
    lib.ms_fasta_free()
    names = names_buf.raw[: int(names_len)].decode().split("\n")
    return names, seq.tobytes(), offsets
