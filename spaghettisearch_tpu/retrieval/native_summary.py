"""ctypes binding for the native summary renderer (native/fastsummary.cpp).

One call renders a document's dynamic summary from its raw text bytes and
the cleaned query tokens — no per-doc Python index, no per-doc caching
beyond the compact text bytes (see summary.py for why: the Python index is
~1.3 ms per cache miss and a 100k-doc serving working set thrashes any
bounded cache). ctypes releases the GIL for the call, so hydration threads
overlap. Output is verified byte-identical to the Python renderer
(tests/test_summary_fast.py property test)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libfastsummary.so")
_lib = None
_lib_lock = threading.Lock()
_OUT_CAP = 1 << 16


def _load_lib():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(_SO_PATH)
        lib.fs_summary.restype = ctypes.c_int
        lib.fs_summary.argtypes = [
            ctypes.c_char_p, ctypes.c_int,  # text
            ctypes.c_char_p, ctypes.c_int,  # query tokens (NUL-joined)
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int,  # phrases
            ctypes.c_char_p, ctypes.c_int,  # out
        ]
        _lib = lib
        return lib


def native_available() -> bool:
    try:
        _load_lib()
        return True
    except (OSError, subprocess.SubprocessError, RuntimeError):
        return False


_local = threading.local()


def _out_buf():
    buf = getattr(_local, "buf", None)
    if buf is None:
        buf = _local.buf = ctypes.create_string_buffer(_OUT_CAP)
    return buf


def pack_query(prepared) -> tuple:
    """prepare_summary_query output -> the C call's packed byte arguments.
    Cache this per request (engine hydration hoists it)."""
    query_cleaned, phrase_cleaned = prepared
    qtoks = b"\0".join(t.encode() for t in query_cleaned) + b"\0"
    ph_flat: list[bytes] = []
    ph_lens = (ctypes.c_int * max(len(phrase_cleaned), 1))()
    for i, ph in enumerate(phrase_cleaned):
        ph_lens[i] = len(ph)
        ph_flat.extend(t.encode() for t in ph)
    phtoks = b"\0".join(ph_flat) + b"\0"
    return qtoks, len(query_cleaned), phtoks, ph_lens, len(phrase_cleaned)


def render_summary(text: bytes, packed) -> str | None:
    """Summary for a doc's raw (utf-8, space-joined) word text; None when
    the caller should use the Python renderer (overflow / odd encodings)."""
    lib = _load_lib()
    qtoks, nq, phtoks, ph_lens, n_ph = packed
    buf = _out_buf()
    n = lib.fs_summary(
        text, len(text), qtoks, nq, phtoks, ph_lens, n_ph, buf, _OUT_CAP
    )
    if n < 0:  # over-long summary (pathological doc)
        return None
    try:
        return buf.raw[:n].decode("utf-8")
    except UnicodeDecodeError:
        return None
