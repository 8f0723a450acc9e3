"""ctypes bindings for the native runtime (see src/zippy_native.cpp).

Provides the host-side serial codec: single-stream inflate, the small-input
deflate fast path, and scalar checksums. The TPU device paths live in
zippy_tpu/ops.
"""

from __future__ import annotations

import ctypes
import functools

import numpy as np

from ..common import ZippyError
from .build import ensure_built, ensure_pyext_built


def _out_buffer(cap: int):
    """Uninitialized output buffer + its ctypes pointer (create_string_buffer
    zero-fills, which costs ~1 us per 12 KB on the small-input fast path)."""
    arr = np.empty(cap, dtype=np.uint8)
    return arr, arr.ctypes.data_as(ctypes.c_char_p)

_ERR_MALFORMED = -1
_ERR_DST_FULL = -2
_ERR_CHECKSUM = -3
_ERR_SIZE = -4

_ERR_MESSAGES = {
    _ERR_MALFORMED: "Invalid compressed data",
    _ERR_CHECKSUM: "Checksum verification failed",
    _ERR_SIZE: "Size verification failed",
}


@functools.cache
def _lib() -> ctypes.CDLL:
    lib = ctypes.CDLL(str(ensure_built()))
    lib.zt_crc32.restype = ctypes.c_uint32
    lib.zt_crc32.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    lib.zt_crc32_update.restype = ctypes.c_uint32
    lib.zt_crc32_update.argtypes = [ctypes.c_uint32, ctypes.c_char_p, ctypes.c_size_t]
    lib.zt_adler32.restype = ctypes.c_uint32
    lib.zt_adler32.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    lib.zt_adler32_update.restype = ctypes.c_uint32
    lib.zt_adler32_update.argtypes = [ctypes.c_uint32, ctypes.c_char_p, ctypes.c_size_t]
    lib.zt_inflate.restype = ctypes.c_int64
    lib.zt_inflate.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t),
    ]
    lib.zt_deflate.restype = ctypes.c_int64
    lib.zt_deflate.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_size_t,
    ]
    lib.zt_deflate_bound.restype = ctypes.c_size_t
    lib.zt_deflate_bound.argtypes = [ctypes.c_size_t]
    lib.zt_gzip_uncompress.restype = ctypes.c_int64
    lib.zt_gzip_uncompress.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t),
    ]
    lib.zt_gzip_compress.restype = ctypes.c_int64
    lib.zt_gzip_compress.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
    ]
    lib.zt_zlib_uncompress.restype = ctypes.c_int64
    lib.zt_zlib_uncompress.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t,
    ]
    lib.zt_zlib_compress.restype = ctypes.c_int64
    lib.zt_zlib_compress.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_size_t,
    ]
    return lib


def crc32(data: bytes, value: int = 0) -> int:
    if value:
        return _lib().zt_crc32_update(value & 0xFFFFFFFF, data, len(data))
    return _lib().zt_crc32(data, len(data))


def adler32(data: bytes, value: int = 1) -> int:
    if value != 1:
        return _lib().zt_adler32_update(value & 0xFFFFFFFF, data, len(data))
    return _lib().zt_adler32(data, len(data))


def inflate(
    data: bytes,
    start_bit: int = 0,
    size_hint: int | None = None,
    max_output: int | None = None,
) -> tuple[bytes, int]:
    """Decode one raw DEFLATE stream. Returns (payload, end_bit).

    `size_hint` preallocates exactly (the gzip ISIZE `trustSize` path,
    reference gzip.nim:72-77). Otherwise the output buffer grows by retry.
    """
    lib = _lib()
    n = len(data)
    cap = size_hint if size_hint is not None else max(4 * n, 1 << 16)
    end_bit = ctypes.c_size_t(0)
    while True:
        arr, buf = _out_buffer(cap)
        rc = lib.zt_inflate(data, n, start_bit, buf, cap, ctypes.byref(end_bit))
        if rc >= 0:
            return arr[:rc].tobytes(), end_bit.value
        if rc == _ERR_DST_FULL:
            if size_hint is not None and cap == size_hint:
                # hint was wrong; fall back to growth
                size_hint = None
            cap = max(cap * 2, 1 << 16)
            if max_output is not None and cap > max_output:
                if cap // 2 >= max_output:
                    raise ZippyError("Uncompressed data too large")
                cap = max_output
            continue
        raise ZippyError("Invalid compressed data")


def deflate(data: bytes, level: int) -> bytes:
    lib = _lib()
    cap = lib.zt_deflate_bound(len(data))
    arr, buf = _out_buffer(cap)
    rc = lib.zt_deflate(data, len(data), level, buf, cap)
    if rc < 0:
        raise ZippyError(f"deflate failed (code {rc})")
    return arr[:rc].tobytes()


# Output-size guesses for whole-stream decode. DEFLATE expands at most
# 1032:1; the ISIZE hint is capped by that bound so a lying trailer can't
# force a huge allocation.
_MAX_EXPANSION = 1032


def _grow_capped(cap: int, max_output: int | None) -> int:
    cap = max(cap * 2, 1 << 16)
    if max_output is not None and cap > max_output:
        if cap // 2 >= max_output:
            raise ZippyError("Uncompressed data too large")
        cap = max_output
    return cap


def gzip_uncompress(data: bytes, pos: int = 0) -> tuple[bytes, int]:
    """Decode ONE gzip member starting at byte `pos`, in a single native call
    (header + inflate + crc/ISIZE verify). Returns (payload, bytes_consumed)."""
    lib = _lib()
    if pos:
        data = data[pos:]
    n = len(data)
    if n < 18:
        raise ZippyError("Invalid gzip data")
    isize = int.from_bytes(data[-4:], "little")
    cap = min(max(isize + 64, 1 << 12), n * _MAX_EXPANSION + 4096)
    consumed = ctypes.c_size_t(0)
    while True:
        arr, buf = _out_buffer(cap)
        rc = lib.zt_gzip_uncompress(data, n, buf, cap, ctypes.byref(consumed))
        if rc >= 0:
            return arr[:rc].tobytes(), consumed.value
        if rc == _ERR_DST_FULL:
            cap = _grow_capped(cap, n * _MAX_EXPANSION + 4096)
            continue
        raise ZippyError(_ERR_MESSAGES.get(rc, "Invalid gzip data"))


def gzip_compress(data: bytes, level: int, name_pad: int = -1) -> bytes:
    """Encode a whole gzip member in one native call. name_pad >= 0 adds an
    FNAME of that many filler chars (anti-oracle padding)."""
    lib = _lib()
    cap = lib.zt_deflate_bound(len(data)) + 64
    arr, buf = _out_buffer(cap)
    rc = lib.zt_gzip_compress(data, len(data), level, buf, cap, name_pad)
    if rc < 0:
        raise ZippyError(f"gzip compress failed (code {rc})")
    return arr[:rc].tobytes()


def zlib_uncompress(data: bytes) -> bytes:
    lib = _lib()
    n = len(data)
    if n < 6:
        raise ZippyError("Invalid compressed data")
    max_out = n * _MAX_EXPANSION + 4096
    cap = min(max(8 * n, 1 << 16), max_out)
    while True:
        arr, buf = _out_buffer(cap)
        rc = lib.zt_zlib_uncompress(data, n, buf, cap)
        if rc >= 0:
            return arr[:rc].tobytes()
        if rc == _ERR_DST_FULL:
            cap = _grow_capped(cap, max_out)
            continue
        raise ZippyError(_ERR_MESSAGES.get(rc, "Invalid compressed data"))


def zlib_compress(data: bytes, level: int) -> bytes:
    lib = _lib()
    cap = lib.zt_deflate_bound(len(data)) + 16
    arr, buf = _out_buffer(cap)
    rc = lib.zt_zlib_compress(data, len(data), level, buf, cap)
    if rc < 0:
        raise ZippyError(f"zlib compress failed (code {rc})")
    return arr[:rc].tobytes()


def inflate_scan(data: bytes, start_bit: int = 0, every: int = 256) -> dict:
    """One-time decode-index scan of a raw DEFLATE stream (the host half of
    the device-parallel inflate; see ops/inflate_device.py). Returns numpy
    arrays: segments [nseg,6] (bit_offset, out_offset, block_id, ntok,
    match_bytes — the compaction-capacity input for the device resolver —
    and the segment's max copy-nesting depth, which sizes each tile's
    pointer-doubling trip count),
    stored [nsto,3] (src_byte, out_offset, len), block_lens [nblk,318]
    (litlen 288 + dist 30 code lengths), total_out, end_bit, max_depth
    (exact per-byte copy-nesting depth over a 32 KiB ring, saturating at
    0xFFFF — sizes the device resolver's fixed pointer-doubling trip
    count)."""
    if _pyzt is None:  # pragma: no cover - ctypes fallback lacks the scanner
        raise ZippyError("device decode index requires the native extension")
    seg_cap = max(1024, 2 * len(data) // max(every, 1))
    sto_cap, blk_cap = 256, 256
    while True:
        seg = bytearray(seg_cap * 48)
        sto = bytearray(sto_cap * 24)
        lens = bytearray(blk_cap * 318)
        counts = bytearray(7 * 8)
        rc = _pyzt.inflate_scan(data, start_bit, every, seg, sto, lens, counts)
        c = np.frombuffer(counts, dtype=np.int64)
        if rc == 0:
            nseg, nsto, nblk = int(c[0]), int(c[1]), int(c[2])
            return {
                "segments": np.frombuffer(seg, dtype=np.int64)
                            .reshape(-1, 6)[:nseg].copy(),
                "stored": np.frombuffer(sto, dtype=np.int64)
                          .reshape(-1, 3)[:nsto].copy(),
                "block_lens": np.frombuffer(lens, dtype=np.uint8)
                              .reshape(-1, 318)[:nblk].copy(),
                "total_out": int(c[3]),
                "end_bit": int(c[4]),
                "max_depth": int(c[5]),
                "adler": int(c[6]),
                "every": every,
            }
        if rc == -2:  # caps exceeded; counts carry the exact sizes
            seg_cap = max(int(c[0]), 1)
            sto_cap = max(int(c[1]), 1)
            blk_cap = max(int(c[2]), 1)
            continue
        raise ZippyError("Invalid compressed data")


# ---------------------------------------------------------------------------
# CPython extension bindings (preferred): ~200 ns call overhead vs ~3 us for
# ctypes + numpy buffer churn. The definitions above remain the fallback if
# the extension fails to build (e.g. missing Python headers).
# ---------------------------------------------------------------------------

def _load_pyext():
    import importlib.util

    path = ensure_pyext_built()
    spec = importlib.util.spec_from_file_location("zippy_tpu.native._pyzt", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.set_error_class(ZippyError)
    return mod


try:
    _pyzt = _load_pyext()
except Exception:  # pragma: no cover - exercised only on broken toolchains
    _pyzt = None

if _pyzt is not None:
    crc32 = _pyzt.crc32
    adler32 = _pyzt.adler32
    deflate = _pyzt.deflate
    gzip_uncompress = _pyzt.gzip_uncompress
    zlib_uncompress = _pyzt.zlib_uncompress
    zlib_compress = _pyzt.zlib_compress
    _pyzt_inflate = _pyzt.inflate
    _pyzt_gzip_compress = _pyzt.gzip_compress

    def inflate(
        data: bytes,
        start_bit: int = 0,
        size_hint: int | None = None,
        max_output: int | None = None,
    ) -> tuple[bytes, int]:
        return _pyzt_inflate(
            data,
            start_bit,
            -1 if size_hint is None else size_hint,
            -1 if max_output is None else max_output,
        )

    def gzip_compress(data: bytes, level: int, name_pad: int = -1) -> bytes:
        return _pyzt_gzip_compress(data, level, name_pad)

    # One-call detect + decode (None => multi-member gzip; caller loops).
    uncompress_auto = _pyzt.uncompress_auto
else:
    uncompress_auto = None
