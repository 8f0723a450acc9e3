"""RFC 1952 gzip member framing.

Parity reference: /root/reference/src/zippy/gzip.nim (header flag handling,
trailer crc32 + ISIZE-mod-2^32 verification, trustSize preallocation) and
zippy.nim:22-58 (member write with random-length FNAME anti-oracle padding,
https://github.com/guzba/zippy/issues/61).

Extensions over the reference: FEXTRA is parsed (the reference rejects it,
gzip.nim:40-41) and multi-member streams decode to the concatenation like
CPython's gzip — both strict supersets used by the parallel framing in
zippy_tpu.parallel.
"""

from __future__ import annotations

import os
import struct

from . import engine
from . import native as native_mod
from .common import ZippyError

GZIP_MAGIC = b"\x1f\x8b"

FTEXT = 1 << 0
FHCRC = 1 << 1
FEXTRA = 1 << 2
FNAME = 1 << 3
FCOMMENT = 1 << 4


def write_member(
    src: bytes,
    level: int,
    *,
    random_name_padding: bool = True,
    extra: bytes | None = None,
    engine_name: str = "auto",
) -> bytes:
    """One gzip member: header + deflate stream + crc32/ISIZE trailer.

    A device-resident jax.Array src keeps the payload on the accelerator:
    deflate body via the device pipeline, crc32 via the device GF(2) fold;
    only the ~20 header/trailer bytes assemble on host."""
    if engine.is_device_array(src):
        n_src = int(src.shape[0])
        flg = 0
        fields = b""
        if extra is not None:
            if len(extra) > 0xFFFF:
                raise ZippyError("gzip FEXTRA field too long")
            flg |= FEXTRA
            fields += struct.pack("<H", len(extra)) + extra
        if random_name_padding:
            flg |= FNAME
            npad = os.urandom(1)[0] % 26
            fields += bytes(97 + i for i in range(npad)) + b"\x00"
        header = struct.pack("<2sBBIBB", GZIP_MAGIC, 8, flg, 0, 0, 0)
        body = engine.deflate(src, level, engine_name)
        trailer = struct.pack(
            "<II", engine.crc32(src, engine_name), n_src & 0xFFFFFFFF)
        return header + fields + body + trailer

    if extra is None and engine_name in ("auto", "native"):
        # Single-call native fast path (header + deflate + trailer in C++).
        name_pad = os.urandom(1)[0] % 26 if random_name_padding else -1
        return native_mod.gzip_compress(src, level, name_pad)

    flg = 0
    fields = b""
    if extra is not None:
        if len(extra) > 0xFFFF:
            raise ZippyError("gzip FEXTRA field too long")
        flg |= FEXTRA
        fields += struct.pack("<H", len(extra)) + extra
    if random_name_padding:
        # Random-length (0-25 chars) FNAME defeats compressed-length oracles
        # (reference zippy.nim:28-42).
        flg |= FNAME
        n = os.urandom(1)[0] % 26
        fields += bytes(97 + i for i in range(n)) + b"\x00"
    header = struct.pack("<2sBBIBB", GZIP_MAGIC, 8, flg, 0, 0, 0)
    body = engine.deflate(src, level, engine_name)
    trailer = struct.pack(
        "<II", engine.crc32(src, engine_name), len(src) & 0xFFFFFFFF
    )
    return header + fields + body + trailer


def parse_header(src: bytes, pos: int = 0) -> dict:
    """Parse one member header; returns dict with deflate stream offset."""
    if len(src) - pos < 18:
        raise ZippyError("Invalid gzip data")
    if src[pos : pos + 2] != GZIP_MAGIC:
        raise ZippyError("Failed gzip identification values check")
    cm = src[pos + 2]
    flg = src[pos + 3]
    if cm != 8:
        raise ZippyError("Unsupported compression method")
    if flg & 0b1110_0000:
        raise ZippyError("Reserved flag bits set")
    mtime = struct.unpack_from("<I", src, pos + 4)[0]
    p = pos + 10
    extra = None
    if flg & FEXTRA:
        if p + 2 > len(src):
            raise ZippyError("Invalid gzip data")
        xlen = struct.unpack_from("<H", src, p)[0]
        p += 2
        if p + xlen > len(src):
            raise ZippyError("Invalid gzip data")
        extra = src[p : p + xlen]
        p += xlen
    name = None
    if flg & FNAME:
        end = src.find(b"\x00", p)
        if end < 0:
            raise ZippyError("Invalid gzip data")
        name = src[p:end]
        p = end + 1
    comment = None
    if flg & FCOMMENT:
        end = src.find(b"\x00", p)
        if end < 0:
            raise ZippyError("Invalid gzip data")
        comment = src[p:end]
        p = end + 1
    if flg & FHCRC:
        if p + 2 >= len(src):
            raise ZippyError("Invalid gzip data")
        p += 2  # header crc not verified (reference gzip.nim:55-59 skips too)
    if p + 8 >= len(src):
        raise ZippyError("Invalid gzip data")
    return {
        "data_offset": p,
        "mtime": mtime,
        "extra": extra,
        "name": name,
        "comment": comment,
    }


def read_member(src: bytes, pos: int = 0, trust_size: bool = False) -> tuple[bytes, int]:
    """Decode one member starting at byte `pos`. Returns (payload, next_pos)."""
    hdr = parse_header(src, pos)
    p = hdr["data_offset"]
    size_hint = None
    if trust_size:
        # ISIZE-based preallocation (reference gzip.nim:72-77). ISIZE is mod
        # 2^32 so it's a hint, not a guarantee; inflate falls back to growth.
        isize = struct.unpack_from("<I", src, len(src) - 4)[0]
        size_hint = isize + 16
    payload, end_bit = engine.inflate(src, p * 8, size_hint=size_hint)
    tpos = (end_bit + 7) // 8
    if tpos + 8 > len(src):
        raise ZippyError("Invalid gzip data")
    checksum, isize = struct.unpack_from("<II", src, tpos)
    if checksum != engine.crc32(payload):
        raise ZippyError("Checksum verification failed")
    if isize != len(payload) & 0xFFFFFFFF:
        raise ZippyError("Size verification failed")
    return payload, tpos + 8


ZT_SUBFIELD_ID = b"ZT"
_INDEXED_MEMBER_SIZE = 4 * 1024 * 1024


def compress_indexed(
    src: bytes,
    level: int,
    *,
    member_size: int = _INDEXED_MEMBER_SIZE,
) -> bytes:
    """Multi-member gzip with a 'ZT' FEXTRA subfield carrying each member's
    total byte length — the decode-side parallelism seam SURVEY §5 calls for
    (serial bit parsing otherwise hides block boundaries). The output is a
    standard gzip stream: CPython and any RFC 1952 reader decode it; our
    uncompress_parallel splits members by the index and decodes them
    concurrently. Same design as bgzip's BC subfield.
    """
    from concurrent.futures import ThreadPoolExecutor

    members_src = [src[i : i + member_size]
                   for i in range(0, max(len(src), 1), member_size)]

    def one(part: bytes) -> bytes:
        # Two-pass: measure the member, then rewrite the length subfield.
        placeholder = struct.pack("<2sHI", ZT_SUBFIELD_ID, 4, 0)
        blob = write_member(part, level, random_name_padding=False,
                            extra=placeholder)
        extra = struct.pack("<2sHI", ZT_SUBFIELD_ID, 4, len(blob))
        return blob[:12] + extra + blob[12 + len(extra):]

    if len(members_src) > 1:
        with ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 1)) as ex:
            return b"".join(ex.map(one, members_src))
    return one(members_src[0])


def _indexed_member_length(src: bytes, pos: int) -> int | None:
    """Member length from the ZT subfield, or None if absent."""
    if len(src) - pos < 18 or src[pos : pos + 2] != GZIP_MAGIC:
        return None
    if not (src[pos + 3] & FEXTRA):
        return None
    xlen = struct.unpack_from("<H", src, pos + 10)[0]
    p, end = pos + 12, pos + 12 + xlen
    while p + 4 <= end:
        sid = src[p : p + 2]
        slen = struct.unpack_from("<H", src, p + 2)[0]
        p += 4
        if sid == ZT_SUBFIELD_ID and slen == 4 and p + 4 <= end:
            return struct.unpack_from("<I", src, p)[0]
        p += slen
    return None


def _is_zero_padding(src, pos: int) -> bool:
    """True if src[pos:] is empty or all NUL (tar tools pad archives) —
    chunked so an mmap'd archive never materializes its whole tail."""
    mv = memoryview(src)
    n = len(mv)
    zeros = bytes(4096)
    while pos < n:
        end = min(pos + 4096, n)
        if mv[pos:end] != zeros[: end - pos]:
            return False
        pos = end
    return True


def uncompress_parallel(src: bytes) -> bytes:
    """Decode a gzip stream; members listed in the ZT index decode on a
    thread pool (the native decoder releases the GIL). Falls back to the
    sequential path when the stream carries no index."""
    from concurrent.futures import ThreadPoolExecutor

    spans = []
    pos = 0
    while pos < len(src):
        mlen = _indexed_member_length(src, pos)
        if mlen is None or mlen < 18 or pos + mlen > len(src):
            return uncompress_gzip(src)
        spans.append((pos, mlen))
        pos += mlen
        if _is_zero_padding(src, pos):
            break
    if len(spans) <= 1:
        return uncompress_gzip(src)
    def _decode_span(s):
        # Decode over the whole buffer (zero-copy on the mmap path) but
        # cross-check the consumed length against the indexed member length:
        # an understated index previously failed on the bounded slice, and
        # must not silently diverge from the serial path (ADVICE r4 low).
        payload, consumed = native_mod.gzip_uncompress(src, s[0])
        if consumed != s[1]:
            raise ZippyError("Invalid gzip data (ZT index length mismatch)")
        return payload

    with ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 1)) as ex:
        parts = list(ex.map(_decode_span, spans))
    return b"".join(parts)


def uncompress_gzip(src: bytes, trust_size: bool = False) -> bytes:
    """Decode a gzip stream; concatenates all members (CPython semantics).

    Whole-member decode (header parse, inflate, crc32 + ISIZE verify) is a
    single native call; `trust_size` is implicit — the native path always
    preallocates from the ISIZE trailer, bounded by the 1032:1 DEFLATE
    expansion cap (reference gzip.nim:72-77 semantics).
    """
    del trust_size  # always on in the native path
    payload, consumed = native_mod.gzip_uncompress(src, 0)
    if consumed == len(src):  # single member, nothing trailing (the hot case)
        return payload
    return concat_members(src, [payload], consumed)


def concat_members(src: bytes, parts: list[bytes], pos: int) -> bytes:
    """Continue the multi-member concatenation loop from byte `pos`, with
    the members before `pos` already decoded into `parts`."""
    while True:
        # Trailing zero padding is tolerated (some tar tools pad archives).
        if _is_zero_padding(src, pos):
            break
        if len(src) - pos < 18 or bytes(src[pos : pos + 2]) != GZIP_MAGIC:
            raise ZippyError("Invalid gzip data (trailing garbage)")
        payload, consumed = native_mod.gzip_uncompress(src, pos)
        parts.append(payload)
        pos += consumed
    return parts[0] if len(parts) == 1 else b"".join(parts)
