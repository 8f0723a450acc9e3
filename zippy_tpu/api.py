"""Public codec API: compress() / uncompress().

Parity reference: /root/reference/src/zippy.nim (format framing, dfDetect
magic-byte sniffing zippy.nim:109-125, zlib CMF/FLG/FDICT checks
zippy.nim:130-150, adler32 verification zippy.nim:154-162).
"""

from __future__ import annotations

import struct

from . import engine, gzip_format, native
from .common import (
    CompressedDataFormat,
    DefaultCompression,
    ZippyError,
    check_level,
    dfDeflate,
    dfDetect,
    dfGzip,
    dfZlib,
)


def _to_bytes(src) -> bytes:
    if isinstance(src, bytes):
        return src
    if isinstance(src, (bytearray, memoryview)):
        return bytes(src)
    if isinstance(src, str):
        return src.encode("utf-8")
    if engine.is_device_array(src):
        import numpy as np

        return np.asarray(src).tobytes()
    raise TypeError(f"Unsupported input type {type(src)!r}")


def compress(
    src,
    level: int = DefaultCompression,
    data_format: CompressedDataFormat = dfGzip,
    *,
    engine_name: str = "auto",
) -> bytes:
    """Compress src, framed per data_format (gzip by default).

    A device-resident jax.Array compresses WITHOUT a host bounce: the
    deflate body and the trailer checksum both run on the accelerator
    (engine auto-routing by residency); only framing happens on host.
    """
    # Fast path for the hot raw-deflate bytes case: microsecond inputs
    # (reference does randtest3 L1 in ~5 us; every Python frame counts).
    if (data_format is dfDeflate and type(src) is bytes
            and engine_name in ("auto", "native")):
        check_level(level)
        return native.deflate(src, level)

    check_level(level)
    on_device = engine.is_device_array(src)
    data = src if on_device else _to_bytes(src)

    if data_format == dfGzip:
        return gzip_format.write_member(data, level, engine_name=engine_name)

    if data_format == dfZlib:
        if not on_device and engine_name in ("auto", "native"):
            return native.zlib_compress(data, level)
        cm = 8
        cinfo = 7
        cmf = (cinfo << 4) | cm
        fcheck = (31 - (cmf * 256) % 31) % 31
        header = bytes([cmf, fcheck])
        body = engine.deflate(data, level, engine_name)
        checksum = engine.adler32(data, engine_name)
        return header + body + struct.pack(">I", checksum)

    if data_format == dfDeflate:
        return engine.deflate(data, level, engine_name)

    raise ZippyError(f"Invalid data format {data_format}")


def _looks_gzip(data: bytes) -> bool:
    return (
        len(data) > 18
        and data[0] == 31
        and data[1] == 139
        and data[2] == 8
        and (data[3] & 0b1110_0000) == 0
    )


def _looks_zlib(data: bytes) -> bool:
    return (
        len(data) > 6
        and (data[0] & 0x0F) == 8
        and (data[0] >> 4) <= 7
        and (data[0] * 256 + data[1]) % 31 == 0
    )


def uncompress(
    src,
    data_format: CompressedDataFormat = dfDetect,
    *,
    engine_name: str = "auto",
) -> bytes:
    """Uncompress src; detects gzip/zlib framing by default.

    engine_name="device" runs the index-based device-parallel decode
    (ops/inflate_device: one host boundary scan, then concurrent segment
    decode on the accelerator) — symmetric with compress(engine_name=...).
    "auto" keeps host bytes on the native decoder, which wins for
    host-resident buffers.
    """
    data = _to_bytes(src)

    if engine_name == "device":
        from .ops import inflate_device

        if data_format == dfDetect:
            if _looks_gzip(data):
                data_format = dfGzip
            elif _looks_zlib(data):
                data_format = dfZlib
            else:
                raise ZippyError("Unable to detect compressed data format")
        if data_format == dfGzip:
            return gzip_format.uncompress_gzip_device_all(data)
        if data_format == dfZlib:
            return inflate_device.uncompress_zlib_device(data)
        if data_format == dfDeflate:
            return inflate_device.inflate_device(data)
        raise ZippyError(f"Invalid data format {data_format}")

    if data_format == dfDetect:
        # One-call native detect + decode (reference dfDetect semantics,
        # zippy.nim:109-125). A tuple means multi-member gzip: member 1 is
        # already decoded; resume the concatenation loop at `consumed`.
        if native.uncompress_auto is not None:
            out = native.uncompress_auto(data)
            if isinstance(out, bytes):
                return out
            payload, consumed = out
            return gzip_format.concat_members(data, [payload], consumed)
        elif _looks_gzip(data):
            data_format = dfGzip
        elif _looks_zlib(data):
            data_format = dfZlib
        else:
            raise ZippyError("Unable to detect compressed data format")

    if data_format == dfGzip:
        return gzip_format.uncompress_gzip(data)

    if data_format == dfZlib:
        if len(data) < 6:
            raise ZippyError("Invalid compressed data")
        cmf, flg = data[0], data[1]
        if (cmf & 0x0F) != 8:
            raise ZippyError("Unsupported compression method")
        if (cmf >> 4) > 7:
            raise ZippyError("Invalid compression info")
        if (cmf * 256 + flg) % 31 != 0:
            raise ZippyError("Invalid header")
        if flg & 0b0010_0000:
            raise ZippyError("Preset dictionary is not yet supported")
        return native.zlib_uncompress(data)

    if data_format == dfDeflate:
        payload, _ = engine.inflate(data)
        return payload

    raise ZippyError(f"Invalid data format {data_format}")
