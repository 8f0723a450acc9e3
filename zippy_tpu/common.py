"""Core public types for zippy_tpu.

Parity reference: /root/reference/src/zippy/common.nim (ZippyError common.nim:2,
CompressedDataFormat common.nim:4-5, level constants common.nim:8-12).
"""

from __future__ import annotations

import enum


class ZippyError(Exception):
    """The single exception type raised by every zippy_tpu entry point.

    Contract (reference common.nim:2 + fuzz tests): malformed or truncated
    input must raise ZippyError — never crash, hang, or raise anything else.
    """


class CompressedDataFormat(enum.Enum):
    """Wire format for compress()/uncompress() (reference common.nim:4-5)."""

    DETECT = "detect"
    ZLIB = "zlib"
    GZIP = "gzip"
    DEFLATE = "deflate"


# Convenience aliases mirroring the reference's df* names.
dfDetect = CompressedDataFormat.DETECT
dfZlib = CompressedDataFormat.ZLIB
dfGzip = CompressedDataFormat.GZIP
dfDeflate = CompressedDataFormat.DEFLATE

# Compression levels (reference common.nim:8-12).
NoCompression = 0
BestSpeed = 1
BestCompression = 9
DefaultCompression = -1
HuffmanOnly = -2

VALID_LEVELS = tuple(range(-2, 10))


def check_level(level: int) -> int:
    if level not in VALID_LEVELS:
        raise ZippyError(f"Invalid compression level {level}")
    return level
