"""Native runtime specifics: one-call container codecs, multi-threaded
deflate splicing, and error-code mapping."""

import gzip
import os
import struct
import zlib

import pytest

from zippy_tpu import native
from zippy_tpu.common import ZippyError


def test_gzip_one_call_roundtrip():
    data = b"one-call gzip " * 1000
    blob = native.gzip_compress(data, 6, name_pad=7)
    assert gzip.decompress(blob) == data
    payload, consumed = native.gzip_uncompress(blob)
    assert payload == data and consumed == len(blob)


def test_gzip_one_call_bad_crc():
    data = b"crc check " * 100
    blob = bytearray(native.gzip_compress(data, 6))
    blob[-6] ^= 0xFF  # corrupt stored crc
    with pytest.raises(ZippyError, match="Checksum"):
        native.gzip_uncompress(bytes(blob))


def test_gzip_one_call_bad_isize():
    data = b"isize check " * 100
    blob = bytearray(native.gzip_compress(data, 6))
    blob[-1] ^= 0xFF  # corrupt ISIZE
    with pytest.raises(ZippyError, match="Size"):
        native.gzip_uncompress(bytes(blob))


def test_zlib_one_call_roundtrip():
    data = os.urandom(3000) + b"tail" * 500
    blob = native.zlib_compress(data, 4)
    assert zlib.decompress(blob) == data
    assert native.zlib_uncompress(blob) == data
    # interop: decode CPython-produced zlib
    assert native.zlib_uncompress(zlib.compress(data, 9)) == data


def test_zlib_one_call_bad_adler():
    data = b"adler " * 200
    blob = bytearray(native.zlib_compress(data, 6))
    blob[-1] ^= 0xFF
    with pytest.raises(ZippyError, match="Checksum"):
        native.zlib_uncompress(bytes(blob))


@pytest.mark.parametrize("level", [-2, -1, 1, 6, 9])
def test_mt_deflate_splice(level):
    # > 512 KiB triggers the multi-threaded split; the spliced stream must
    # decode exactly and end with no slack bytes after the final block.
    rng_chunks = []
    base = open("/root/reference/tests/data/urls.10K", "rb").read()
    data = (base * 2)[: 1 << 20]
    blob = native.deflate(data, level)
    do = zlib.decompressobj(-15)
    out = do.decompress(blob)
    assert out == data
    assert do.eof
    assert len(do.unused_data) == 0, "slack bytes after final block"


def test_mt_deflate_isize_trailer_alignment():
    # Regression: the final sub-stream used to be byte-padded relative to its
    # own start, leaving >7 bits of post-EOB padding after splicing; CPython's
    # gzip then misread the trailer.
    data = (open("/root/reference/tests/data/urls.10K", "rb").read())
    for level in (-1, 6):
        blob = native.gzip_compress(data, level)
        assert gzip.decompress(blob) == data


def test_deflate_bound_covers_huffman_only():
    # Level -2 cannot fall back to stored blocks; bound must still hold.
    data = os.urandom(1 << 20)
    blob = native.deflate(data, -2)
    assert zlib.decompress(blob, wbits=-15) == data


def test_indexed_gzip_parallel_roundtrip():
    from zippy_tpu import gzip_format

    data = (open("/root/reference/tests/data/urls.10K", "rb").read() * 3)
    blob = gzip_format.compress_indexed(data, 6, member_size=256 * 1024)
    # Standards-compatible: CPython decodes the multi-member stream.
    assert gzip.decompress(blob) == data
    # Our parallel decode splits members by the ZT index.
    assert gzip_format.uncompress_parallel(blob) == data
    # Sequential path agrees.
    assert gzip_format.uncompress_gzip(blob) == data


def test_indexed_gzip_single_member_and_fallback():
    from zippy_tpu import gzip_format

    data = b"small indexed payload " * 100
    blob = gzip_format.compress_indexed(data, 1)
    assert gzip.decompress(blob) == data
    assert gzip_format.uncompress_parallel(blob) == data
    # Non-indexed stream falls back to the sequential decoder.
    plain = gzip.compress(data)
    assert gzip_format.uncompress_parallel(plain) == data


def test_mt_multipart_stored_alignment():
    # Regression: a part containing stored blocks is byte-aligned relative
    # to its own start; without a sync-flush at the end of each non-final
    # part, a preceding Huffman part ending mid-byte corrupted the stream.
    import numpy as np

    rng = np.random.default_rng(0)
    text = (b"compressible text payload " * 300000)[: 5 << 20]
    noise = rng.integers(0, 256, 5 << 20).astype(np.uint8).tobytes()
    for data in (text + noise, noise + text):
        for lvl in (1, 6):
            blob = native.deflate(data, lvl)
            assert zlib.decompress(blob, wbits=-15) == data


def test_stride2_structured_data_compresses():
    """ADVICE r4 medium regression: the tier-1 entropy subsample read byte
    offsets 0 and 2 of each 4-byte group — both even — so 16-bit
    sensor/sample-style data (random high bytes, compressible low bytes)
    measured ~8 bits/byte and was emitted STORED at every level. The fixed
    sampler covers both phases; such data must compress."""
    import zlib

    import numpy as np

    rng = np.random.default_rng(42)
    n = 1 << 20
    buf = np.empty(n, dtype=np.uint8)
    buf[0::2] = rng.integers(0, 256, n // 2, dtype=np.uint8)  # random phase
    buf[1::2] = rng.integers(97, 97 + 26, n // 2, dtype=np.uint8)  # alpha
    data = buf.tobytes()
    zref = len(zlib.compress(data, 6))
    for lvl in (1, 6, 9):
        out = native.deflate(data, lvl)
        # Must actually compress, and stay within 2% of zlib-6 (the
        # pre-regression sampler classified this compressible).
        assert len(out) < n
        assert len(out) <= zref * 1.02, (lvl, len(out), zref)
        rt, _ = native.inflate(out)
        assert rt == data
