"""Codec correctness: golden decode, round-trips, cross-impl validation.

Mirrors reference tests/test.nim (golden + round-trip), tests/validate.nim
(cross-implementation interop — CPython zlib/gzip plays the role nim-lang/zip
and miniz play there), and tests/test_known_bad.nim.
"""

import gzip as pygzip
import zlib

import pytest

import zippy_tpu
from zippy_tpu import ZippyError, dfDeflate, dfDetect, dfGzip, dfZlib

from conftest import CORPUS_FILES, GOLD_GZ_PAIRS


# --- Golden decode: fixture .gz files must inflate to the recorded bytes ---

@pytest.mark.parametrize("gold,gz", GOLD_GZ_PAIRS)
def test_golden_gz(corpus_dir, gold, gz):
    expected = (corpus_dir / gold).read_bytes()
    compressed = (corpus_dir / gz).read_bytes()
    assert zippy_tpu.uncompress(compressed) == expected
    assert zippy_tpu.uncompress(compressed, dfGzip) == expected


def test_fixed_huffman_fixture(corpus_dir):
    # fixed.z exercises the fixed-Huffman decode path (reference test.nim:48-53)
    compressed = (corpus_dir / "fixed.z").read_bytes()
    assert zippy_tpu.uncompress(compressed, dfZlib) == zlib.decompress(compressed)


def test_known_bad_regression(corpus_dir):
    # Once-broken gzip must inflate to 574 bytes (reference test_known_bad.nim)
    data = (corpus_dir / "known_bad_nitter.json.gz").read_bytes()
    assert len(zippy_tpu.uncompress(data, dfGzip)) == 574


# --- Round-trip identity over the corpus, all three formats ---

@pytest.mark.parametrize("name", CORPUS_FILES)
@pytest.mark.parametrize("fmt", [dfGzip, dfZlib, dfDeflate])
def test_roundtrip_corpus(corpus_dir, name, fmt):
    data = (corpus_dir / name).read_bytes()
    blob = zippy_tpu.compress(data, data_format=fmt)
    assert zippy_tpu.uncompress(blob, fmt) == data
    if fmt in (dfGzip, dfZlib):
        assert zippy_tpu.uncompress(blob, dfDetect) == data


def test_roundtrip_all_byte_values():
    data = bytes(range(256)) * 256
    for fmt in (dfGzip, dfZlib, dfDeflate):
        assert zippy_tpu.uncompress(zippy_tpu.compress(data, data_format=fmt), fmt) == data


def test_roundtrip_empty_and_tiny():
    for data in (b"", b"a", b"ab", b"aaa", b"\x00" * 7):
        for fmt in (dfGzip, dfZlib, dfDeflate):
            blob = zippy_tpu.compress(data, data_format=fmt)
            assert zippy_tpu.uncompress(blob, fmt) == data


# --- Cross-implementation validation (reference tests/validate.nim) ---

@pytest.mark.parametrize("name", CORPUS_FILES)
def test_cpython_decodes_ours(corpus_dir, name):
    data = (corpus_dir / name).read_bytes()
    assert pygzip.decompress(zippy_tpu.compress(data, data_format=dfGzip)) == data
    assert zlib.decompress(zippy_tpu.compress(data, data_format=dfZlib)) == data
    assert zlib.decompress(
        zippy_tpu.compress(data, data_format=dfDeflate), wbits=-15
    ) == data


@pytest.mark.parametrize("name", CORPUS_FILES)
def test_we_decode_cpython(corpus_dir, name):
    data = (corpus_dir / name).read_bytes()
    assert zippy_tpu.uncompress(pygzip.compress(data), dfGzip) == data
    assert zippy_tpu.uncompress(zlib.compress(data), dfZlib) == data
    assert zippy_tpu.uncompress(zlib.compress(data, 9)[2:-4], dfDeflate) == data


# --- Format detection & error contract ---

def test_detect_failures():
    with pytest.raises(ZippyError):
        zippy_tpu.uncompress(b"not compressed data, nope")
    with pytest.raises(ZippyError):
        zippy_tpu.uncompress(b"")


def test_zlib_header_validation():
    good = zippy_tpu.compress(b"hello world, hello world", data_format=dfZlib)
    # FDICT set -> rejected (reference zippy.nim:149-150)
    bad = bytes([good[0], 0x20]) + good[2:]
    with pytest.raises(ZippyError):
        zippy_tpu.uncompress(bad, dfZlib)
    # corrupt adler trailer
    bad2 = good[:-1] + bytes([good[-1] ^ 0xFF])
    with pytest.raises(ZippyError):
        zippy_tpu.uncompress(bad2, dfZlib)


def test_gzip_trailer_validation():
    good = zippy_tpu.compress(b"hello world, hello world", data_format=dfGzip)
    bad = good[:-5] + bytes([good[-5] ^ 0x01]) + good[-4:]  # flip crc byte
    with pytest.raises(ZippyError):
        zippy_tpu.uncompress(bad, dfGzip)
    short = good[: len(good) // 2]
    with pytest.raises(ZippyError):
        zippy_tpu.uncompress(short, dfGzip)


def test_multimember_gzip():
    a = zippy_tpu.compress(b"first|", data_format=dfGzip)
    b = zippy_tpu.compress(b"second", data_format=dfGzip)
    assert zippy_tpu.uncompress(a + b, dfGzip) == b"first|second"
    assert pygzip.decompress(a + b) == b"first|second"


def test_str_input():
    assert zippy_tpu.uncompress(zippy_tpu.compress("héllo")) == "héllo".encode()
