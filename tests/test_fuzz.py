"""Fuzz + stress: corrupted/truncated input must raise ZippyError, never
crash or hang. Mirrors reference tests/fuzz.nim (bit corruption + truncation
of valid .gz) and tests/stress.nim (random blobs round-trip + system-zlib
interop). Iteration counts are scaled down for CI; set ZIPPY_TPU_FUZZ_ITERS
to raise them.
"""

import os
import random
import zlib

import pytest

import zippy_tpu
from zippy_tpu import ZippyError, dfDeflate, dfGzip, dfZlib

ITERS = int(os.environ.get("ZIPPY_TPU_FUZZ_ITERS", "300"))


def test_fuzz_corrupt_gzip(corpus_dir):
    data = (corpus_dir / "alice29.txt").read_bytes()
    blob = bytearray(zippy_tpu.compress(data, 6, dfGzip))
    rng = random.Random(1234)
    for _ in range(ITERS):
        i = rng.randrange(len(blob))
        old = blob[i]
        blob[i] ^= 1 << rng.randrange(8)
        try:
            zippy_tpu.uncompress(bytes(blob), dfGzip)
        except ZippyError:
            pass
        blob[i] = old


def test_fuzz_truncated_gzip(corpus_dir):
    data = (corpus_dir / "geo.protodata").read_bytes()
    blob = zippy_tpu.compress(data, 1, dfGzip)
    rng = random.Random(99)
    for _ in range(ITERS):
        cut = rng.randrange(len(blob))
        try:
            zippy_tpu.uncompress(blob[:cut], dfGzip)
        except ZippyError:
            pass


def test_fuzz_random_noise_input():
    rng = random.Random(7)
    for _ in range(ITERS):
        noise = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 200)))
        for fmt in (dfGzip, dfZlib, dfDeflate):
            try:
                zippy_tpu.uncompress(noise, fmt)
            except ZippyError:
                pass


def test_stress_random_blobs_roundtrip():
    """Random run-length blobs + shuffled copies (reference stress.nim:10-58)."""
    rng = random.Random(2024)
    for i in range(max(ITERS // 10, 20)):
        chunks = []
        for _ in range(rng.randrange(1, 30)):
            chunks.append(bytes([rng.randrange(256)]) * rng.randrange(1, 500))
        data = b"".join(chunks)
        for level in (1, -1):
            blob = zippy_tpu.compress(data, level, dfZlib)
            assert zippy_tpu.uncompress(blob, dfZlib) == data
            # system zlib must decode our output (stress.nim:50-57)
            assert zlib.decompress(blob) == data


def test_stress_large_crosses_block_seam():
    """~5 MB input crosses the 4 MiB encoder block boundary
    (reference stress2.nim decodes inputs crossing the seam)."""
    base = bytes(range(256)) * 64
    data = (base + b"some repeated filler text 0123456789") * 320
    assert len(data) > 4 * 1024 * 1024
    for level in (1, 6):
        blob = zippy_tpu.compress(data, level, dfZlib)
        assert zlib.decompress(blob) == data
        assert zippy_tpu.uncompress(blob, dfZlib) == data
    # and decode of zlib's own output for the same data
    assert zippy_tpu.uncompress(zlib.compress(data, 6), dfZlib) == data


def test_fuzz_own_output_across_levels():
    """Corrupt our OWN compressed bytes, then decode (reference
    stress.nim:29-42): catches encoder-specific LUT/table edge cases that
    fuzzing reference-produced fixtures cannot reach. Levels cover the
    all-literals (-2), snappy (1), default (-1) and max (9) token producers."""
    rng = random.Random(515)
    base = bytes(range(256)) * 8
    pieces = [base, b"the quick brown fox " * 200,
              bytes(rng.randrange(256) for _ in range(4096))]
    for level in (-2, 1, -1, 9):
        for fmt in (dfGzip, dfZlib, dfDeflate):
            blob = bytearray(
                zippy_tpu.compress(b"".join(pieces), level, fmt))
            for _ in range(max(ITERS // 4, 25)):
                i = rng.randrange(len(blob))
                old = blob[i]
                blob[i] ^= 1 << rng.randrange(8)
                try:
                    zippy_tpu.uncompress(bytes(blob), fmt)
                except ZippyError:
                    pass
                blob[i] = old
                # and truncation of own output (stress.nim truncate leg)
                cut = rng.randrange(len(blob))
                try:
                    zippy_tpu.uncompress(bytes(blob[:cut]), fmt)
                except ZippyError:
                    pass


def test_lying_isize_one_bit_literals():
    """Regression: a stream of 1-bit literal codes emits ~84 bytes per
    refill; with a lying (tiny) ISIZE pre-sizing the buffer, the fast-loop
    literal run plus the same iteration's unchecked match copy could write
    past the 300-byte slack guard. The decode must grow/raise, never
    overflow (advisor finding, zippy_native.cpp fast inflate loop)."""
    payload = b"a" * 100000
    for level in (-2, 6, 9):
        blob = bytearray(zippy_tpu.compress(payload, level, dfGzip))
        # Lie in ISIZE (last 4 bytes): claim 16 bytes out.
        blob[-4:] = (16).to_bytes(4, "little")
        try:
            out = zippy_tpu.uncompress(bytes(blob), dfGzip)
            assert out == payload
        except ZippyError:
            pass  # size-verification failure is the expected outcome


def test_multimember_gzip_detect_resumes():
    """dfDetect on concatenated gzip must decode all members (and the
    native fast path must hand the already-decoded first member to the
    Python loop rather than None)."""
    a = zippy_tpu.compress(b"hello " * 1000, 6, dfGzip)
    b = zippy_tpu.compress(b"world " * 1000, 1, dfGzip)
    c = zippy_tpu.compress(b"", 9, dfGzip)
    assert zippy_tpu.uncompress(a + b + c) == b"hello " * 1000 + b"world " * 1000
