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
