"""Pallas kernel tests (interpreter mode on the CPU test mesh; the same
kernels compile on real TPU — validated by the verify drive)."""

import zlib

import numpy as np
import pytest

pytest.importorskip("jax.experimental.pallas")

from zippy_tpu.ops import pallas_checksums as pc


@pytest.mark.parametrize("n", [1, 100, 511, 512, 513, 1024, 32768, 32769,
                               100000, 1 << 20])
def test_adler32_pallas(n):
    data = np.random.default_rng(n).integers(0, 256, n).astype(np.uint8)
    assert pc.adler32_pallas(data.tobytes()) == zlib.adler32(data.tobytes())


@pytest.mark.parametrize("n", [1, 100, 511, 512, 513, 4096, 100000, 1 << 20])
def test_crc32_pallas(n):
    data = np.random.default_rng(n).integers(0, 256, n).astype(np.uint8)
    assert pc.crc32_pallas(data.tobytes()) == zlib.crc32(data.tobytes())


def test_pallas_empty_and_corpus():
    assert pc.adler32_pallas(b"") == 1
    assert pc.crc32_pallas(b"") == 0
    raw = open("/root/reference/tests/data/alice29.txt", "rb").read()
    assert pc.adler32_pallas(raw) == zlib.adler32(raw)
    assert pc.crc32_pallas(raw) == zlib.crc32(raw)


def test_device_checksums_pallas_opt_in():
    from zippy_tpu.ops import checksums

    raw = b"pallas-backed device checksums " * 1000
    assert checksums.adler32_device(raw, use_pallas=True) == zlib.adler32(raw)
    assert checksums.crc32_device(raw, use_pallas=True) == zlib.crc32(raw)
