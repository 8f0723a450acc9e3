"""Device (TPU/XLA) pipeline tests — run on the virtual CPU mesh.

Covers the sort-based match finder, pointer-doubling token selection,
prefix-sum bit packer (ops/deflate_device.py), and the shard_map
block-parallel layer (parallel/blocks.py). CPython zlib is ground truth.
"""

import os
import zlib

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from zippy_tpu.ops import deflate_device as dd
from zippy_tpu import parallel

# Small blocks keep XLA compile times reasonable in CI.
SMALL = 4096


def _mixed_payload(n: int, seed: int = 3) -> bytes:
    rng = np.random.default_rng(seed)
    parts = []
    while sum(map(len, parts)) < n:
        kind = rng.integers(0, 3)
        if kind == 0:
            parts.append(b"the quick brown fox " * int(rng.integers(1, 20)))
        elif kind == 1:
            parts.append(bytes(rng.integers(0, 256, int(rng.integers(10, 400)))))
        else:
            parts.append(bytes([int(rng.integers(0, 256))])
                         * int(rng.integers(5, 300)))
    return b"".join(parts)[:n]


@pytest.mark.parametrize("level", [1, 6, 9])
def test_device_deflate_roundtrip(level):
    data = _mixed_payload(3 * SMALL + 123)
    blob = dd.deflate(data, level, block_size=SMALL)
    assert zlib.decompress(blob, wbits=-15) == data


def test_device_deflate_all_literal_and_runs():
    for data in [b"", b"a", b"ab" * 3000, bytes(5000), os.urandom(5000)]:
        blob = dd.deflate(data, 6, block_size=SMALL)
        assert zlib.decompress(blob, wbits=-15) == data


def test_device_ratio_sane():
    # Not bit-parity with the host encoder, but the device parse must stay
    # in zlib's ballpark: within 60% on a pathological pure-repeat payload
    # (token-boundary effects dominate tiny outputs) and 15% on real text.
    data = (b"zippy tpu device pipeline round trip " * 400)[:SMALL * 2]
    blob = dd.deflate(data, 6, block_size=SMALL)
    assert len(blob) <= len(zlib.compress(data, 6)) * 1.6

    text = open("/root/reference/tests/data/alice29.txt", "rb").read()[:4 * SMALL]
    blob = dd.deflate(text, 6, block_size=SMALL)
    assert len(blob) <= len(zlib.compress(text, 6)) * 1.15


def test_find_tokens_token_cover():
    data = _mixed_payload(SMALL)
    pad = np.zeros(SMALL + dd.PAD, np.uint8)
    pad[:SMALL] = np.frombuffer(data, np.uint8)
    tok = dd.find_tokens(jax.numpy.asarray(pad), np.int32(SMALL), k=2,
                         lazy=False)
    is_tok = np.asarray(tok["is_tok"])
    length = np.asarray(tok["length"])
    is_match = np.asarray(tok["is_match"])
    # The token cover must tile [0, N) exactly: steps from each token land on
    # the next token.
    pos = 0
    while pos < SMALL:
        assert is_tok[pos], f"position {pos} not covered"
        pos += int(length[pos]) if is_match[pos] else 1
    assert pos == SMALL


def test_sharded_deflate_matches_single_device():
    data = _mixed_payload(6 * 2048 + 17)
    mesh_n = parallel.default_mesh()          # all (8 virtual) devices
    mesh_1 = parallel.default_mesh(1)
    blob_n = parallel.deflate_sharded(data, 6, mesh_n, block_size=2048)
    blob_1 = parallel.deflate_sharded(data, 6, mesh_1, block_size=2048)
    assert blob_n == blob_1
    assert zlib.decompress(blob_n, wbits=-15) == data


def test_sharded_gzip_member():
    import gzip

    data = _mixed_payload(4 * 2048)
    blob = parallel.compress_gzip_sharded(data, 1, parallel.default_mesh())
    assert gzip.decompress(blob) == data


def test_public_api_device_engine():
    import zlib

    import zippy_tpu

    data = _mixed_payload(3 * SMALL)
    blob = zippy_tpu.compress(data, 6, zippy_tpu.dfDeflate,
                              engine_name="device")
    assert zlib.decompress(blob, wbits=-15) == data
    z = zippy_tpu.compress(data, 6, zippy_tpu.dfZlib, engine_name="device")
    assert zlib.decompress(z) == data
