"""Device-parallel inflate (ops/inflate_device.py).

Covers the index-based decode path the SURVEY prescribes for the inflate
hot loop (north star: vectorized bitstream decode + parallel block inflate;
reference hot loop inflate.nim:173-250): host scan -> parallel token
extraction -> pointer-doubling LZ resolution, validated byte-for-byte
against CPython zlib/gzip ground truth across stream producers.
"""

import zlib

import pytest

from zippy_tpu import native
from zippy_tpu.common import ZippyError
from zippy_tpu.ops import inflate_device as idev

from conftest import REFERENCE_DATA


def _fixture(name: str) -> bytes:
    return (REFERENCE_DATA / name).read_bytes()


@pytest.mark.parametrize("name", ["alice29.txt", "geo.protodata",
                                  "randtest3.gold", "rfctest3.gold"])
@pytest.mark.parametrize("producer", ["zlib6", "zlib1", "ours_default",
                                      "ours_l1", "ours_stored"])
def test_roundtrip_producers(name, producer):
    data = _fixture(name)
    blob = {
        "zlib6": lambda: zlib.compress(data, 6)[2:-4],
        "zlib1": lambda: zlib.compress(data, 1)[2:-4],
        "ours_default": lambda: native.deflate(data, -1),
        "ours_l1": lambda: native.deflate(data, 1),
        "ours_stored": lambda: native.deflate(data, 0),
    }[producer]()
    assert idev.inflate_device(blob) == data


def test_fixed_huffman_stream():
    # fixed.z is a zlib stream with fixed-Huffman blocks (reference
    # tests/test.nim:48-53).
    blob = _fixture("fixed.z")
    out = idev.inflate_device(blob[2:])
    assert out == _fixture("urls.10K")


def test_gzip_member_with_device_crc():
    raw = _fixture("alice29.txt")
    gz = _fixture("alice29.txt.gz")
    assert idev.uncompress_gzip_device(gz) == raw


def test_gzip_crc_mismatch_raises():
    gz = bytearray(_fixture("alice29.txt.gz"))
    gz[-5] ^= 0xFF  # corrupt the stored CRC trailer
    with pytest.raises(ZippyError):
        idev.uncompress_gzip_device(bytes(gz))


def test_index_reuse():
    data = _fixture("rfctest3.gold")
    blob = native.deflate(data, 6)
    index = idev.build_decode_index(blob)
    assert idev.inflate_device(blob, index) == data
    assert idev.inflate_device(blob, index) == data  # reusable


def test_empty_stream():
    blob = native.deflate(b"", 6)
    assert idev.inflate_device(blob) == b""


def test_deep_copy_chains():
    # dist-1 runs nest copies maximally deep; pointer doubling must still
    # converge in log rounds.
    data = b"a" * 100_000 + b"bc" * 5_000 + b"a" * 50_000
    blob = zlib.compress(data, 6)[2:-4]
    assert idev.inflate_device(blob) == data


def test_multiblock_stream():
    # > 1 deflate block (zlib emits multiple blocks for large inputs) plus
    # content variety to mix literals/matches/stored.
    data = (_fixture("urls.10K") + bytes(range(256)) * 64) * 2
    blob = zlib.compress(data, 4)[2:-4]
    index = idev.build_decode_index(blob)
    assert index["block_lens"].shape[0] >= 2
    assert idev.inflate_device(blob, index) == data


def test_scan_fuzz_never_crashes():
    """Bit-flip + truncation fuzz on the native scanner: raise ZippyError or
    succeed, never crash (the reference's fuzz contract, fuzz.nim:16-33,
    extended to the index path)."""
    import random

    random.seed(11)
    data = _fixture("rfctest3.gold")
    blob = bytearray(native.deflate(data, 6))
    for i in range(400):
        b = bytearray(blob)
        if i % 2 == 0:
            pos = random.randrange(len(b))
            b[pos] ^= 1 << random.randrange(8)
        else:
            b = b[:random.randrange(len(b))]
        try:
            native.inflate_scan(bytes(b), 0, 64)
        except ZippyError:
            pass


def test_device_decode_corrupt_index_no_crash():
    """A scan that survives corruption may yield a wrong-but-shaped index;
    device decode must produce bytes (garbage is fine — the container crc
    gates correctness) without crashing."""
    import random

    random.seed(13)
    data = _fixture("randtest3.gold")
    blob = bytearray(native.deflate(data, 6))
    done = 0
    for _ in range(60):
        b = bytearray(blob)
        b[random.randrange(16, len(b))] ^= 1 << random.randrange(8)
        try:
            idx = idev.build_decode_index(bytes(b))
        except ZippyError:
            continue
        if idx["total_out"] > 4 * len(data):
            continue  # don't allocate for absurd corrupt claims in tests
        out = idev.inflate_device(bytes(b), idx)
        assert isinstance(out, bytes)
        done += 1
    assert done > 0


def test_sharded_decode_byte_identity():
    """N-device sharded decode must be byte-identical to 1-device (the
    multi-chip gate, SURVEY §4 item f)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    raw = _fixture("urls.10K")
    blob = zlib.compress(raw, 6)[2:-4]
    index = idev.build_decode_index(blob)
    one = idev.inflate_device(blob, index)
    mesh = Mesh(np.array(jax.devices()), ("seg",))
    many = idev.inflate_device(blob, index, mesh=mesh)
    assert one == raw
    assert many == one


def test_scan_matches_native_end_bit():
    data = _fixture("geo.protodata")
    blob = native.deflate(data, 6)
    index = idev.build_decode_index(blob)
    _, end_bit = native.inflate(blob)
    assert index["end_bit"] == end_bit
    assert index["total_out"] == len(data)
