"""Device-parallel inflate (ops/inflate_device.py).

Covers the index-based decode path the SURVEY prescribes for the inflate
hot loop (north star: vectorized bitstream decode + parallel block inflate;
reference hot loop inflate.nim:173-250): host scan -> parallel token
extraction -> pointer-doubling LZ resolution, validated byte-for-byte
against CPython zlib/gzip ground truth across stream producers.
"""

import zlib

import numpy as np

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


def test_device_decode_corrupt_never_silent():
    """The raw-deflate integrity contract (VERDICT r3 item 2): a corrupted
    stream either fails the scan (ZippyError), or — when the corruption
    still parses as valid DEFLATE — the device decode must EQUAL the serial
    host decode (the adler gate guarantees it), exactly like the reference's
    raise-on-malformed / bytes-on-valid contract (inflate.nim:77-82).
    Silent divergence between device and host decode is impossible."""
    import random

    random.seed(13)
    data = _fixture("randtest3.gold")
    blob = bytearray(native.deflate(data, 6))
    decoded = 0
    for _ in range(60):
        b = bytes_mut = bytearray(blob)
        bytes_mut[random.randrange(16, len(b))] ^= 1 << random.randrange(8)
        b = bytes(bytes_mut)
        try:
            idx = idev.build_decode_index(b)
        except ZippyError:
            continue
        if idx["total_out"] > 4 * len(data):
            continue  # don't allocate for absurd corrupt claims in tests
        out = idev.inflate_device(b, idx)  # verify=True default
        host, _ = native.inflate(b)
        assert out == host
        decoded += 1
    assert decoded > 0


def test_device_decode_verify_gate_fires():
    """A decode whose output diverges from the scan's serial decode must
    raise: corrupt the recorded adler and check the gate trips."""
    data = _fixture("alice29.txt")
    blob = native.deflate(data, 6)
    idx = idev.build_decode_index(blob)
    idx = dict(idx)
    idx["adler"] ^= 0x1234
    with pytest.raises(ZippyError):
        idev.inflate_device(blob, idx)


def test_multi_tile_stream():
    """A stream larger than one S tile must chain tiles through the halo
    (cross-tile matches read the carried 32 KiB window) and still verify."""
    base = _fixture("urls.10K")
    data = (base * 6)[: 3 * idev.CFG_S.tile_out + 12345]
    blob = zlib.compress(data, 6)[2:-4]
    idx = idev.build_decode_index(blob)
    tiles = idev._plan_tiles(idx, idev._pick_cfg(idx["total_out"]))
    assert len(tiles) >= 2
    assert idev.inflate_device(blob, idx) == data


def test_tile_planner_capacity_cuts():
    """Pathological shapes: many tiny stored blocks and literal-dense
    streams must cut tiles on the binding capacity, never overflow."""
    # All-literal (HuffmanOnly) stream: densest token stream possible.
    data = bytes(np.random.default_rng(3).integers(0, 256, 300_000,
                                                   dtype=np.uint8))
    blob = native.deflate(data, -2)
    assert idev.inflate_device(blob) == data
    # Stored-only stream (level 0): spans + words bound the tiles.
    blob0 = native.deflate(data, 0)
    assert idev.inflate_device(blob0) == data


def test_inflate_device_array_surface():
    data = _fixture("geo.protodata")
    blob = native.deflate(data, 6)
    arr, total = idev.inflate_device_array(blob)
    assert total == len(data)
    assert bytes(np.asarray(arr)[:total].tobytes()) == data


def test_inflate_device_array_multi_tile_capacity_cut():
    """ADVICE r4 high regression: capacity-cut tiles (all-literal
    HuffmanOnly stream -> nseg cuts -> used << tile_out) made _place_tile's
    fixed-width write exceed a buffer padded only to next-pow2(total);
    dynamic_update_slice then CLAMPED the start, silently corrupting
    earlier tiles while the (pre-placement) adler gate stayed green."""
    data = bytes(np.random.default_rng(7).integers(0, 256, 1 << 20,
                                                   dtype=np.uint8))
    blob = native.deflate(data, -2)  # HuffmanOnly: every byte a literal
    idx = idev.build_decode_index(blob)
    cfg = idev._pick_cfg(int(idx["total_out"]))
    tiles = idev._plan_tiles(idx, cfg)
    assert len(tiles) >= 2
    assert tiles[-1].base + cfg.tile_out > 1 << 20  # the clamping shape
    arr, total = idev.inflate_device_array(blob, idx)
    assert total == len(data)
    assert bytes(np.asarray(arr)[:total].tobytes()) == data


def test_warmup_compiles_and_counts():
    n = idev.warmup(max_bytes=1 << 20)
    assert n >= 1
    # Warm path: a decode right after warmup must not need a new executable
    # (same-config dispatch); just assert it still round-trips.
    data = _fixture("rfctest3.gold")
    blob = native.deflate(data, 6)
    assert idev.inflate_device(blob) == data


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


def test_large_config_tile_path():
    """Streams past the S-config span pick CFG_L; the L executable's
    planner/kernel path must round-trip and self-verify too (CI otherwise
    only ever exercises CFG_S)."""
    base = _fixture("urls.10K")
    data = (base * 5)[: 8 * idev.CFG_S.tile_out + 4321]  # > 2 MiB -> CFG_L
    blob = zlib.compress(data, 6)[2:-4]
    idx = idev.build_decode_index(blob)
    assert idev._pick_cfg(idx["total_out"]) == idev.CFG_L
    assert idev.inflate_device(blob, idx) == data


def test_device_indexed_gzip_roundtrip():
    """Encode-time index emission (SURVEY §5 decode seam): the indexed
    stream must (a) decode to identical bytes by ANY RFC 1952 reader
    (sidecar members are empty-payload, so CPython sees a normal gzip),
    and (b) device-decode with ZERO host scans."""
    import gzip as _gzip
    from unittest import mock

    from zippy_tpu import gzip_format as gf

    data = (_fixture("urls.10K") * 40)[: (1 << 21) + 12345]
    blob = gf.compress_device_indexed(data, 6)
    # (a) RFC-silent sidecars: CPython ground truth.
    assert _gzip.decompress(blob) == data
    # host parallel path still works on the same stream
    assert gf.uncompress_parallel(blob) == data
    # (b) scan-free device decode
    with mock.patch.object(idev, "build_decode_index",
                           side_effect=AssertionError("scanned!")):
        out = gf.uncompress_device(blob)
    assert out == data


def test_device_indexed_array_surface():
    from zippy_tpu import gzip_format as gf

    data = _fixture("geo.protodata")
    blob = gf.compress_device_indexed(data, 6)
    parts = gf.uncompress_device(blob, array=True)
    got = b"".join(np.asarray(a)[:t].tobytes() for a, t in parts)
    assert got == data


def test_index_serialization_roundtrip():
    from zippy_tpu import gzip_format as gf

    data = _fixture("paper-100k.pdf")
    blob = native.deflate(data, 6)
    idx = idev.build_decode_index(blob)
    idx2 = gf.deserialize_index(gf.serialize_index(idx))
    for k in ("total_out", "end_bit", "max_depth", "adler", "every"):
        assert idx2[k] == idx[k], k
    for k in ("segments", "stored", "block_lens"):
        assert np.array_equal(idx2[k], idx[k]), k
    # the deserialized index must drive a real decode
    assert idev.inflate_device(blob, idx2) == data


def test_cfg_l_corrupt_never_silent():
    """VERDICT r4 item 8: the CFG_L/multi-tile path (planner cuts, halo
    chaining, u16 depth saturation) under bit-flip + truncation: every
    corrupted stream either raises ZippyError or device-decodes EQUAL to
    the serial host decode (adler gate) — never silent garbage. Mirrors
    the CFG_S fuzz above at CFG_L scale (reference contract fuzz.nim:16-33,
    stress2.nim:8-21)."""
    import random

    random.seed(17)
    base = _fixture("urls.10K") + bytes(range(256)) * 16
    data = (base * 40)[: 8 * idev.CFG_S.tile_out + 99991]  # > 2 MiB
    blob = bytearray(zlib.compress(data, 6)[2:-4])
    idx0 = idev.build_decode_index(bytes(blob))
    assert idev._pick_cfg(int(idx0["total_out"])) == idev.CFG_L
    assert len(idev._plan_tiles(idx0, idev.CFG_L)) >= 1
    decoded = 0
    for i in range(14):
        b = bytearray(blob)
        if i % 3 == 2:
            b = b[: random.randrange(len(b) // 2, len(b))]
        else:
            b[random.randrange(16, len(b))] ^= 1 << random.randrange(8)
        b = bytes(b)
        try:
            idx = idev.build_decode_index(b)
        except ZippyError:
            continue
        if idx["total_out"] > 4 * len(data):
            continue
        try:
            out = idev.inflate_device(b, idx)
        except ZippyError:
            continue  # the device verify gate fired: never silent
        host, _ = native.inflate(b)
        assert out == host
        decoded += 1
    # the uncorrupted stream decodes and verifies at CFG_L
    assert idev.inflate_device(bytes(blob), idx0) == data


def test_device_indexed_multi_chunk_sidecar():
    """An index too big for one FEXTRA (>60 KB deflated) must split across
    multiple sidecar members and reassemble; the bytes path walks the same
    stream."""
    from zippy_tpu import gzip_format as gf

    data = (_fixture("urls.10K") * 8)[: 4 << 20]
    blob = gf.compress_device_indexed(data, 6, member_size=4 << 20)
    # count sidecars: members after the first data member with a ZX field
    import struct
    chunks = 0
    pos = 0
    while pos < len(blob):
        mlen = gf._indexed_member_length(blob, pos)
        assert mlen is not None
        if gf._member_zx(blob, pos) is not None:
            chunks += 1
        pos += mlen
    assert chunks >= 2, chunks  # the index really spans sidecars
    assert gf.uncompress_device(blob) == data          # bytes path
    parts = gf.uncompress_device(blob, array=True)     # array path
    got = b"".join(np.asarray(a)[:t].tobytes() for a, t in parts)
    assert got == data
    import gzip as _g
    assert _g.decompress(blob) == data                 # RFC ground truth


def test_uncompress_device_engine_multi_member():
    """uncompress(engine_name='device') must decode ALL gzip members
    (CPython concatenation semantics), and transparently go scan-free on
    indexed streams."""
    import gzip as _g
    from unittest import mock

    import zippy_tpu
    from zippy_tpu import gzip_format as gf

    a = _fixture("alice29.txt")
    b = _fixture("geo.protodata")
    blob = (zippy_tpu.compress(a, 6, zippy_tpu.dfGzip)
            + zippy_tpu.compress(b, 6, zippy_tpu.dfGzip))
    assert _g.decompress(blob) == a + b
    assert zippy_tpu.uncompress(blob, engine_name="device") == a + b
    # indexed stream: engine=device must not scan
    iblob = gf.compress_device_indexed(a, 6, member_size=1 << 17)
    with mock.patch.object(idev, "build_decode_index",
                           side_effect=AssertionError("scanned!")):
        assert zippy_tpu.uncompress(iblob, engine_name="device") == a
