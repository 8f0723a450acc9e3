"""Block-parallel compression over a device mesh.

The reference is single-threaded; its 4 MiB block loop (deflate.nim:228-237)
is the natural parallelism seam because LZ77 state never crosses block
boundaries (lz77.nim:63-64). Here each mesh device compresses a contiguous
run of blocks with the device pipeline (ops/deflate_device.py) under
shard_map; per-block bit lengths are all-gathered (the only collective the
problem needs — see SURVEY §5 "distributed communication backend") and the
host splices the ragged bitstreams in block order, so the N-device output is
byte-identical to the 1-device output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import deflate_device as dd

AXIS = "blocks"


def default_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


@functools.partial(jax.jit, static_argnames=("mesh", "k", "lazy"))
def _compress_blocks_sharded(blocks, lens, *, mesh: Mesh, k: int, lazy: bool):
    """blocks: (nblocks, N + PAD) uint8; lens: (nblocks,) int32.

    Runs the fixed-Huffman device pipeline on every block, sharded over the
    mesh; returns (words (nblocks, W) uint32, bits (nblocks,) int32,
    total_bits ()) with total_bits computed via an all-reduce.
    """

    def per_shard(blocks_l, lens_l):
        words, bits, llh, dh = jax.vmap(
            lambda d, n: dd.compress_block_fixed(d, n, k=k, lazy=lazy)
        )(blocks_l, lens_l)
        total = jax.lax.psum(jnp.sum(bits), AXIS)
        return words, bits, total

    return jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS)),
        out_specs=(P(AXIS, None), P(AXIS), P()),
    )(blocks, lens)


def deflate_sharded(data: bytes, level: int = 1, mesh: Mesh | None = None,
                    block_size: int = dd.BLOCK) -> bytes:
    """Raw DEFLATE stream, block-parallel across the mesh (fixed Huffman).

    Output is byte-identical regardless of mesh size: block payloads are
    spliced in block order on the host.
    """
    if mesh is None:
        mesh = default_mesh()
    n_dev = mesh.devices.size
    arr = np.frombuffer(data, dtype=np.uint8)
    n = len(arr)
    if n == 0:
        from .. import native

        return native.deflate(data, level)

    k, lazy = dd._level_params(level)
    nblocks = -(-n // block_size)
    # Pad block count to a multiple of the mesh size (empty blocks emit
    # nothing: bits come back 0-length for n=0... keep lens >= 0).
    nblocks_padded = -(-nblocks // n_dev) * n_dev
    blocks = np.zeros((nblocks_padded, block_size + dd.PAD), np.uint8)
    lens = np.zeros(nblocks_padded, np.int32)
    for bi in range(nblocks):
        start = bi * block_size
        end = min(start + block_size, n)
        seg = arr[start : min(start + block_size + dd.PAD, n)]
        blocks[bi, : len(seg)] = seg
        lens[bi] = end - start

    sharding = NamedSharding(mesh, P(AXIS, None))
    blocks_j = jax.device_put(blocks, sharding)
    lens_j = jax.device_put(lens, NamedSharding(mesh, P(AXIS)))
    words, bits, _total = _compress_blocks_sharded(
        blocks_j, lens_j, mesh=mesh, k=k, lazy=lazy
    )
    words_np = np.asarray(jax.device_get(words)).astype("<u4")
    bits_np = np.asarray(jax.device_get(bits))

    out = dd._ByteBitAppender()
    for bi in range(nblocks):
        final = bi == nblocks - 1
        bw = dd._HostBitWriter()
        bw.add(1 if final else 0, 1)
        bw.add(1, 2)  # fixed-Huffman block
        out.append_host_writer(bw)
        out.append_bits(words_np[bi].view(np.uint8), int(bits_np[bi]))
    return bytes(out.out)


def compress_gzip_sharded(data: bytes, level: int = 1,
                          mesh: Mesh | None = None) -> bytes:
    """gzip member whose deflate body is produced block-parallel."""
    import struct

    from .. import native

    body = deflate_sharded(data, level, mesh)
    header = struct.pack("<2sBBIBB", b"\x1f\x8b", 8, 0, 0, 0, 0)
    trailer = struct.pack("<II", native.crc32(data), len(data) & 0xFFFFFFFF)
    return header + body + trailer
