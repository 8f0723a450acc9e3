"""Multi-host (multi-process) compression over DCN.

The reference has no distributed layer (SURVEY §5: no NCCL/MPI/networking).
Design here: each host compresses its local shard of the dataset into a
complete gzip member (optionally block-parallel over its local chips via
zippy_tpu.parallel.blocks), and the members are gathered to every process in
process order with one DCN collective. Concatenated gzip members decode to
the concatenated payload (RFC 1952; both our reader and CPython agree), so
the gathered stream is a valid whole-dataset archive.

Failure semantics: fail loudly (exceptions propagate; no elastic recovery),
matching the survey's prescription for parity.
"""

from __future__ import annotations

import numpy as np

from .. import native


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize the jax distributed runtime (no-op when single-process)."""
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def compress_gzip_all_hosts(local_data: bytes, level: int = 1,
                            engine: str = "native") -> bytes:
    """Compress each process's shard; return the concatenated multi-member
    gzip stream (identical on every process after one DCN all-gather).

    engine="native" runs the host codec per process; engine="device" runs
    the block-parallel device pipeline over THIS process's local chips
    (parallel.blocks under shard_map), so the multi-host layer composes
    with the multi-chip layer: ICI parallelism inside each member, one DCN
    all-gather across members."""
    import jax

    if engine == "device":
        from . import blocks

        mesh = blocks.Mesh(np.array(jax.local_devices()), (blocks.AXIS,))
        member = blocks.compress_gzip_sharded(local_data, level, mesh)
    else:
        member = native.gzip_compress(local_data, level)

    if jax.process_count() == 1:
        return member

    from jax.experimental import multihost_utils

    # Ragged gather: pad members to the global max length, gather, trim.
    local_len = np.array([len(member)], dtype=np.int64)
    all_lens = np.asarray(
        multihost_utils.process_allgather(local_len)
    ).reshape(-1)
    max_len = int(all_lens.max())
    padded = np.zeros(max_len, dtype=np.uint8)
    padded[: len(member)] = np.frombuffer(member, np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    parts = [gathered[p, : int(all_lens[p])].tobytes()
             for p in range(jax.process_count())]
    return b"".join(parts)


def uncompress_gzip_all_hosts(stream: bytes) -> bytes:
    """Decode a multi-member stream produced by compress_gzip_all_hosts."""
    from .. import gzip_format

    return gzip_format.uncompress_gzip(stream)
