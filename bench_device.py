"""Device-resident TPU benchmark: per-chip kernel throughput.

Measures the on-chip compute paths with inputs already in HBM
(`jnp.asarray` + `block_until_ready`), which is the honest per-chip number
on this rig — the axon host<->device tunnel (~0.2 GB/s) would otherwise
dominate and says nothing about the kernels. Run with plain `python` (no
JAX_PLATFORMS override) so the real chip is used; on a CPU-only host it
falls back to the virtual backend and the numbers are meaningless.

Prints one JSON line per kernel:
  {"metric": "...", "value": N, "unit": "GB/s"}

Reference points (zippy, Ryzen 5 5600X, SURVEY.md section 6): BestSpeed
compress ~0.24-0.45 GB/s, crc32/adler32 SIMD ~15-20 GB/s-class.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _bench(fn, *args, reps: int = 20) -> float:
    """Min single-call time over reps spread across two batches.

    The chip is shared (other tenants' work queues ahead for seconds to
    minutes), so a mean is hopeless; the min over spread samples estimates
    the true kernel time. Two sleep-separated batches dodge a single busy
    stretch."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for batch in range(2):
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        if batch == 0:
            time.sleep(2.0)
    return best


def main() -> None:
    import jax
    import jax.numpy as jnp

    from zippy_tpu.ops import checksums, deflate_device as dd

    dev = jax.devices()[0]
    verbose = "--verbose" in sys.argv
    if verbose:
        print(f"device: {dev}", file=sys.stderr)

    results = []

    # Checksums over a 64 MiB device-resident buffer.
    nbytes = 64 << 20
    rng = np.random.default_rng(0)
    buf = jnp.asarray(rng.integers(0, 256, nbytes, dtype=np.uint8))
    jax.block_until_ready(buf)
    for name, fn in (("crc32", checksums.crc32_device),
                     ("adler32", checksums.adler32_device)):
        dt = _bench(fn, buf)
        results.append((f"device_{name}", nbytes / dt / 1e9))

    # Device-parallel inflate (ops/inflate_device.py): fused single-dispatch
    # decode with inputs pre-placed in HBM (index built once on host).
    # Roofline note: per output byte the kernel moves ~4 B LUT-gather + ~26 B
    # resolve traffic (3x int32 scatter/cummax/span arrays + log-depth
    # pointer-doubling gathers at 4 B/hop) => ~30-40 B HBM traffic/byte; at
    # v5e's ~819 GB/s HBM that bounds decode at ~20-27 GB/s. Measured
    # numbers land within ~2x of that bound (gathers are random-access).
    import zlib as _zlib

    from zippy_tpu.ops import inflate_device as idev

    for label, raw_src in (("urls", raw := open(
            "/root/reference/tests/data/urls.10K", "rb").read()),
            ("4mib", (raw * 6)[: 4 << 20])):
        blob = _zlib.compress(raw_src, 6)[2:-4]
        idx = idev.build_decode_index(blob)
        total = idx["total_out"]
        seg = idx["segments"]; nseg = seg.shape[0]
        out_pad = idev._pad_pow2(total)
        nseg_pad = idev._pad_pow2(max(nseg, 1), 8)
        seg_pack = np.zeros((3, nseg_pad), np.int32)
        seg_outv = np.zeros(nseg_pad, np.int32)
        seg_pack[0, :nseg] = seg[:, 0]
        seg_pack[1, :nseg] = seg[:, 2]
        seg_pack[2, :nseg] = seg[:, 3]
        seg_outv[:nseg] = seg[:, 1]
        sto_pack = np.zeros((3, 4), np.int32)
        sto_pack[1] = out_pad
        lens8 = idx["block_lens"]
        wbuf = np.frombuffer(blob + b"\x00" * (12 - len(blob) % 4), np.uint32)
        args = [jnp.asarray(a) for a in
                (wbuf, seg_pack, seg_outv, lens8, sto_pack)]
        jax.block_until_ready(args)
        k = int(idx["every"])
        rounds = idev._rounds(idx)
        fn = lambda *a: idev._decode(*a, k=k, out_pad=out_pad, rounds=rounds)
        out = fn(*args)
        got = bytes(np.asarray(out)[:total].tobytes())
        assert got == raw_src, "device inflate mismatch"
        dt = _bench(fn, *args)
        results.append((f"device_inflate_{label}", total / dt / 1e9))

    # Batched block compress (fixed-Huffman pipeline, the fused jittable
    # step __graft_entry__ exposes): 64 x 64 KiB = 4 MiB per dispatch.
    # Larger batches exceed HBM (the match-scoring intermediate is
    # [batch, pos, k, window]).
    raw = open("/root/reference/tests/data/urls.10K", "rb").read() * 8
    nb = 64
    data = (raw * ((nb * dd.BLOCK) // len(raw) + 1))[: nb * dd.BLOCK]
    blocks = jnp.asarray(
        np.frombuffer(data, np.uint8).reshape(nb, dd.BLOCK))
    lens = jnp.asarray(np.full(nb, dd.BLOCK, np.int32))
    jax.block_until_ready(blocks)
    step = jax.jit(jax.vmap(lambda a, b: dd.compress_block_fixed(a, b)))
    dt = _bench(step, blocks, lens, reps=10)
    results.append(("device_block_compress", len(data) / dt / 1e9))

    for name, gbps in results:
        print(json.dumps({
            "metric": name, "value": round(gbps, 2), "unit": "GB/s"}))


if __name__ == "__main__":
    main()
