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
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


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
