#!/usr/bin/env python
"""zippy_tpu benchmark harness.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric: geometric-mean speedup vs the reference (guzba/zippy) across
its own published benchmark table (README.md:41-99 / BASELINE.md): uncompress,
compress BestSpeed (L1), compress Default (L6) over the same corpus files.

The published numbers were measured on a Ryzen 5 5600X; this machine differs.
Every published row also includes system zlib's time on the same op/file, so
we calibrate: measure local zlib per row, compute the per-row machine-speed
factor (zlib_local / zlib_published), take the MEDIAN factor across all rows
(per-row factors are meaningless for microsecond rows, where allocator and
harness noise dominate), scale zippy's published times by it, and compare.
vs_baseline > 1.0 means faster than zippy would be on this machine.

Run `python bench.py --verbose` for the per-op breakdown on stderr.
"""

from __future__ import annotations

import json
import pathlib
import statistics
import sys
import time
import zlib

sys.path.insert(0, str(pathlib.Path(__file__).parent))

import zippy_tpu  # noqa: E402

DATA = pathlib.Path("/root/reference/tests/data")

# {file: (zippy_ms, zlib_ms)} published min-times (BASELINE.md; reference
# README.md:41-55, :63-79, :83-99).
UNCOMPRESS = {
    "alice29.txt": (0.233, 0.397),
    "urls.10K": (1.140, 1.719),
    "rfctest3.gold": (0.047, 0.054),
    "randtest3.gold": (0.001, 0.008),
    "paper-100k.pdf": (0.210, 0.250),
    "geo.protodata": (0.068, 0.126),
}
COMPRESS_L1 = {
    "alice29.txt": (0.643, 1.236),
    "urls.10K": (1.943, 5.155),
    "rfctest3.gold": (0.119, 0.205),
    "randtest3.gold": (0.005, 0.076),
    "paper-100k.pdf": (0.230, 1.250),
    "geo.protodata": (0.192, 0.313),
}
COMPRESS_DEFAULT = {
    "alice29.txt": (2.361, 5.726),
    "urls.10K": (13.364, 13.049),
    "rfctest3.gold": (0.335, 0.637),
    "randtest3.gold": (0.048, 0.083),
    "paper-100k.pdf": (0.831, 1.467),
    "geo.protodata": (0.563, 0.867),
}


def _min_time(fn, *args, repeats: int = 120, min_total_s: float = 1.0) -> float:
    """Min wall time of fn(*args) in ms (benchy-style min-of-N)."""
    fn(*args)  # warmup (JIT compile / native build)
    times = []
    t_start = time.perf_counter()
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn(*args)
        times.append(time.perf_counter() - t0)
        if time.perf_counter() - t_start > min_total_s and len(times) >= 15:
            break
    return min(times) * 1e3


def _zlib_deflate(raw: bytes, level: int) -> bytes:
    c = zlib.compressobj(level, zlib.DEFLATED, -15)
    return c.compress(raw) + c.flush()


def _zlib_inflate(blob: bytes) -> bytes:
    return zlib.decompressobj(-15).decompress(blob)


def main() -> None:
    verbose = "--verbose" in sys.argv
    rows = []  # (op, name, ours_ms, zlib_local_ms, zippy_pub, zlib_pub)

    for name, (zippy_pub, zlib_pub) in UNCOMPRESS.items():
        # Decode the same checked-in fixture .gz the published table decodes
        # (default-level streams; reference README.md:38-47).
        gz = (DATA / (name.replace(".gold", "") + ".gz")).read_bytes()
        raw = (DATA / name).read_bytes()
        assert zippy_tpu.uncompress(gz) == raw
        d = _zlib_deflate(raw, 6)
        rows.append(("uncompress", name,
                     _min_time(zippy_tpu.uncompress, gz),
                     _min_time(_zlib_inflate, d), zippy_pub, zlib_pub))

    for level, table, op in (
        (1, COMPRESS_L1, "compress L1"),
        (-1, COMPRESS_DEFAULT, "compress default"),
    ):
        zl = 6 if level == -1 else level
        for name, (zippy_pub, zlib_pub) in table.items():
            raw = (DATA / name).read_bytes()
            rows.append((op, name,
                         _min_time(zippy_tpu.compress, raw, level,
                                   zippy_tpu.dfDeflate),
                         _min_time(_zlib_deflate, raw, zl),
                         zippy_pub, zlib_pub))

    # One robust machine-speed factor for the whole table.
    scale = statistics.median(
        zlib_local / zlib_pub for _, _, _, zlib_local, _, zlib_pub in rows
    )
    speedups = []
    lines = [f"machine-speed factor (median zlib_local/zlib_pub): {scale:.3f}"]
    for op, name, ours_ms, zlib_local_ms, zippy_pub, zlib_pub in rows:
        zippy_scaled = zippy_pub * scale
        speedup = zippy_scaled / ours_ms if ours_ms > 0 else 0.0
        speedups.append(speedup)
        lines.append(
            f"{op:18s} {name:16s} ours {ours_ms:8.3f} ms  "
            f"zippy(scaled) {zippy_scaled:8.3f} ms  "
            f"zlib(local) {zlib_local_ms:8.3f} ms  {speedup:5.2f}x"
        )

    geomean = statistics.geometric_mean(speedups)
    if verbose:
        print("\n".join(lines), file=sys.stderr)
    print(json.dumps({
        "metric": "codec_corpus_geomean_speedup_vs_zippy",
        "value": round(geomean, 3),
        "unit": "x",
        "vs_baseline": round(geomean, 3),
    }))


if __name__ == "__main__":
    main()
