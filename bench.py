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


def _read_steal() -> int:
    """Aggregate CPU steal ticks (field 8 of /proc/stat's cpu line)."""
    try:
        with open("/proc/stat", "rb") as f:
            parts = f.readline().split()
        return int(parts[8]) if len(parts) > 8 else 0
    except OSError:  # pragma: no cover
        return 0


def _min_time(fn, *args, min_total_s: float = 1.0, max_total_s: float = 4.0,
              clean_target: int = 12) -> float:
    """Min wall time of fn(*args) in ms (benchy-style min-of-N).

    Steal-aware budget: this host's hypervisor neighbor steals a core for
    seconds at a time, which inflates wall-clock samples. Samples whose
    window saw no steal-tick delta count as "clean"; sampling continues
    until enough clean samples exist (or the hard cap), so quiet hosts
    finish fast and stolen stretches just extend the search for the true
    minimum rather than polluting it.
    """
    fn(*args)  # warmup (JIT compile / native build)
    best = float("inf")
    n = clean = 0
    t_start = time.perf_counter()
    while True:
        s0 = _read_steal()
        t0 = time.perf_counter()
        fn(*args)
        t1 = time.perf_counter()
        dt = t1 - t0
        if dt < best:
            best = dt
        n += 1
        clean += _read_steal() == s0
        elapsed = t1 - t_start
        if n >= 20 and elapsed > min_total_s and clean >= clean_target:
            break
        if elapsed > max_total_s:
            break
    return best * 1e3


def _zlib_deflate(raw: bytes, level: int) -> bytes:
    c = zlib.compressobj(level, zlib.DEFLATED, -15)
    return c.compress(raw) + c.flush()


def _zlib_inflate(blob: bytes) -> bytes:
    return zlib.decompressobj(-15).decompress(blob)


def main() -> None:
    verbose = "--verbose" in sys.argv
    rows = []  # (op, name, ours_ms, zlib_local_ms, zippy_pub, zlib_pub)

    # Work list: (op, name, ours_fn, zlib_fn, zippy_pub, zlib_pub). Each row
    # is measured in TWO passes spread minutes apart and the per-row min
    # taken across passes: this host's Firecracker neighbor steals a core
    # for seconds at a time, so a single window can miss every quiet
    # stretch; two separated windows make the min a stable estimate.
    work = []
    for name, (zippy_pub, zlib_pub) in UNCOMPRESS.items():
        # Decode the same checked-in fixture .gz the published table decodes
        # (default-level streams; reference README.md:38-47).
        gz = (DATA / (name.replace(".gold", "") + ".gz")).read_bytes()
        raw = (DATA / name).read_bytes()
        assert zippy_tpu.uncompress(gz) == raw
        d = _zlib_deflate(raw, 6)
        work.append(("uncompress", name,
                     (zippy_tpu.uncompress, gz), (_zlib_inflate, d),
                     zippy_pub, zlib_pub))

    for level, table, op in (
        (1, COMPRESS_L1, "compress L1"),
        (-1, COMPRESS_DEFAULT, "compress default"),
    ):
        zl = 6 if level == -1 else level
        for name, (zippy_pub, zlib_pub) in table.items():
            raw = (DATA / name).read_bytes()
            work.append((op, name,
                         (zippy_tpu.compress, raw, level, zippy_tpu.dfDeflate),
                         (_zlib_deflate, raw, zl), zippy_pub, zlib_pub))

    mins: dict[int, tuple[float, float]] = {}
    for _pass in range(2):
        for i, (_, _, ours_call, zlib_call, _, _) in enumerate(work):
            ours_ms = _min_time(*ours_call)
            zlib_ms = _min_time(*zlib_call)
            prev = mins.get(i, (float("inf"), float("inf")))
            mins[i] = (min(prev[0], ours_ms), min(prev[1], zlib_ms))

    rows = [(op, name, mins[i][0], mins[i][1], zp, zl)
            for i, (op, name, _, _, zp, zl) in enumerate(work)]

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
