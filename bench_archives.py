"""Archive + host-checksum benchmarks (reference bench_tarballs.nim,
bench_ziparchives.nim, bench_checksums.nim analogues).

The reference benches read-side archive walks against `untar` and itself;
no numbers are published, so the recorded comparison target here is
CPython's stdlib (`tarfile`/`zipfile`/`zlib`) on the same machine — the
same role nim-lang/zip plays in the reference's codec tables. Prints one
JSON line per row: {"metric", "value", "unit", "vs_stdlib"}.

Fixtures: libressl tarball + Bagnon zip from the reference test data
(julia-1.7.1.tar.gz is absent upstream, .MISSING_LARGE_BLOBS).
"""

from __future__ import annotations

import io
import json
import os
import shutil
import sys
import tarfile
import tempfile
import time
import zipfile
import zlib
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import zippy_tpu
from zippy_tpu import tarballs, tarballs_v1, ziparchives

DATA = Path("/root/reference/tests/data")
TAR_GZ = DATA / "tarballs" / "libressl-3.4.2.tar.gz"
ZIP = DATA / "ziparchives" / "Bagnon-10.2.31.zip"
FIREWORKS = DATA / "fireworks.jpg"


def _best(fn, reps: int = 5) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _row(metric: str, ours_s: float, stdlib_s: float, nbytes: int,
         verbose: bool) -> dict:
    row = {
        "metric": metric,
        "value": round(nbytes / ours_s / 1e9, 3),
        "unit": "GB/s",
        "vs_stdlib": round(stdlib_s / ours_s, 2),
    }
    if verbose:
        print(f"{metric:24} ours {ours_s*1e3:8.2f} ms   stdlib "
              f"{stdlib_s*1e3:8.2f} ms   {row['vs_stdlib']:.2f}x",
              file=sys.stderr)
    return row


def main() -> None:
    verbose = "--verbose" in sys.argv
    rows = []

    # --- tar extract (reference bench_tarballs.nim walk analogue) ---------
    tgz = TAR_GZ.read_bytes()
    with tempfile.TemporaryDirectory() as td:
        ours_dir, std_dir = Path(td) / "ours", Path(td) / "std"

        def ours_tar():
            if ours_dir.exists():
                shutil.rmtree(ours_dir)
            tarballs.extract_all(TAR_GZ, ours_dir)

        def std_tar():
            if std_dir.exists():
                shutil.rmtree(std_dir)
            with tarfile.open(TAR_GZ) as tf:
                tf.extractall(std_dir, filter="tar")

        rows.append(_row("tar_extract_all", _best(ours_tar), _best(std_tar),
                         len(tgz), verbose))

        # --- tar create (tarballs_v1 writer, reference createTarball) -----
        # (dot-free dir name: add_dir mirrors the reference's extension
        # heuristic, tarballs_v1.nim, which rejects "libressl-3.4.2")
        src = str(Path(td) / "libressl")
        shutil.copytree(next((ours_dir / p) for p in os.listdir(ours_dir)),
                        src)
        out_tgz = str(Path(td) / "out.tar.gz")

        def ours_tar_create():
            tarballs_v1.create_tarball(src, out_tgz)
            return os.path.getsize(out_tgz)

        def std_tar_create():
            bio = io.BytesIO()
            with tarfile.open(fileobj=bio, mode="w:gz") as tf:
                tf.add(src, arcname=Path(src).name)
            return len(bio.getvalue())

        n_out = ours_tar_create()
        rows.append(_row("tar_create", _best(ours_tar_create),
                         _best(std_tar_create), n_out, verbose))

    # --- zip extract (reference bench_ziparchives.nim walk analogue) ------
    zbytes = ZIP.read_bytes()

    def ours_zip_walk():
        with ziparchives.open_zip_archive(ZIP) as za:
            total = 0
            for name in za.walk_files():
                total += len(za.extract_file(name))
            return total

    def std_zip_walk():
        with zipfile.ZipFile(ZIP) as zf:
            total = 0
            for info in zf.infolist():
                if not info.is_dir():
                    total += len(zf.read(info.filename))
            return total

    assert ours_zip_walk() == std_zip_walk()
    rows.append(_row("zip_extract_walk", _best(ours_zip_walk),
                     _best(std_zip_walk), len(zbytes), verbose))

    # --- zip create (ziparchives writer, BestSpeed entries) ---------------
    with zipfile.ZipFile(ZIP) as zf:
        entries = {i.filename: zf.read(i.filename)
                   for i in zf.infolist() if not i.is_dir()}
    raw_total = sum(len(v) for v in entries.values())

    def ours_zip_create():
        return ziparchives.create_zip_archive(entries)

    def std_zip_create():
        bio = io.BytesIO()
        with zipfile.ZipFile(bio, "w", zipfile.ZIP_DEFLATED,
                             compresslevel=1) as zf:
            for name, contents in entries.items():
                zf.writestr(name, contents)
        return bio.getvalue()

    rows.append(_row("zip_create", _best(ours_zip_create),
                     _best(std_zip_create), raw_total, verbose))

    # --- host checksums (reference bench_checksums.nim: fireworks.jpg) ----
    fw = FIREWORKS.read_bytes()
    from zippy_tpu import native

    rows.append(_row("crc32_host", _best(lambda: native.crc32(fw), 50),
                     _best(lambda: zlib.crc32(fw), 50), len(fw), verbose))
    rows.append(_row("adler32_host", _best(lambda: native.adler32(fw), 50),
                     _best(lambda: zlib.adler32(fw), 50), len(fw), verbose))

    for row in rows:
        print(json.dumps(row))


if __name__ == "__main__":
    main()
