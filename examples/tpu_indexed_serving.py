"""Scan-free device serving with encode-time decode indexes.

The device decode path normally needs a one-time host scan per stream
(ops/inflate_device.build_decode_index). For data YOU compress, that cost
can be paid once at encode time instead: compress_device_indexed embeds
each gzip member's full decode index in RFC-silent sidecar members, so
uncompress_device feeds the tiled TPU decode directly — zero host
scanning, with the member crc32 verified ON DEVICE. Any standard gzip
reader (CPython, zcat) decodes the same bytes unchanged.

Run: python examples/tpu_indexed_serving.py [file]
"""

import gzip
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

import zippy_tpu

src = (
    pathlib.Path(sys.argv[1]).read_bytes()
    if len(sys.argv) > 1
    else pathlib.Path("/root/reference/tests/data/urls.10K").read_bytes() * 8
)

t0 = time.perf_counter()
blob = zippy_tpu.compress_device_indexed(src, level=6)
print(f"compressed+indexed {len(src)} -> {len(blob)} bytes "
      f"({time.perf_counter() - t0:.2f}s; the index is the ratio cost of "
      f"the scan-free seam)")

# Standard readers see a normal gzip stream (sidecars decode to b"").
assert gzip.decompress(blob) == src

# Device-resident serving surface: decoded members stay in HBM for an
# on-chip consumer; verification fetches are batched across members.
t0 = time.perf_counter()
parts = zippy_tpu.uncompress_device(blob, array=True)
print(f"device decode (resident, no host scan): {len(parts)} member(s) in "
      f"{time.perf_counter() - t0:.2f}s")
got = b"".join(np.asarray(a)[:n].tobytes() for a, n in parts)
assert got == src
print("round-trip verified")
