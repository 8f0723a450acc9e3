"""Device-parallel decompression (new capability — the reference decodes
bit-serially on one core; see zippy_tpu/ops/inflate_device.py).

A one-time host scan indexes token boundaries (the rapidgzip model), then
every segment Huffman-decodes concurrently on the device and LZ
back-references resolve in log-depth pointer-doubling rounds. The stream
stays standard RFC 1951 — the index is auxiliary and reusable, so repeated
decodes of the same stream (serving a hot artifact) skip the scan."""

import pathlib
import sys
import zlib

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from zippy_tpu.ops import inflate_device

raw = pathlib.Path(sys.argv[1]).read_bytes() if len(sys.argv) > 1 else (
    b"device parallel inflate demo " * 50000
)
blob = zlib.compress(raw, 6)[2:-4]  # any producer's raw DEFLATE stream

index = inflate_device.build_decode_index(blob)   # one-time host scan
out = inflate_device.inflate_device(blob, index)  # device-parallel decode
assert out == raw
print(f"{len(blob)} compressed -> {len(out)} bytes on "
      f"{index['segments'].shape[0]} parallel segments, "
      f"{index['block_lens'].shape[0]} block table(s)")
