"""Block-parallel compression over a TPU mesh (new capability — the
reference is single-threaded; see zippy_tpu/parallel/)."""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import gzip

import zippy_tpu
from zippy_tpu import parallel

data = pathlib.Path(sys.argv[1]).read_bytes() if len(sys.argv) > 1 else (
    b"block parallel compression demo " * 100000
)
mesh = parallel.default_mesh()
blob = parallel.compress_gzip_sharded(data, level=6, mesh=mesh)
assert gzip.decompress(blob) == data
print(f"{mesh.devices.size} device(s): {len(data)} -> {len(blob)} bytes")
