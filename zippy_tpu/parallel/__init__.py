"""Multi-device scale-out for zippy_tpu.

The reference has no parallelism of any kind (SURVEY §2: single-threaded,
single-process). This package is new design: data parallelism = block
sharding over a jax Mesh (the only strategy the DEFLATE bit-format admits;
TP/PP/EP have no analogue in a codec — documented N/A in SURVEY §2).
"""

from .blocks import (
    adler32_sharded,
    compress_gzip_sharded,
    compress_zlib_sharded,
    crc32_sharded,
    default_mesh,
    deflate_sharded,
)

__all__ = [
    "deflate_sharded",
    "compress_gzip_sharded",
    "compress_zlib_sharded",
    "crc32_sharded",
    "adler32_sharded",
    "default_mesh",
]
