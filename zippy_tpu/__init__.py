"""zippy_tpu: a TPU-native DEFLATE/zlib/gzip/zip/tar compression framework.

Same capabilities as guzba/zippy, re-architected for JAX/XLA/Pallas: the
data-parallel compute (LZ77 candidate scoring, Huffman construction, bit
packing, checksums) runs on TPU; the bit-serial paths run in the native C++
runtime; large inputs shard block-parallel across a device mesh.
"""

import os as _os

# numpy's BLAS worker threads spin-wait and steal cores from the native
# multi-threaded codec; this library never does BLAS math.
_os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
_os.environ.setdefault("OMP_NUM_THREADS", "1")

from . import profiling
from .api import compress, uncompress
from .gzip_format import (
    compress_device_indexed,
    compress_indexed,
    uncompress_device,
    uncompress_parallel,
)
from .tarballs import extract_all as extract_all_tarball
from .tarballs_v1 import Tarball, TarballEntry, create_tarball
from .ziparchives import (
    ZipArchiveReader,
    create_zip_archive,
    extract_all as extract_all_zip,
    open_zip_archive,
)
from .ziparchives_v1 import ArchiveEntry, ZipArchive
from .common import (
    BestCompression,
    BestSpeed,
    CompressedDataFormat,
    DefaultCompression,
    HuffmanOnly,
    NoCompression,
    ZippyError,
    dfDeflate,
    dfDetect,
    dfGzip,
    dfZlib,
)

__version__ = "0.1.0"


def warmup(max_bytes: int = 16 << 20, levels=(1, -1), decode: bool = True,
           encode: bool = True, mesh=None) -> int:
    """Pre-compile the device codec executables so no user-facing call ever
    hits a cold XLA compile (remote compiles on detached TPU runtimes cost
    40 s – minutes per shape; reference bar: usable from the first call,
    zippy.nim:11). The tiled decode needs at most two executables for ANY
    stream size; each encode level costs ~6. Compiles also land in the
    persistent cache (~/.cache/zippy_tpu_jax), so a warmed machine stays
    warm across processes. Returns the number of executables compiled."""
    from .ops import deflate_device, inflate_device

    n = 0
    if decode:
        n += inflate_device.warmup(max_bytes=max_bytes, mesh=mesh)
    if encode:
        n += deflate_device.warmup(levels=levels, mesh=mesh)
    return n

__all__ = [
    "compress",
    "uncompress",
    "warmup",
    "profiling",
    "compress_indexed",
    "uncompress_parallel",
    "compress_device_indexed",
    "uncompress_device",
    "ZipArchiveReader",
    "open_zip_archive",
    "create_zip_archive",
    "extract_all_zip",
    "ZipArchive",
    "ArchiveEntry",
    "Tarball",
    "TarballEntry",
    "create_tarball",
    "extract_all_tarball",
    "CompressedDataFormat",
    "ZippyError",
    "BestCompression",
    "BestSpeed",
    "DefaultCompression",
    "HuffmanOnly",
    "NoCompression",
    "dfDetect",
    "dfZlib",
    "dfGzip",
    "dfDeflate",
    "__version__",
]
