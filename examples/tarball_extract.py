"""Extract a tarball (reference examples/tarball_extract.nim)."""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import zippy_tpu

zippy_tpu.extract_all_tarball(sys.argv[1], sys.argv[2])
