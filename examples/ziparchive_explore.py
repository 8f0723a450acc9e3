"""Walk a zip without extracting to disk (examples/ziparchive_explore.nim)."""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import zippy_tpu

with zippy_tpu.open_zip_archive(sys.argv[1]) as reader:
    for path in reader.walk_files():
        contents = reader.extract_file(path)
        print(f"{path}: {len(contents)} bytes")
