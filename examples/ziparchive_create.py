"""In-memory zip creation (reference examples/ziparchive_create.nim)."""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import zippy_tpu

entries = {
    "file.txt": "Hello, Zip!",
    "data/blob.json": "{}",
}
blob = zippy_tpu.create_zip_archive(entries)
pathlib.Path("example.zip").write_bytes(blob)
print(f"wrote example.zip ({len(blob)} bytes)")
