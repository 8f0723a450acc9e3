"""gzip-over-HTTP client demo (reference examples/http_client.nim)."""

import sys
import pathlib
import urllib.request

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import zippy_tpu

req = urllib.request.Request(
    sys.argv[1] if len(sys.argv) > 1 else "http://localhost:8080/",
    headers={"Accept-Encoding": "gzip"},
)
with urllib.request.urlopen(req) as resp:
    compressed = resp.read()
    if resp.headers.get("Content-Encoding") == "gzip":
        uncompressed = zippy_tpu.uncompress(compressed)
    else:
        uncompressed = compressed
print(f"compressed size: {len(compressed)} "
      f"uncompressed size: {len(uncompressed)}")
