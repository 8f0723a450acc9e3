"""gzip-over-HTTP server demo (reference examples/http_server.nim).

Serves gzip-compressed responses to clients that advertise gzip support.
Run: python examples/http_server.py  then  curl -H 'Accept-Encoding: gzip' \
     --compressed http://localhost:8080/
"""

import sys
import pathlib
from http.server import BaseHTTPRequestHandler, HTTPServer

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import zippy_tpu


class Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        body = b"gzip'ed response body"
        if "gzip" in self.headers.get("Accept-Encoding", ""):
            payload = zippy_tpu.compress(body, zippy_tpu.BestSpeed,
                                         zippy_tpu.dfGzip)
            self.send_response(200)
            self.send_header("Content-Encoding", "gzip")
        else:
            payload = b"uncompressed response body"
            self.send_response(200)
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


if __name__ == "__main__":
    HTTPServer(("", 8080), Handler).serve_forever()
