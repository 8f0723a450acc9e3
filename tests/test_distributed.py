"""Multi-process (2-rank) DCN layer test: parallel/distributed.py executed
for real under jax.distributed on the CPU backend.

The reference has no distributed layer (SURVEY §5); the gate here is ours:
compress_gzip_all_hosts must produce the IDENTICAL multi-member stream on
every rank, the stream must decode (CPython gzip ground truth) to the
concatenated shards, and the device-pipeline engine must compose (each
rank's member produced block-parallel over its local virtual chips).
"""

import os
import socket
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
rank = int(sys.argv[1])
jax.distributed.initialize(coordinator_address={coord!r},
                           num_processes=2, process_id=rank)
assert jax.process_count() == 2
from zippy_tpu.parallel import distributed

shards = [b"rank zero payload " * 4000, b"rank one payload! " * 3000]
stream_native = distributed.compress_gzip_all_hosts(shards[rank], level=6)
stream_device = distributed.compress_gzip_all_hosts(shards[rank], level=6,
                                                    engine="device")
out = {outdir!r} + f"/rank{{rank}}"
open(out + ".native", "wb").write(stream_native)
open(out + ".device", "wb").write(stream_device)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_allgather_compress():
    import gzip as gz

    with tempfile.TemporaryDirectory() as outdir:
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        # The port picked by _free_port can be stolen between close() and
        # jax.distributed.initialize; retry the whole 2-rank launch on a
        # fresh port if the coordinator fails to bind (ADVICE r2).
        for attempt in range(3):
            coord = f"localhost:{_free_port()}"
            script = _WORKER.format(repo=str(REPO), coord=coord,
                                    outdir=outdir)
            procs = [subprocess.Popen([sys.executable, "-c", script, str(r)],
                                      env=env, cwd=outdir,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE)
                     for r in range(2)]
            outs = [p.communicate(timeout=240) for p in procs]
            if all(p.returncode == 0 for p in procs):
                break
            bind_raced = any(b"Address already in use" in se or
                             b"Failed to bind" in se for _, se in outs)
            if not (bind_raced and attempt < 2):
                break
        # Whatever ended the retry loop, the workers must have exited clean
        # before their output files are read (ADVICE r3: an exhausted bind
        # race previously surfaced as an unrelated missing-file error).
        for p, (so, se) in zip(procs, outs):
            assert p.returncode == 0, se.decode()[-2000:]

        shards = [b"rank zero payload " * 4000, b"rank one payload! " * 3000]
        for engine in ("native", "device"):
            r0 = (Path(outdir) / f"rank0.{engine}").read_bytes()
            r1 = (Path(outdir) / f"rank1.{engine}").read_bytes()
            # identical stream on every rank
            assert r0 == r1
            # decodes to the concatenated payload (CPython ground truth)
            assert gz.decompress(r0) == shards[0] + shards[1]
            # and our own reader agrees
            import zippy_tpu

            assert zippy_tpu.uncompress(r0, zippy_tpu.dfGzip) == \
                shards[0] + shards[1]
