"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
xla_force_host_platform_device_count=8 per the project brief. Set
ZIPPY_TPU_TEST_REAL=1 to run against whatever real devices exist instead.
"""

import os

if not os.environ.get("ZIPPY_TPU_TEST_REAL"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # The axon sitecustomize force-sets jax_platforms="axon,cpu" at
    # interpreter start; the config value wins over the env var, so it must
    # be overridden at the same level.
    import jax

    jax.config.update("jax_platforms", "cpu")

import pathlib
import pytest

REFERENCE_DATA = pathlib.Path("/root/reference/tests/data")


@pytest.fixture(scope="session")
def corpus_dir() -> pathlib.Path:
    if not REFERENCE_DATA.is_dir():
        pytest.skip("reference corpus not available")
    return REFERENCE_DATA


CORPUS_FILES = [
    "alice29.txt", "asyoulik.txt", "fireworks.jpg", "geo.protodata",
    "html", "html_x_4", "kppkn.gtb", "lcet10.txt", "paper-100k.pdf",
    "plrabn12.txt", "urls.10K", "gzipfiletest.txt",
]

GOLD_GZ_PAIRS = [
    ("alice29.txt", "alice29.txt.gz"),
    ("asyoulik.txt", "asyoulik.txt.gz"),
    ("fireworks.jpg", "fireworks.jpg.gz"),
    ("geo.protodata", "geo.protodata.gz"),
    ("html", "html.gz"),
    ("html_x_4", "html_x_4.gz"),
    ("kppkn.gtb", "kppkn.gtb.gz"),
    ("lcet10.txt", "lcet10.txt.gz"),
    ("paper-100k.pdf", "paper-100k.pdf.gz"),
    ("plrabn12.txt", "plrabn12.txt.gz"),
    ("urls.10K", "urls.10K.gz"),
    ("gzipfiletest.txt", "gzipfiletest.txt.gz"),
    ("empty.gold", "empty.gz"),
    ("randtest1.gold", "randtest1.gz"),
    ("randtest2.gold", "randtest2.gz"),
    ("randtest3.gold", "randtest3.gz"),
    ("rfctest1.gold", "rfctest1.gz"),
    ("rfctest2.gold", "rfctest2.gz"),
    ("rfctest3.gold", "rfctest3.gz"),
    ("zerotest1.gold", "zerotest1.gz"),
    ("zerotest2.gold", "zerotest2.gz"),
    ("zerotest3.gold", "zerotest3.gz"),
]
