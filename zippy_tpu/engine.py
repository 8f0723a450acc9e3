"""Codec engine selection: native (host C++) vs device (TPU kernels).

The device engine owns large-input compression (block-parallel on the chip);
the native engine owns small inputs and the bit-serial inflate path. "auto"
picks per call.
"""

from __future__ import annotations

from . import native
from .common import ZippyError

# Routing rationale (measured, BENCH_DEVICE_r5.json): tunnel upload ~2 GB/s
# bulk with 0.1-100 ms per-dispatch latency (tenant-dependent), download
# ~0.02-0.04 GB/s; the native host codec runs at 20 GB/s (checksums) /
# 0.35-2 GB/s (codec). A host-resident buffer never wins by crossing the
# link — "auto" routes host bytes native at EVERY size and device-resident
# arrays to the chip. (The former DEVICE_MIN_BYTES threshold died with the
# retracted r2 device-checksum numbers.)

_ENGINES = ("auto", "native", "device")


def check_engine(engine: str) -> None:
    """Reject typo'd engine names instead of silently routing to native."""
    if engine not in _ENGINES:
        raise ZippyError(f"unknown engine {engine!r}; expected one of "
                         f"{_ENGINES}")

_device_available: bool | None = None


def device_available() -> bool:
    global _device_available
    if _device_available is None:
        try:
            import jax

            _device_available = len(jax.devices()) > 0
        except Exception:  # pragma: no cover
            _device_available = False
    return _device_available


def is_device_array(x) -> bool:
    """True for a jax.Array (device-resident buffer), False for host bytes
    and numpy arrays."""
    if type(x) in (bytes, bytearray, memoryview, str):
        return False
    try:
        import jax

        return isinstance(x, jax.Array)
    except Exception:  # pragma: no cover - jax always present here
        return False


def deflate(data, level: int, engine: str = "auto") -> bytes:
    """Raw DEFLATE encode via the chosen engine.

    "auto" routes by residency: a device-resident jax.Array runs the device
    pipeline with on-chip block slicing (no host bounce of the payload,
    ops/deflate_device.deflate_array); host bytes run the native engine —
    for host-resident buffers the host<->device link (~0.2 GB/s on this
    setup) dominates any on-chip win. engine="device" forces the device
    pipeline for host bytes too; zippy_tpu.parallel adds multi-chip.
    """
    check_engine(engine)
    if is_device_array(data):
        from .ops import deflate_device

        return deflate_device.deflate_array(data, level)
    if engine == "device":
        from .ops import deflate_device

        return deflate_device.deflate(data, level)
    return native.deflate(data, level)


def inflate(
    data: bytes,
    start_bit: int = 0,
    size_hint: int | None = None,
    engine: str = "auto",
) -> tuple[bytes, int]:
    """Raw DEFLATE decode. Returns (payload, end_bit).

    "auto" runs the native engine: single-stream inflate is bit-serial and
    the host decoder wins on host-resident buffers. engine="device" runs the
    index-based device-parallel decode (ops/inflate_device.py: one-time host
    boundary scan, then concurrent segment decode + pointer-doubling LZ) —
    for device-resident serving and repeated decodes of an indexed stream.
    """
    check_engine(engine)
    if engine == "device":
        from .ops import inflate_device

        index = inflate_device.build_decode_index(data, start_bit)
        return inflate_device.inflate_device(data, index), index["end_bit"]
    return native.inflate(data, start_bit, size_hint=size_hint)


def crc32(data, engine: str = "auto") -> int:
    """"auto" routes host bytes native at EVERY size: device crc runs
    1.9 GB/s + 2.1 GB/s upload vs native PCLMUL 20 GB/s (BENCH_DEVICE_r4),
    so there is no crossover — only device-resident arrays (or an explicit
    engine="device") dispatch to the chip."""
    check_engine(engine)
    if is_device_array(data) or engine == "device":
        from .ops import checksums

        return checksums.crc32_device(data)
    return native.crc32(data)


def adler32(data, engine: str = "auto") -> int:
    """Same routing rule as crc32: host bytes never auto-route to the chip
    (device adler 19.3 GB/s loses to native AVX2 20 GB/s once the upload is
    paid, and contended dispatch windows cost 65-137 ms)."""
    check_engine(engine)
    if is_device_array(data) or engine == "device":
        from .ops import checksums

        return checksums.adler32_device(data)
    return native.adler32(data)
