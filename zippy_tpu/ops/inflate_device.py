"""TPU-native DEFLATE decoder: the device decode path.

DEFLATE decode is bit-serial — a symbol's bit length is unknown until the
symbol is decoded (reference inflate.nim:273-289), so the scalar loop cannot
be vectorized directly. This module implements the index-based parallel
decode the retrieved literature prescribes (PAPERS.md: rapidgzip,
"Massively-Parallel Lossless Data Decompression", GPU Huffman): a one-time
host scan (native inflate_scan) records a checkpoint every K tokens, then
the device decodes ALL segments concurrently:

1. Token extraction — every segment is a vector lane; each of the K steps
   decodes one symbol per lane with a full 15-bit LUT gather (no slow path:
   the LUT covers every legal code length, 32K entries x 4 B per block).
   Length/distance extra bits are folded into the same windowed read.

2. LZ resolution — tokens scatter their output spans' metadata; per-byte
   source indices S[j] (j for literals, j - dist for match bytes) resolve
   through chained back-references by pointer doubling (S <- S[S]), which
   converges in O(log out_len) gather rounds no matter how deep copies nest
   (a dist-1 run of length L is an L-deep chain yet resolves in log2(L)
   rounds). Stored blocks read their bytes straight from the source words.

The bitstream itself stays standard RFC 1951 — the index is auxiliary, so
any gzip/zlib stream gains device decode after one host scan (the rapidgzip
usage model), and streams we produced can ship the index alongside.

Decode correctness is gated by the container checksum (crc32/adler32,
computed with ops.checksums on device): the device path assumes a
well-formed stream and lets the checksum reject corruption, mirroring the
reference's decode-then-verify contract (gzip.nim:80-88).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import native
from ..common import ZippyError

_U32 = jnp.uint32
_MASK15 = np.uint32(0x7FFF)

# ---------------------------------------------------------------------------
# Host: full 15-bit decode LUTs from code lengths
# ---------------------------------------------------------------------------

_LENGTH_BASE = np.array(
    [3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35, 43, 51, 59,
     67, 83, 99, 115, 131, 163, 195, 227, 258], dtype=np.uint32)
_LENGTH_EXTRA = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4,
     5, 5, 5, 5, 0], dtype=np.uint32)
_DIST_BASE = np.array(
    [1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193, 257, 385,
     513, 769, 1025, 1537, 2049, 3073, 4097, 6145, 8193, 12289, 16385,
     24577], dtype=np.uint32)
_DIST_EXTRA = np.array(
    [0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 10,
     10, 11, 11, 12, 12, 13, 13], dtype=np.uint32)


def _canonical_codes(lens: np.ndarray) -> np.ndarray:
    """Canonical MSB-first codes for the given code lengths (RFC 1951)."""
    codes = np.zeros(len(lens), dtype=np.uint32)
    code = 0
    count = np.bincount(lens, minlength=16)
    next_code = np.zeros(16, dtype=np.uint32)
    for l in range(1, 16):
        code = (code + count[l - 1]) << 1
        next_code[l] = code
    for sym, l in enumerate(lens):
        if l:
            codes[sym] = next_code[l]
            next_code[l] += 1
    return codes


def _reverse_bits(v: int, n: int) -> int:
    r = 0
    for _ in range(n):
        r = (r << 1) | (v & 1)
        v >>= 1
    return r


def _fill_lut(lens: np.ndarray, entries: np.ndarray) -> np.ndarray:
    """32768-entry LSB-first LUT: lut[window & 0x7FFF] = packed entry."""
    lut = np.zeros(1 << 15, dtype=np.uint32)
    codes = _canonical_codes(lens)
    for sym, l in enumerate(lens):
        if not l:
            continue
        rev = _reverse_bits(int(codes[sym]), int(l))
        lut[rev::1 << int(l)] = entries[sym]
    return lut


def build_decode_luts(block_lens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-block (litlen, dist) decode LUTs from scanner records [nblk, 318].

    litlen entry: bits0-4 code_len, bit5 literal flag, bits8-15 literal byte,
    bits16-24 length base, bits25-27 length extra count.
    dist entry: bits0-4 code_len, bits5-8 extra count, bits16-30 base-1.
    """
    nblk = block_lens.shape[0]
    ll_luts = np.zeros((nblk, 1 << 15), dtype=np.uint32)
    d_luts = np.zeros((nblk, 1 << 15), dtype=np.uint32)
    for b in range(nblk):
        ll = block_lens[b, :288].astype(np.int64)
        dd = block_lens[b, 288:318].astype(np.int64)
        ent = np.zeros(288, dtype=np.uint32)
        syms = np.arange(288)
        lit = syms < 256
        ent[lit] = ll[lit] | (1 << 5) | (syms[lit].astype(np.uint32) << 8)
        ent[256] = ll[256]  # EOB: never decoded (segments exclude it)
        lsyms = syms[(syms >= 257) & (syms <= 285)]
        li = lsyms - 257
        ent[lsyms] = (ll[lsyms]
                      | (_LENGTH_BASE[li] << 16) | (_LENGTH_EXTRA[li] << 25))
        ll_luts[b] = _fill_lut(ll, ent)
        dent = (dd | (_DIST_EXTRA << 5) | ((_DIST_BASE - 1) << 16))
        d_luts[b] = _fill_lut(dd, dent.astype(np.uint32))
    return ll_luts, d_luts


# ---------------------------------------------------------------------------
# Device: phase A — parallel token extraction
# ---------------------------------------------------------------------------

def _read_window(words: jnp.ndarray, bitpos: jnp.ndarray) -> jnp.ndarray:
    """32 valid stream bits starting at each bit offset (LSB-first)."""
    i = (bitpos >> 5).astype(jnp.int32)
    sh = (bitpos & 31).astype(_U32)
    w0 = words[i]
    w1 = words[i + 1]
    hi = jnp.where(sh == 0, _U32(0), w1 << (_U32(32) - sh))
    return (w0 >> sh) | hi


@functools.partial(jax.jit, static_argnames=("k",))
def extract_tokens(words, seg_bit, seg_block, seg_ntok, ll_luts, d_luts, *,
                   k: int):
    """Decode up to k tokens per segment, all segments in parallel.

    Returns (out_len, litbyte, dist) each [nseg, k] int32; invalid slots
    (i >= ntok) have out_len 0.
    """
    nseg = seg_bit.shape[0]
    # [k, nseg] layout: the per-step update writes one contiguous ROW
    # (a strided column update would materialize a copy of the whole array
    # every iteration).
    out_len = jnp.zeros((k, nseg), dtype=jnp.int32)
    litbyte = jnp.zeros((k, nseg), dtype=jnp.int32)
    dists = jnp.zeros((k, nseg), dtype=jnp.int32)

    def step(i, carry):
        bit, out_len, litbyte, dists = carry
        active = i < seg_ntok
        win = _read_window(words, bit)
        e = ll_luts[seg_block, (win & _MASK15).astype(jnp.int32)]
        cl = (e & 31).astype(_U32)
        is_lit = ((e >> 5) & 1).astype(jnp.bool_)
        lb = ((e >> 8) & 0xFF).astype(jnp.int32)
        lbase = ((e >> 16) & 0x1FF).astype(jnp.int32)
        lx = ((e >> 25) & 7).astype(_U32)
        length = lbase + ((win >> cl) & ((_U32(1) << lx) - 1)).astype(jnp.int32)
        bit2 = bit + (cl + lx).astype(jnp.int32)
        win2 = _read_window(words, bit2)
        de = d_luts[seg_block, (win2 & _MASK15).astype(jnp.int32)]
        dcl = (de & 31).astype(_U32)
        dx = ((de >> 5) & 15).astype(_U32)
        dbase = ((de >> 16) & _MASK15).astype(jnp.int32) + 1
        dist = dbase + ((win2 >> dcl) & ((_U32(1) << dx) - 1)).astype(jnp.int32)
        nbit = jnp.where(is_lit, bit + cl.astype(jnp.int32),
                         bit2 + (dcl + dx).astype(jnp.int32))
        olen = jnp.where(is_lit, 1, length)
        dd = jnp.where(is_lit, 0, dist)
        out_len = out_len.at[i].set(jnp.where(active, olen, 0))
        litbyte = litbyte.at[i].set(jnp.where(active & is_lit, lb, 0))
        dists = dists.at[i].set(jnp.where(active, dd, 0))
        bit = jnp.where(active, nbit, bit)
        return bit, out_len, litbyte, dists

    _, out_len, litbyte, dists = jax.lax.fori_loop(
        0, k, step, (seg_bit.astype(jnp.int32), out_len, litbyte, dists))
    return out_len.T, litbyte.T, dists.T


# ---------------------------------------------------------------------------
# Device: phase B — LZ resolution by pointer doubling
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("out_pad",))
def resolve_lz(out_len, litbyte, dists, seg_out, words, sto_src, sto_out,
               sto_len, *, out_pad: int):
    """Materialize output bytes from extracted tokens + stored spans."""
    # Token output start positions (exact: per-segment base from the index).
    starts = seg_out[:, None].astype(jnp.int32) + (
        jnp.cumsum(out_len, axis=1) - out_len)
    valid = out_len > 0
    flat_starts = jnp.where(valid, starts, out_pad).reshape(-1)
    flat_dist = dists.reshape(-1)
    flat_lit = litbyte.reshape(-1)

    # Per-byte span metadata via scatter + running max of span starts.
    # unique_indices: token start positions never collide (invalid slots
    # point at out_pad and are dropped), which lets XLA vectorize the
    # scatter instead of serializing it on the TPU.
    j = jnp.arange(out_pad, dtype=jnp.int32)
    span_at = jnp.zeros(out_pad, dtype=jnp.int32).at[flat_starts].set(
        flat_starts, mode="drop", unique_indices=True)
    span_start = jax.lax.cummax(span_at)
    dist_at = jnp.zeros(out_pad, dtype=jnp.int32).at[flat_starts].set(
        flat_dist, mode="drop", unique_indices=True)
    lit_at = jnp.zeros(out_pad, dtype=jnp.int32).at[flat_starts].set(
        flat_lit, mode="drop", unique_indices=True)
    dist_span = dist_at[span_start]

    # Stored spans: bytes come straight from the source stream.
    nsto = sto_out.shape[0]
    if nsto:
        sid = jnp.clip(
            jnp.searchsorted(sto_out, j, side="right") - 1, 0, nsto - 1)
        in_sto = (j >= sto_out[sid]) & (j < sto_out[sid] + sto_len[sid])
        spos = (sto_src[sid] + (j - sto_out[sid])).astype(jnp.int32)
        sbyte = ((words[spos >> 2] >> ((spos & 3) * 8).astype(_U32))
                 & 0xFF).astype(jnp.int32)
    else:
        in_sto = jnp.zeros(out_pad, dtype=jnp.bool_)
        sbyte = jnp.zeros(out_pad, dtype=jnp.int32)

    is_literal = in_sto | (dist_span == 0)
    src_ix = jnp.where(is_literal, j, j - dist_span)
    lit_val = jnp.where(in_sto, sbyte, lit_at[span_start]).astype(jnp.uint8)

    # Pointer doubling: S <- S[S] until every byte points at a literal.
    # Convergence is guaranteed — match bytes satisfy S[j] < j strictly
    # (the scan validated dist <= op), literals are fixpoints — and chains
    # halve per hop, so rounds = ceil(log2(max copy-nesting depth)).
    # Each round is one 4M-class random gather (the cost floor on TPU);
    # two hops per round halve the loop/convergence-check overhead.
    def cond(state):
        src_ix, done = state
        return ~done

    def body(state):
        src_ix, _ = state
        s2 = src_ix[src_ix]
        s4 = s2[s2]
        return s4, jnp.all(s4 == s2)

    src_ix, _ = jax.lax.while_loop(
        cond, body, (src_ix, jnp.array(False)))
    return lit_val[src_ix]


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------

def _pad_pow2(n: int, lo: int = 256) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


def build_decode_index(data: bytes, start_bit: int = 0, every: int = 256):
    """One-time host scan producing the device decode index for a raw
    DEFLATE stream (any producer — ours, zlib, zippy)."""
    return native.inflate_scan(data, start_bit, every)


def inflate_device(data: bytes, index=None, start_bit: int = 0,
                   mesh=None) -> bytes:
    """Decode a raw DEFLATE stream on the device. `index` is the result of
    build_decode_index (scanned on the fly when omitted).

    With `mesh` (a jax.sharding.Mesh), segment arrays shard over the mesh's
    first axis — token extraction is a pure map over segments, so it runs
    one shard per device with no communication; XLA inserts the collectives
    the global LZ-resolution gathers need. N-device output is byte-identical
    to 1-device (the multi-chip gate, SURVEY §4)."""
    if index is None:
        index = build_decode_index(data, start_bit)
    total_out = index["total_out"]
    # Device offsets are int32 (seg_bit, seg_out, src_ix): streams >= 2^31
    # bits (~256 MiB compressed) or >= 2 GiB out would silently wrap.
    if index["end_bit"] >= 2**31 - 64 or total_out >= 2**31 - 1:
        raise ZippyError(
            "Input too large for device decode (int32 offset range)")
    if total_out == 0:
        return b""
    seg = index["segments"]
    sto = index["stored"]
    k = int(index["every"])

    buf = np.frombuffer(data + b"\x00" * (12 - len(data) % 4), dtype=np.uint32)
    words = jnp.asarray(buf)

    nseg = seg.shape[0]
    out_pad = _pad_pow2(total_out)
    if nseg:
        lanes = max(8, mesh.devices.size if mesh is not None else 8)
        nseg_pad = _pad_pow2(nseg, lanes)
        seg_bit = np.zeros(nseg_pad, dtype=np.int32)
        seg_outv = np.zeros(nseg_pad, dtype=np.int32)
        seg_blk = np.zeros(nseg_pad, dtype=np.int32)
        seg_ntok = np.zeros(nseg_pad, dtype=np.int32)
        seg_bit[:nseg] = seg[:, 0]
        seg_outv[:nseg] = seg[:, 1]
        seg_blk[:nseg] = seg[:, 2]
        seg_ntok[:nseg] = seg[:, 3]
        ll_luts, d_luts = build_decode_luts(index["block_lens"])
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            shard = NamedSharding(mesh, P(axis))
            rep = NamedSharding(mesh, P())
            place_seg = lambda a: jax.device_put(jnp.asarray(a), shard)
            place_rep = lambda a: jax.device_put(jnp.asarray(a), rep)
        else:
            place_seg = place_rep = jnp.asarray
        out_len, litbyte, dists = extract_tokens(
            place_rep(words), place_seg(seg_bit), place_seg(seg_blk),
            place_seg(seg_ntok), place_rep(ll_luts), place_rep(d_luts),
            k=k)
        words = place_rep(words)
        seg_out_dev = place_seg(seg_outv)
    else:
        out_len = jnp.zeros((1, 1), dtype=jnp.int32)
        litbyte = jnp.zeros((1, 1), dtype=jnp.int32)
        dists = jnp.zeros((1, 1), dtype=jnp.int32)
        seg_out_dev = jnp.asarray(np.array([out_pad], dtype=np.int32))

    nsto = sto.shape[0]
    if nsto:
        nsto_pad = _pad_pow2(nsto, 4)
        sto_src = np.zeros(nsto_pad, dtype=np.int32)
        sto_out = np.full(nsto_pad, out_pad, dtype=np.int32)
        sto_len = np.zeros(nsto_pad, dtype=np.int32)
        sto_src[:nsto] = sto[:, 0]
        sto_out[:nsto] = sto[:, 1]
        sto_len[:nsto] = sto[:, 2]
        out = resolve_lz(out_len, litbyte, dists, seg_out_dev, words,
                         jnp.asarray(sto_src), jnp.asarray(sto_out),
                         jnp.asarray(sto_len), out_pad=out_pad)
    else:
        z = jnp.zeros((0,), dtype=jnp.int32)
        out = resolve_lz(out_len, litbyte, dists, seg_out_dev, words,
                         z, z, z, out_pad=out_pad)
    return bytes(np.asarray(out)[:total_out].tobytes())


def uncompress_zlib_device(blob: bytes, index=None) -> bytes:
    """Decode one zlib stream on the device; adler32 verified on device
    against the big-endian trailer (reference zippy.nim:154-162 contract)."""
    from . import checksums

    if len(blob) < 6:
        raise ZippyError("Invalid compressed data")
    cmf, flg = blob[0], blob[1]
    if (cmf & 0x0F) != 8:
        raise ZippyError("Unsupported compression method")
    if (cmf >> 4) > 7:
        raise ZippyError("Invalid compression info")
    if (cmf * 256 + flg) % 31 != 0:
        raise ZippyError("Invalid header")
    if flg & 0b0010_0000:
        raise ZippyError("Preset dictionary is not yet supported")
    if index is None:
        index = build_decode_index(blob, 16)
    payload = inflate_device(blob, index)
    tpos = (index["end_bit"] + 7) // 8
    if tpos + 4 > len(blob):
        raise ZippyError("Invalid compressed data")
    want = int.from_bytes(blob[tpos : tpos + 4], "big")
    if checksums.adler32_device(payload) != want:
        raise ZippyError("Checksum verification failed")
    return payload


def uncompress_gzip_device(blob: bytes, index=None) -> bytes:
    """Decode one gzip member on the device; crc32 verified on device
    (ops.checksums GF(2) fold) against the trailer, ISIZE checked mod 2^32
    (reference gzip.nim:80-88 contract)."""
    from .. import gzip_format
    from . import checksums

    hdr = gzip_format.parse_header(blob)
    p = hdr["data_offset"]
    if index is None:
        index = build_decode_index(blob, p * 8)
    payload = inflate_device(blob, index)
    tpos = (index["end_bit"] + 7) // 8
    if tpos + 8 > len(blob):
        raise ZippyError("Invalid gzip data")
    want_crc = int.from_bytes(blob[tpos:tpos + 4], "little")
    want_isize = int.from_bytes(blob[tpos + 4:tpos + 8], "little")
    if checksums.crc32_device(payload) != want_crc:
        raise ZippyError("Checksum verification failed")
    if want_isize != len(payload) & 0xFFFFFFFF:
        raise ZippyError("Size verification failed")
    return payload
