"""TPU-native DEFLATE decoder: the device decode path.

DEFLATE decode is bit-serial — a symbol's bit length is unknown until the
symbol is decoded (reference inflate.nim:273-289), so the scalar loop cannot
be vectorized directly. This module implements the index-based parallel
decode the retrieved literature prescribes (PAPERS.md: rapidgzip,
"Massively-Parallel Lossless Data Decompression", GPU Huffman): a one-time
host scan (native inflate_scan) records a checkpoint every K tokens, then
the device decodes the stream in FIXED-SHAPE TILES:

1. Tiling — the host planner cuts the checkpoint list into tiles of fixed
   capacity (output bytes, segments, Huffman blocks, stored spans, stream
   words). Every tile runs the SAME compiled executable — two size configs
   cover every stream, so there is no per-stream-shape XLA compile stall
   (the round-2/3 design compiled a fresh multi-minute executable per
   (out_pad, nseg_pad, nblk, rounds) combination; see `warmup`). Tiles
   chain through a 32 KiB decoded-byte halo (the DEFLATE window bound,
   internal.nim:14), carried device-to-device so a multi-tile decode
   dispatches back-to-back with no host sync. Tile-local offsets are
   int32 by construction, so streams of any size decode on device.

2. Decode-table build — per-block canonical Huffman LUTs are built ON
   DEVICE from the 318 code lengths the index carries: canonical codes via
   rank-within-length, a scatter of (start<<9|sym) keys into 15-bit MSB
   code space, cummax forward-fill, and a static bit-reversal permutation
   into LSB window order.

3. Token extraction — every segment is a vector lane; each of the K steps
   decodes one symbol per lane with a full 15-bit LUT gather (no slow
   path). Length/distance extra bits fold into the same windowed read.

4. LZ resolution — tokens scatter their spans' metadata; per-byte source
   indices resolve through chained back-references by pointer doubling
   (S <- S[S]). Overlapping copies (dist < len) resolve in closed form
   src = span_start - dist + (offset mod dist), so doubling only hops
   across distinct tokens. Halo bytes are literal fixpoints, which bounds
   every chain inside one tile; the doubling trip count comes from the
   scanner's exact max-depth as a DYNAMIC fori_loop bound (one executable
   for any depth).

Integrity: the host scan walks every output byte anyway (copy-depth
tracking) and records the adler32 of the serial-decode output in the index;
every device decode re-computes the checksum of its own output ON DEVICE
(per-tile, combined on host) and raises ZippyError on mismatch. A corrupt
stream that slips past the scan's structural checks therefore cannot
return silent garbage — raw deflate included, where no container checksum
exists (VERDICT r3 item 2; reference raise-on-malformed contract,
inflate.nim:77-82). Container trailers add their own gate: gzip's crc32 is
computed per-tile on device and combined (never re-uploading the payload),
zlib's adler is the scan adler itself.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import native
from ..common import ZippyError
from . import checksums as cks

_U32 = jnp.uint32
_MASK15 = np.uint32(0x7FFF)

# Tokens-per-segment checkpoint spacing. Token extraction runs K sequential
# steps over nseg parallel lanes; the TPU is wide and latency-bound here, so
# small K / many lanes wins (measured on v5e: K=32 is ~4x faster than K=256
# on urls.10K-class streams). Index cost is 32 B per segment.
_EVERY = 32

HALO = 32768  # DEFLATE window: matches never reach further back


class TileConfig(NamedTuple):
    """Fixed per-tile capacities — one compiled executable per config."""

    tile_out: int   # decoded bytes per tile (power of two, adler-chunk mult)
    nseg: int       # segment lanes (each covers up to _EVERY tokens)
    nblk: int       # Huffman table slots
    nsto: int       # stored-span slots
    nwords: int     # compressed uint32 words visible to the tile


def _mk_cfg(tile_out: int, nseg: int, nblk: int, nsto: int) -> TileConfig:
    # Word budget: ~1.1x the output (DEFLATE rarely expands past ~1.03x;
    # stored spans read their bytes from the words too) + header slack.
    return TileConfig(tile_out, nseg, nblk, nsto,
                      (tile_out + tile_out // 8 + (1 << 16)) // 4)


# S covers streams up to ~2 MiB; L is the streaming tile. nseg assumes
# >= 2 bytes/token; denser (all-literal) regions simply cut tiles earlier —
# the planner cuts on WHICHEVER capacity fills first, so any stream fits.
CFG_S = _mk_cfg(1 << 18, 4096, 8, 64)
CFG_L = _mk_cfg(1 << 22, 65536, 64, 256)

# ---------------------------------------------------------------------------
# RFC 1951 constant tables (format-dictated)
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

# Per-symbol packed litlen entries, minus the code-length bits (added on
# device from the block's lens): bit5 literal flag, bits8-15 literal byte,
# bits16-24 length base, bits25-27 length extra count.
_LL_ENT = np.zeros(288, dtype=np.uint32)
_LL_ENT[:256] = (1 << 5) | (np.arange(256, dtype=np.uint32) << 8)
_LL_ENT[257:286] = (_LENGTH_BASE << 16) | (_LENGTH_EXTRA << 25)
# dist entries: bits5-8 extra count, bits16-30 base-1.
_D_ENT = (_DIST_EXTRA << 5) | ((_DIST_BASE - 1) << 16)


def _rev15(x: jnp.ndarray) -> jnp.ndarray:
    """Bit-reverse the low 15 bits (reverse 16, shift right one)."""
    x = ((x & 0x5555) << 1) | ((x >> 1) & 0x5555)
    x = ((x & 0x3333) << 2) | ((x >> 2) & 0x3333)
    x = ((x & 0x0F0F) << 4) | ((x >> 4) & 0x0F0F)
    x = ((x & 0x00FF) << 8) | ((x >> 8) & 0x00FF)
    return x >> 1


def _canonical_device(lens: jnp.ndarray) -> jnp.ndarray:
    """Canonical MSB-first codes for one block's code lengths, on device
    (RFC 1951 3.2.2; reference builds the same table scalar-serially,
    inflate.nim:24-66). lens int32[S] -> codes int32[S]."""
    oh = (lens[:, None] == jnp.arange(16, dtype=jnp.int32)[None, :])
    count = jnp.sum(oh.astype(jnp.int32), axis=0)  # [16], count[0] unused
    firsts = [jnp.int32(0), jnp.int32(0)]  # first_code for lengths 0,1
    for bits in range(2, 16):
        firsts.append((firsts[bits - 1] + count[bits - 1]) << 1)
    first = jnp.stack(firsts)  # [16]
    rank = (jnp.cumsum(oh.astype(jnp.int32), axis=0) - oh.astype(jnp.int32))
    rank_s = jnp.take_along_axis(rank, lens[:, None], axis=1)[:, 0]
    return first[lens] + rank_s


_REVPERM = _rev15(np.arange(1 << 15, dtype=np.int32))  # static permutation


def _lut_from_lens(lens: jnp.ndarray, ent_nolen: jnp.ndarray) -> jnp.ndarray:
    """32768-entry LSB-first decode LUT for one block's table.

    Canonical prefix codes partition 15-bit MSB code space into intervals
    [code<<(15-len), (code+1)<<(15-len)); scatter a monotone
    (start<<9 | sym) key at each interval start, cummax-fill forward, then
    permute into LSB window order with the static 15-bit reversal."""
    S = lens.shape[0]
    codes = _canonical_device(lens)
    start = codes << (15 - lens)
    # Invalid syms scatter out of bounds (mode="drop"); offset by arange so
    # the dropped indices stay distinct and the unique_indices promise holds.
    pos = jnp.where(lens > 0, start,
                    (1 << 20) + jnp.arange(S, dtype=jnp.int32))
    key = (start << 9) | jnp.arange(S, dtype=jnp.int32)
    filled = jax.lax.cummax(
        jnp.zeros(1 << 15, dtype=jnp.int32).at[pos].set(
            key, mode="drop", unique_indices=True))
    sym_msb = filled & 511
    sym_lsb = sym_msb[_REVPERM]
    ent = ent_nolen | lens.astype(jnp.uint32)
    return ent[jnp.clip(sym_lsb, 0, S - 1)]


def _build_luts(lens8: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-block (litlen, dist) LUTs [nblk, 32768] uint32 from the scanner's
    code-length records [nblk, 318] uint8, entirely on device."""
    lens = lens8.astype(jnp.int32)
    ll = jax.vmap(lambda l: _lut_from_lens(l, jnp.asarray(_LL_ENT)))(
        lens[:, :288])
    dd = jax.vmap(lambda l: _lut_from_lens(l, jnp.asarray(_D_ENT)))(
        lens[:, 288:318])
    return ll, dd


# ---------------------------------------------------------------------------
# The tile kernel: LUT build + token extraction + LZ resolution + checksums
# ---------------------------------------------------------------------------

def _read_window(words: jnp.ndarray, bitpos: jnp.ndarray) -> jnp.ndarray:
    """32 valid stream bits starting at each bit offset (LSB-first)."""
    i = (bitpos >> 5).astype(jnp.int32)
    sh = (bitpos & 31).astype(_U32)
    w0 = words[i]
    w1 = words[i + 1]
    hi = jnp.where(sh == 0, _U32(0), w1 << (_U32(32) - sh))
    return (w0 >> sh) | hi


def _extract(words, seg_bit, seg_block, seg_ntok, ll_luts, d_luts, k: int):
    """Decode up to k tokens per segment, all segments in parallel.

    Returns packed int32 [k, nseg]: bits16-24 out_len, low 16 bits are the
    literal byte (< 256) or dist+256; invalid slots (i >= ntok) are 0.
    """
    nseg = seg_bit.shape[0]
    # [k, nseg] layout: the per-step update writes one contiguous ROW
    # (a strided column update would materialize a copy of the whole array
    # every iteration).
    packed = jnp.zeros((k, nseg), dtype=jnp.int32)

    def step(i, carry):
        bit, packed = carry
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
        val = jnp.where(is_lit, (1 << 16) | lb,
                        (length << 16) | (dist + 256))
        packed = packed.at[i].set(jnp.where(active, val, 0))
        bit = jnp.where(active, nbit, bit)
        return bit, packed

    _, packed = jax.lax.fori_loop(
        0, k, step, (seg_bit.astype(jnp.int32), packed))
    return packed


def _resolve(packed, seg_out, words, sto_src, sto_out, sto_len, halo,
             nrounds, out_pad: int):
    """Materialize output bytes from extracted tokens + stored spans.

    Layout: positions [0, HALO) are the carried window (literal fixpoints
    valued from `halo`); tile output occupies [HALO, out_pad)."""
    out_len = (packed >> 16).T  # [nseg, k]
    low = (packed & 0xFFFF).T
    dists = jnp.where(low >= 256, low - 256, 0)
    litbyte = jnp.where(low < 256, low, 0)

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

    # Stored spans: bytes come straight from the (tile-local) source words.
    nsto = sto_out.shape[0]
    sid = jnp.clip(
        jnp.searchsorted(sto_out, j, side="right") - 1, 0, nsto - 1)
    in_sto = (j >= sto_out[sid]) & (j < sto_out[sid] + sto_len[sid])
    spos = (sto_src[sid] + (j - sto_out[sid])).astype(jnp.int32)
    sbyte = ((words[spos >> 2] >> ((spos & 3) * 8).astype(_U32))
             & 0xFF).astype(jnp.int32)

    in_halo = j < HALO
    is_literal = in_halo | in_sto | (dist_span == 0)
    # Overlapping copies (dist < len) resolve in closed form: byte at span
    # offset o reads span_start - d + (o mod d), which collapses the whole
    # intra-span chain (a dist-1 run of any length resolves in ZERO hops).
    # Remaining chains only hop across distinct tokens and terminate at the
    # halo (fixpoints), so they are tile-local.
    o = j - span_start
    d_safe = jnp.maximum(dist_span, 1)
    # minimum(src, j) guarantees every pointer is a fixpoint or strictly
    # decreasing, so doubling cannot cycle even on a corrupt index.
    src_ix = jnp.minimum(
        jnp.where(is_literal, j, span_start - dist_span + o % d_safe), j)
    src_ix = jnp.maximum(src_ix, 0)
    lit_val = jnp.where(
        in_halo, halo[jnp.minimum(j, HALO - 1)].astype(jnp.int32),
        jnp.where(in_sto, sbyte, lit_at[span_start])).astype(jnp.uint8)

    # Pointer doubling: S <- S[S] until every byte points at a literal.
    # Convergence is guaranteed — match bytes satisfy S[j] <= j (clamped),
    # literals are fixpoints — and chains halve per hop. The trip count is
    # a DYNAMIC fori_loop bound fed from the scanner's exact max depth
    # (XLA lowers it to an on-device counted While: one executable for any
    # depth, no host sync per iteration — unlike a data-dependent
    # convergence cond, which costs ~18 ms/iter on remote dispatch).
    src_ix = jax.lax.fori_loop(0, nrounds, lambda i, s: s[s], src_ix)
    return lit_val[src_ix]


# -- On-device checksum combining (GF(2) shift for crc, modular for adler) --

@functools.cache
def _shift_mats_np() -> np.ndarray:
    """shift8^(2^k) GF(2) matrices for k = 0..22 (tile lengths < 2^23)."""
    return np.stack([np.frombuffer(cks._shift_matrix_pow(k), dtype=np.uint32)
                     for k in range(23)])


def _gf2_apply(cols: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    out = jnp.uint32(0)
    for j in range(32):
        out = out ^ (((v >> jnp.uint32(j)) & jnp.uint32(1)) * cols[j])
    return out


def _crc_shift_device(v: jnp.ndarray, nbytes: jnp.ndarray) -> jnp.ndarray:
    """shift8^nbytes(v) on device: conditional square-multiply over the
    bits of nbytes (device twin of cks.crc_shift_register)."""
    mats = jnp.asarray(_shift_mats_np())

    def body(kk, acc):
        bit = (nbytes >> kk) & 1
        return jnp.where(bit == 1, _gf2_apply(mats[kk], acc), acc)

    return jax.lax.fori_loop(0, mats.shape[0], body, v)


def _combine_checksums(adler_acc, crc_acc, body_m, used):
    """Fold one tile's bytes into the running (adler32, crc32) accumulators
    entirely on device — no per-tile scalar fetch (remote dispatch round
    trips cost tens of ms under tenant contention)."""
    m = jnp.uint32(cks.ADLER_MOD)
    a = cks._adler32_padded(body_m, used.astype(jnp.uint32))
    s1a = adler_acc & jnp.uint32(0xFFFF)
    s2a = adler_acc >> jnp.uint32(16)
    s1b = a & jnp.uint32(0xFFFF)
    s2b = a >> jnp.uint32(16)
    rem = used.astype(jnp.uint32) % m
    s1 = (s1a + s1b + m - 1) % m
    s2 = (s2a % m + s2b % m + (rem * ((s1a + m - 1) % m)) % m) % m
    adler_new = (s2 << jnp.uint32(16)) | s1

    tile_out = body_m.shape[0]
    rolled = jnp.roll(body_m, tile_out - used)
    raw = cks._crc32_raw_words(cks._words_raw_crc(rolled))
    # crc(A||B) = shift^used(crc(A) ^ FFFF) ^ raw(B) ^ FFFF (raw-space form).
    crc_new = (_crc_shift_device(crc_acc ^ jnp.uint32(0xFFFFFFFF), used)
               ^ raw ^ jnp.uint32(0xFFFFFFFF))
    return (jnp.where(used > 0, adler_new, adler_acc),
            jnp.where(used > 0, crc_new, crc_acc))


def _buf_size(cfg: TileConfig) -> int:
    """uint32 words in the single packed per-tile upload buffer."""
    return (2 + cfg.nwords + 4 * cfg.nseg + 3 * cfg.nsto
            + (318 * cfg.nblk + 3) // 4)


@functools.partial(jax.jit, static_argnames=("k", "cfg", "mesh"))
def _decode_tile(pack, halo, adler_acc, crc_acc, *, k: int, cfg: TileConfig,
                 mesh=None):
    """One tile: device LUT build + extraction + LZ resolution + checksums.

    `pack` is ONE uint32 buffer carrying everything tile-local (one upload
    per tile): [used, nrounds, words, seg_pack 3xnseg, seg_out nseg,
    sto_pack 3xnsto, lens8 byte-packed]. Returns (out uint8[HALO+tile_out],
    halo_next uint8[HALO], adler_acc', crc_acc') with the checksum
    accumulators advanced over out[HALO:HALO+used].

    With `mesh`, the segment lane axis is sharding-constrained over the
    mesh's first axis: token extraction (a pure map over lanes) runs one
    shard per device and XLA inserts the collectives the global LZ
    resolution needs — N-device output is byte-identical to 1-device."""
    used = pack[0].astype(jnp.int32)
    nrounds = pack[1].astype(jnp.int32)
    off = 2
    words = pack[off : off + cfg.nwords]
    off += cfg.nwords
    seg_pack = pack[off : off + 3 * cfg.nseg].astype(jnp.int32).reshape(
        3, cfg.nseg)
    off += 3 * cfg.nseg
    seg_out = pack[off : off + cfg.nseg].astype(jnp.int32)
    off += cfg.nseg
    sto_pack = pack[off : off + 3 * cfg.nsto].astype(jnp.int32).reshape(
        3, cfg.nsto)
    off += 3 * cfg.nsto
    lw = (318 * cfg.nblk + 3) // 4
    lens_w = pack[off : off + lw]
    lens8 = ((lens_w[:, None] >> (jnp.uint32(8) * jnp.arange(
        4, dtype=jnp.uint32)[None, :])) & jnp.uint32(0xFF)).reshape(-1)[
        : 318 * cfg.nblk].astype(jnp.uint8).reshape(cfg.nblk, 318)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = mesh.axis_names[0]
        seg_pack = jax.lax.with_sharding_constraint(
            seg_pack, NamedSharding(mesh, P(None, axis)))
        seg_out = jax.lax.with_sharding_constraint(
            seg_out, NamedSharding(mesh, P(axis)))

    out_pad = HALO + cfg.tile_out
    ll_luts, d_luts = _build_luts(lens8)
    packed = _extract(words, seg_pack[0], seg_pack[1], seg_pack[2],
                      ll_luts, d_luts, k)
    out = _resolve(packed, seg_out, words, sto_pack[0], sto_pack[1],
                   sto_pack[2], halo, nrounds, out_pad)
    halo_next = jax.lax.dynamic_slice(out, (used,), (HALO,))
    # Tile checksums over out[HALO:HALO+used] (bytes past `used` are
    # unresolved garbage — mask before folding).
    body = out[HALO:]
    mask = jnp.arange(cfg.tile_out, dtype=jnp.int32) < used
    body_m = jnp.where(mask, body, jnp.uint8(0))
    adler_acc, crc_acc = _combine_checksums(adler_acc, crc_acc, body_m, used)
    return out, halo_next, adler_acc, crc_acc


# ---------------------------------------------------------------------------
# Host planner: cut the index into fixed-capacity tiles
# ---------------------------------------------------------------------------

class _Tile(NamedTuple):
    base: int          # absolute output offset of the tile's first byte
    used: int          # decoded bytes this tile
    w0: int            # absolute word offset of the tile's stream window
    s0: int            # segment range [s0, s1)
    s1: int
    t0: int            # stored-span range [t0, t1)
    t1: int
    b0: int            # block-id range [b0, b1)
    b1: int


def _plan_tiles(index, cfg: TileConfig) -> list[_Tile]:
    """Greedy fixed-capacity tiling of the checkpoint list.

    Entities (segments + stored spans) partition [0, total_out) contiguously
    in stream order; every capacity is monotone along that order, so each
    tile's end is a searchsorted over prefix arrays — O(tiles log n)."""
    seg = index["segments"]
    sto = index["stored"]
    sto = sto[sto[:, 2] > 0] if sto.shape[0] else sto  # len-0 spans: no output
    total = int(index["total_out"])
    end_bit = int(index["end_bit"])
    nseg, nsto = seg.shape[0], sto.shape[0]

    ent_out = np.concatenate([seg[:, 1], sto[:, 1]])
    order = np.argsort(ent_out, kind="stable")
    ent_out = ent_out[order]
    ent_is_seg = order < nseg
    ent_bit = np.concatenate([seg[:, 0], sto[:, 0] * 8])[order]
    n_e = ent_out.shape[0]
    if n_e == 0:
        return []
    ent_end_out = np.concatenate([ent_out[1:], [total]])
    ent_end_bit = np.concatenate([ent_bit[1:], [end_bit]])
    sto_end_bit = (sto[:, 0] + sto[:, 2]) * 8
    ent_end_bit = np.maximum(
        ent_end_bit,
        np.concatenate([np.zeros(nseg, np.int64), sto_end_bit])[order])
    # +2 words: _read_window reads words[i+1] at the last bit position.
    ent_word_end = (ent_end_bit + 31) // 32 + 2
    ent_blk = np.concatenate(
        [seg[:, 2], np.full(nsto, -1, np.int64)])[order]
    cum_seg = np.cumsum(ent_is_seg)
    cum_sto = np.cumsum(~ent_is_seg)
    # Running max block id (block ids are nondecreasing over segments but
    # stored entities interleave with -1).
    blk_ffill = np.maximum.accumulate(ent_blk)

    tiles = []
    i = 0
    base = 0
    while i < n_e:
        w0 = int(ent_bit[i] // 32)
        lo = i + 1  # a single entity always fits (extent <= 8256 or 65535)
        j = np.searchsorted(ent_end_out, base + cfg.tile_out, side="right")
        j = min(j, np.searchsorted(
            cum_seg, (cum_seg[i] - ent_is_seg[i]) + cfg.nseg, side="right"))
        j = min(j, np.searchsorted(
            cum_sto, (cum_sto[i] - (not ent_is_seg[i])) + cfg.nsto,
            side="right"))
        j = int(min(j, np.searchsorted(
            ent_word_end, w0 + cfg.nwords, side="right")))
        # Distinct blocks referenced so far: ids are contiguous nondecreasing.
        first_blk = int(ent_blk[i]) if ent_is_seg[i] else int(
            max(blk_ffill[i], 0))
        j = int(min(j, np.searchsorted(
            blk_ffill, first_blk + cfg.nblk - 1, side="right")))
        j = max(j, lo)
        s0 = int(cum_seg[i] - ent_is_seg[i])
        s1 = int(cum_seg[j - 1])
        t0 = int(cum_sto[i] - (not ent_is_seg[i]))
        t1 = int(cum_sto[j - 1])
        b1 = int(blk_ffill[j - 1]) + 1 if s1 > s0 else first_blk + 1
        used = int(ent_end_out[j - 1]) - base
        tiles.append(_Tile(base, used, w0, s0, s1, t0, t1, first_blk, b1))
        base += used
        i = j
    return tiles


def _pick_cfg(total_out: int) -> TileConfig:
    return CFG_S if total_out <= 8 * CFG_S.tile_out else CFG_L


def _nrounds(index, cfg: TileConfig) -> int:
    """Pointer-doubling trip count: exact log2 of the scanner's max copy
    nesting depth; the halo bounds any chain inside one tile, so the cap is
    log2(tokens per tile). Fed to the kernel as a DYNAMIC loop bound."""
    cap = int(np.ceil(np.log2(cfg.nseg * _EVERY)))
    depth = int(index.get("max_depth", 0))
    if depth >= 0xFFFF:  # scanner's u16 depth saturated
        return cap
    return max(1, min(cap, int(np.ceil(np.log2(max(depth, 2))))))


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------

def build_decode_index(data: bytes, start_bit: int = 0, every: int = _EVERY):
    """One-time host scan producing the device decode index for a raw
    DEFLATE stream (any producer — ours, zlib, zippy). The index carries
    the adler32 of the serial-decode output, which every device decode
    verifies its own output against."""
    return native.inflate_scan(data, start_bit, every)


def _tile_pack(data, index, tile: _Tile, cfg: TileConfig,
               nrounds: int) -> np.ndarray:
    """ONE packed uint32 upload buffer per tile (fixed size): scalars,
    stream words, segment/stored tables, byte-packed code lengths. A single
    transfer per tile instead of seven — remote-dispatch transfer round
    trips dominate small-stream latency on detached TPU runtimes."""
    seg = index["segments"]
    sto = index["stored"]
    sto = sto[sto[:, 2] > 0] if sto.shape[0] else sto
    out_pad = HALO + cfg.tile_out

    buf = np.zeros(_buf_size(cfg), dtype=np.uint32)
    buf[0] = tile.used
    buf[1] = nrounds
    off = 2

    lo = tile.w0 * 4
    hi = min(len(data), lo + cfg.nwords * 4)
    raw = bytes(data[lo:hi])
    nw = len(raw) // 4
    buf[off : off + nw] = np.frombuffer(raw[: nw * 4], "<u4")
    if len(raw) % 4:
        tail = raw[nw * 4 :] + b"\x00" * (4 - len(raw) % 4)
        buf[off + nw] = np.frombuffer(tail, "<u4")[0]
    off += cfg.nwords

    sp = buf[off : off + 3 * cfg.nseg].reshape(3, cfg.nseg)
    off += 3 * cfg.nseg
    so = buf[off : off + cfg.nseg]
    so[:] = out_pad
    off += cfg.nseg
    ns = tile.s1 - tile.s0
    if ns:
        rows = seg[tile.s0 : tile.s1]
        sp[0, :ns] = rows[:, 0] - tile.w0 * 32
        sp[1, :ns] = rows[:, 2] - tile.b0
        sp[2, :ns] = rows[:, 3]
        so[:ns] = rows[:, 1] - tile.base + HALO

    st = buf[off : off + 3 * cfg.nsto].reshape(3, cfg.nsto)
    off += 3 * cfg.nsto
    st[1] = out_pad  # empty slots sort past every output byte
    nt = tile.t1 - tile.t0
    if nt:
        rows = sto[tile.t0 : tile.t1]
        st[0, :nt] = rows[:, 0] - tile.w0 * 4
        st[1, :nt] = rows[:, 1] - tile.base + HALO
        st[2, :nt] = rows[:, 2]

    nb = tile.b1 - tile.b0
    if nb and index["block_lens"].shape[0]:
        lens8 = np.zeros((318 * cfg.nblk + 3) // 4 * 4, np.uint8)
        flat = index["block_lens"][tile.b0 : tile.b1].reshape(-1)
        lens8[: flat.shape[0]] = flat
        buf[off:] = lens8.view("<u4")
    return buf


def _run_tiles(data, index, mesh=None):
    """Dispatch every tile (async, device-chained halo + checksum
    accumulators). Returns (tiles, outs, adler_acc, crc_acc, cfg) with
    device arrays unfetched."""
    cfg = _pick_cfg(int(index["total_out"]))
    tiles = _plan_tiles(index, cfg)
    k = int(index["every"])
    nrounds = _nrounds(index, cfg)

    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P())

    halo = jnp.zeros(HALO, jnp.uint8)
    adler_acc = jnp.uint32(1)
    crc_acc = jnp.uint32(0)
    if sharding is not None:
        halo = jax.device_put(halo, sharding)
        adler_acc = jax.device_put(adler_acc, sharding)
        crc_acc = jax.device_put(crc_acc, sharding)
    outs = []
    for tile in tiles:
        pack = _tile_pack(data, index, tile, cfg, nrounds)
        pack_d = jnp.asarray(pack)
        if sharding is not None:
            pack_d = jax.device_put(pack_d, sharding)
        out, halo, adler_acc, crc_acc = _decode_tile(
            pack_d, halo, adler_acc, crc_acc, k=k, cfg=cfg, mesh=mesh)
        outs.append(out)
    return tiles, outs, adler_acc, crc_acc, cfg


def _verify_adler(index, adler_acc) -> None:
    if int(adler_acc) != int(index["adler"]):
        raise ZippyError(
            "Device decode verification failed (output checksum does not "
            "match the scan)")


def inflate_device(data: bytes, index=None, start_bit: int = 0,
                   mesh=None, verify: bool = True) -> bytes:
    """Decode a raw DEFLATE stream on the device. `index` is the result of
    build_decode_index (scanned on the fly when omitted).

    With `mesh` (a jax.sharding.Mesh), segment arrays shard over the mesh's
    first axis — token extraction is a pure map over segments, so it runs
    one shard per device with no communication; XLA inserts the collectives
    the global LZ-resolution gathers need. N-device output is byte-identical
    to 1-device (the multi-chip gate, SURVEY §4).

    verify=True (default) checks the device output's adler32 against the
    scan's serial-decode adler and raises ZippyError on mismatch — the raw
    deflate integrity gate (no container checksum exists to catch a
    divergent decode otherwise)."""
    if index is None:
        index = build_decode_index(data, start_bit)
    if int(index["total_out"]) == 0:
        return b""
    tiles, outs, adler_acc, crc_acc, cfg = _run_tiles(data, index, mesh)
    fetched = jax.device_get(outs)
    parts = [out[HALO : HALO + tile.used].tobytes()
             for tile, out in zip(tiles, fetched)]
    if verify:
        _verify_adler(index, adler_acc)
    return parts[0] if len(parts) == 1 else b"".join(parts)


@functools.partial(jax.jit, static_argnames=())
def _place_tile(buf, tile_out, base):
    return jax.lax.dynamic_update_slice(buf, tile_out[HALO:], (base,))


def inflate_device_array(data: bytes, index=None, start_bit: int = 0,
                         mesh=None, verify: bool = True):
    """Like inflate_device but returns (jax.Array uint8, total_out) without
    fetching the payload to host — the device-resident decode surface.
    The returned array is padded; the first total_out bytes are the data."""
    if index is None:
        index = build_decode_index(data, start_bit)
    total = int(index["total_out"])
    if total == 0:
        return None, 0
    tiles, outs, adler_acc, crc_acc, cfg = _run_tiles(data, index, mesh)
    if len(tiles) == 1:
        if verify:
            _verify_adler(index, adler_acc)
        return outs[0][HALO:], total
    # Each _place_tile writes a full cfg.tile_out-sized slice at tile.base;
    # capacity-cut tiles (nseg/nsto cuts) leave used < tile_out, so the
    # buffer must cover max(base) + tile_out — dynamic_update_slice CLAMPS
    # out-of-range starts, which would silently shift the last write
    # backwards over earlier tiles (ADVICE r4 high). Tiles are written in
    # stream order, so each tile's garbage tail is overwritten by the next
    # tile's full-width write; only the final tile's tail past `total`
    # remains padding.
    npad = 1 << int(np.ceil(np.log2(max(total, tiles[-1].base + cfg.tile_out))))
    buf = jnp.zeros(npad, jnp.uint8)
    for tile, out in zip(tiles, outs):
        buf = _place_tile(buf, out, jnp.int32(tile.base))
    if verify:
        _verify_adler(index, adler_acc)
    return buf, total


def uncompress_zlib_device(blob: bytes, index=None) -> bytes:
    """Decode one zlib stream on the device. The trailer adler32 is checked
    against the scan's output adler (host, free), and the device output is
    gated against the same value (reference zippy.nim:154-162 contract)."""
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
    tpos = (int(index["end_bit"]) + 7) // 8
    if tpos + 4 > len(blob):
        raise ZippyError("Invalid compressed data")
    want = int.from_bytes(blob[tpos : tpos + 4], "big")
    if int(index["adler"]) != want:
        raise ZippyError("Checksum verification failed")
    return inflate_device(blob, index, verify=True)


def uncompress_gzip_device(blob: bytes, index=None) -> bytes:
    """Decode one gzip member on the device. crc32 is accumulated per tile
    ON DEVICE (raw-space fold + GF(2) shift combine) and checked against
    the trailer — the payload is never re-uploaded for checksumming; ISIZE
    checked mod 2^32 (reference gzip.nim:80-88 contract)."""
    from .. import gzip_format

    hdr = gzip_format.parse_header(blob)
    p = hdr["data_offset"]
    if index is None:
        index = build_decode_index(blob, p * 8)
    tpos = (int(index["end_bit"]) + 7) // 8
    if tpos + 8 > len(blob):
        raise ZippyError("Invalid gzip data")
    want_crc = int.from_bytes(blob[tpos:tpos + 4], "little")
    want_isize = int.from_bytes(blob[tpos + 4:tpos + 8], "little")
    total = int(index["total_out"])
    if total == 0:
        payload = b""
        got_crc = 0
    else:
        tiles, outs, adler_acc, crc_acc, cfg = _run_tiles(blob, index)
        fetched = jax.device_get(outs)
        parts = [out[HALO : HALO + tile.used].tobytes()
                 for tile, out in zip(tiles, fetched)]
        _verify_adler(index, adler_acc)
        got_crc = int(crc_acc)
        payload = b"".join(parts)
    if got_crc != want_crc:
        raise ZippyError("Checksum verification failed")
    if want_isize != total & 0xFFFFFFFF:
        raise ZippyError("Size verification failed")
    return payload


def warmup(max_bytes: int = CFG_L.tile_out, levels=(), mesh=None) -> int:
    """Pre-compile the device decode executables (and optionally the encode
    pipeline for the given levels, via ops.deflate_device.warmup).

    The tiled decode needs exactly ONE executable per tile config — two
    cover every stream size — so after this call any decode of any length
    runs with zero XLA compile stalls (remote compiles on detached TPU
    runtimes cost 40 s – minutes per shape; round 2 measured 202 s for a
    single cold call). Returns the number of executables compiled."""
    n = 0
    cfgs = [CFG_S] + ([CFG_L] if max_bytes > 8 * CFG_S.tile_out else [])
    for cfg in cfgs:
        pack = np.zeros(_buf_size(cfg), np.uint32)
        pack[1] = 1  # nrounds
        halo = jnp.zeros(HALO, jnp.uint8)
        adler_acc = jnp.uint32(1)
        crc_acc = jnp.uint32(0)
        pack_d = jnp.asarray(pack)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            pack_d = jax.device_put(pack_d, rep)
            halo = jax.device_put(halo, rep)
            adler_acc = jax.device_put(adler_acc, rep)
            crc_acc = jax.device_put(crc_acc, rep)
        jax.block_until_ready(_decode_tile(
            pack_d, halo, adler_acc, crc_acc, k=_EVERY, cfg=cfg, mesh=mesh))
        n += 1
    if levels:
        from . import deflate_device

        n += deflate_device.warmup(levels=levels, mesh=mesh)
    return n
