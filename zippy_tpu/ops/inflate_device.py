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

2. Decode-table build — per-block COMPARISON tables are built ON DEVICE
   from the 318 code lengths the index carries: per-length first/count
   boundaries (Moffat canonical decode), rank offsets, and a rank->entry
   table; per-lane copies come off one one-hot MXU matmul per tile. XLA
   lowers per-element gathers at ~90 M/s on this hardware generation
   (BENCH_DEVICE_r4 gather_rate_probe), so the r2-r4 32K-entry LUT design
   — whose build did a 32K-element bit-reversal permutation per block and
   whose extract gathered the LUT twice per token — was gather-bound; this
   formulation decodes with NO table gathers at all.

3. Token extraction — every segment is a vector lane; each of the K steps
   decodes one symbol per lane: 3 window-word reads (the only gathers),
   then the code length via 14 range comparisons against the per-lane
   first+count boundaries ((rev15(win) >> (15-len)) - first[len] <
   count[len], branch-free as len = 1 + sum of exceedances), and the
   packed symbol entry via a one-hot reduce over the per-lane rank->entry
   row. Length/distance extra bits fold into the same 64-bit window.

4. LZ resolution — tokens scatter a packed (dist, literal) payload at
   their output start (ONE full-domain scatter); 9 shifted-select rounds
   forward-fill span starts + payloads (fill distance is bounded by the
   258-byte max span, and custom-combine associative_scan stalls the
   remote TPU compiler for minutes — see _ffill_span). Literal bytes are fixpoints and
   cost nothing further. Match bytes COMPACT into a tile_out/2-capacity
   buffer (the planner cuts tiles on the scan's per-segment match-byte
   counts, so the capacity is guaranteed): compact-domain spans come from
   a token-level scatter + scan, chains resolve by pointer doubling over
   the COMPACT set only (S <- S[S]), and resolved literal values scatter
   back once. Overlapping copies (dist < len) resolve in closed form
   src = span_start - dist + (offset mod dist), so doubling only hops
   across distinct tokens. Halo bytes are literal fixpoints, which bounds
   every chain inside one tile; each tile's doubling trip count comes
   from the scanner's exact PER-SEGMENT max depth as a DYNAMIC fori_loop
   bound (one executable for any depth). Stored spans copy via per-span
   masked dynamic slices (no per-byte gather).

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
    ncmp: int       # compact match-byte slots (LZ resolve runs over these)


def _mk_cfg(tile_out: int, nseg: int, nblk: int, nsto: int) -> TileConfig:
    # Word budget: ~1.1x the output (DEFLATE rarely expands past ~1.03x;
    # stored spans read their bytes from the words too) + header slack.
    # Compact capacity tile_out/2: pointer-doubling rounds cost per COMPACT
    # slot, and literals (the majority of bytes on most streams) never
    # enter the compact set; match-heavier tiles simply cut earlier on the
    # scan's per-segment match-byte counts.
    return TileConfig(tile_out, nseg, nblk, nsto,
                      (tile_out + tile_out // 8 + (1 << 16)) // 4,
                      tile_out // 2)


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


def _cmp_tables(lens: jnp.ndarray, ent_nolen: jnp.ndarray):
    """Per-block comparison-decode tables from code lengths [nblk, S]:
    fc[nblk,16] = first_code + count per length (the Moffat range
    boundaries), off[nblk,16] = rank_base - first_code, and E[nblk,S] =
    packed entry (ent | len) of the symbol at each canonical rank."""
    nblk, S = lens.shape
    Ls = jnp.arange(16, dtype=jnp.int32)
    oh = lens[:, :, None] == Ls[None, None, :]  # [nblk, S, 16]
    count = jnp.sum(oh.astype(jnp.int32), axis=1)  # [nblk, 16]
    firsts = [jnp.zeros(nblk, jnp.int32), jnp.zeros(nblk, jnp.int32)]
    for bits in range(2, 16):
        firsts.append((firsts[bits - 1] + count[:, bits - 1]) << 1)
    first = jnp.stack(firsts, axis=1)  # [nblk, 16]
    fc = first + count
    cnt_a = count.at[:, 0].set(0)  # length-0 = absent symbols
    sym_base = jnp.cumsum(cnt_a, axis=1) - cnt_a  # ranks with shorter codes
    off = sym_base - first
    # Canonical rank of each symbol: sym_base[len] + rank-within-length.
    rank_in = (jnp.cumsum(oh.astype(jnp.int32), axis=1)
               - oh.astype(jnp.int32))
    rank_l = jnp.take_along_axis(rank_in, lens[:, :, None], axis=2)[:, :, 0]
    base_l = jnp.take_along_axis(sym_base, lens, axis=1)
    rank_sym = base_l + rank_l
    ent = (ent_nolen[None, :].astype(jnp.uint32)
           | lens.astype(jnp.uint32)).astype(jnp.int32)
    # Absent symbols scatter out of bounds (distinct, mode="drop").
    pos = jnp.where(lens > 0, rank_sym,
                    S + jnp.arange(S, dtype=jnp.int32)[None, :])
    b_ix = jnp.broadcast_to(
        jnp.arange(nblk, dtype=jnp.int32)[:, None], (nblk, S))
    E = jnp.zeros((nblk, S), jnp.int32).at[b_ix, pos].set(
        ent, mode="drop", unique_indices=True)
    return fc, off, E


def _lane_rows(onehot_b, tbl):
    """Select per-lane table rows WITHOUT a gather: one-hot [nseg, nblk]
    f32 matmul (MXU) against the per-block table, split into 16-bit halves
    so every value stays exactly representable through the matmul
    (HIGHEST-precision f32 error << 0.5 for 16-bit magnitudes; round
    recovers the integer). Row gathers measure ~52 M elements/s on this
    chip (BENCH_DEVICE_r4 gather_rate_probe); the matmul is effectively
    free. Values may be negative (off rows): split the value + 2^17 bias
    so both halves are non-negative, and un-bias after."""
    bt = tbl + (1 << 17)
    hi = (bt >> 16).astype(jnp.float32)
    lo = (bt & 0xFFFF).astype(jnp.float32)
    mm = lambda t: jnp.round(
        jax.lax.dot(onehot_b, t,
                    precision=jax.lax.Precision.HIGHEST)).astype(jnp.int32)
    return ((mm(hi) << 16) | mm(lo)) - (1 << 17)


def _build_lane_tables(lens8: jnp.ndarray, seg_block: jnp.ndarray):
    """Per-LANE decode tables [nseg, ...] from the scanner's code-length
    records [nblk, 318], entirely on device and gather-free."""
    lens = lens8.astype(jnp.int32)
    fc_l, off_l, E_l = _cmp_tables(lens[:, :288], jnp.asarray(_LL_ENT))
    fc_d, off_d, E_d = _cmp_tables(lens[:, 288:318], jnp.asarray(_D_ENT))
    nblk = lens.shape[0]
    onehot_b = (seg_block[:, None] == jnp.arange(nblk, dtype=jnp.int32)
                [None, :]).astype(jnp.float32)
    return tuple(_lane_rows(onehot_b, t)
                 for t in (fc_l, off_l, E_l, fc_d, off_d, E_d))


# ---------------------------------------------------------------------------
# The tile kernel: LUT build + token extraction + LZ resolution + checksums
# ---------------------------------------------------------------------------

def _cmp_decode(r, fc, off, E):
    """One comparison-based canonical-Huffman decode across all lanes.
    `r` is the bit-reversed 15-bit window (MSB-first code space, int32);
    fc/off/E are the per-lane tables. Returns (entry int32, len int32).

    Canonical codes put every length-L' > L code's L-bit prefix at or above
    first[L]+count[L], and every length-<=L code below it, so the true
    length is 1 + the number of exceeded boundaries — 14 compares, no
    gather, no branch (Moffat's one-shift decode, vectorized)."""
    S = E.shape[1]
    Ls = jnp.arange(1, 15, dtype=jnp.int32)
    exceeded = (r[:, None] >> (15 - Ls)[None, :]) >= fc[:, 1:15]
    cl = 1 + jnp.sum(exceeded.astype(jnp.int32), axis=1)  # [nseg] in 1..15
    code = r >> (15 - cl)
    len_oh = cl[:, None] == jnp.arange(16, dtype=jnp.int32)[None, :]
    off_sel = jnp.sum(jnp.where(len_oh, off, 0), axis=1)
    rank = code + off_sel
    rank_oh = rank[:, None] == jnp.arange(S, dtype=jnp.int32)[None, :]
    e = jnp.sum(jnp.where(rank_oh, E, 0), axis=1)
    return e, cl


def _extract(words, seg_bit, seg_ntok, tabs, k: int):
    """Decode up to k tokens per segment, all segments in parallel.

    Returns packed int32 [k, nseg]: bits16-24 out_len, low 16 bits are the
    literal byte (< 256) or dist+256; invalid slots (i >= ntok) are 0.
    The ONLY gathers are the 3 window-word reads per step (64 valid bits
    cover litlen code+extra+dist code+extra, max 48); symbol decode is
    pure comparisons + one-hot reduces over the per-lane tables.
    """
    nseg = seg_bit.shape[0]
    fc_l, off_l, E_l, fc_d, off_d, E_d = tabs
    # Half-shifted word view: words16[i] carries bits [32i+16, 32i+48), so
    # any bit offset needs only TWO gathered words (sub-shift <= 15 after
    # selecting words vs words16), giving 64-sub >= 49 valid bits — enough
    # for a token's worst case 48 (litlen code+extra+dist code+extra).
    # The naive read needed 3 gathers/step; gathers are the extract's
    # entire cost, so this is a 33% cut for one elementwise prepass.
    nw = words.shape[0]
    words16 = (words >> _U32(16)) | (
        jnp.concatenate([words[1:], jnp.zeros(1, _U32)]) << _U32(16))
    wboth = jnp.concatenate([words, words16])
    # [k, nseg] layout: the per-step update writes one contiguous ROW
    # (a strided column update would materialize a copy of the whole array
    # every iteration).
    packed = jnp.zeros((k, nseg), dtype=jnp.int32)

    def step(i, carry):
        bit, packed = carry
        active = i < seg_ntok
        iw = bit >> 5
        sh = (bit & 31).astype(_U32)
        hi_half = (sh >= 16).astype(jnp.int32)
        base = iw + hi_half * nw
        sh = sh - _U32(16) * hi_half.astype(_U32)  # now <= 15
        w0 = wboth[base]
        w1 = wboth[base + 1]
        nsh = _U32(32) - sh
        lo = (w0 >> sh) | jnp.where(sh == 0, _U32(0), w1 << nsh)
        hi = w1 >> sh  # valid bits [32, 64-sh) >= 48: covers the token
        r = _rev15(lo & _MASK15).astype(jnp.int32)
        e, cl = _cmp_decode(r, fc_l, off_l, E_l)
        is_lit = ((e >> 5) & 1).astype(jnp.bool_)
        lb = (e >> 8) & 0xFF
        lbase = (e >> 16) & 0x1FF
        lx = ((e >> 25) & 7).astype(_U32)
        clu = cl.astype(_U32)
        length = lbase + ((lo >> clu) & ((_U32(1) << lx) - 1)).astype(
            jnp.int32)
        sh2 = clu + lx  # >= 1 (cl >= 1), <= 20: dist code starts in-window
        lo2 = (lo >> sh2) | (hi << (_U32(32) - sh2))
        r2 = _rev15(lo2 & _MASK15).astype(jnp.int32)
        de, dcl = _cmp_decode(r2, fc_d, off_d, E_d)
        dx = ((de >> 5) & 15).astype(_U32)
        dbase = ((de >> 16) & 0x7FFF) + 1
        dist = dbase + ((lo2 >> dcl.astype(_U32))
                        & ((_U32(1) << dx) - 1)).astype(jnp.int32)
        nbit = jnp.where(is_lit, bit + cl,
                         bit + (sh2 + dcl.astype(_U32) + dx).astype(jnp.int32))
        val = jnp.where(is_lit, (1 << 16) | lb,
                        (length << 16) | (dist + 256))
        packed = packed.at[i].set(jnp.where(active, val, 0))
        bit = jnp.where(active, nbit, bit)
        return bit, packed

    _, packed = jax.lax.fori_loop(
        0, k, step, (seg_bit.astype(jnp.int32), packed))
    return packed


_STO_MAX = 1 << 16  # a stored span's LEN field is 16-bit


def _ffill_span(*arrays):
    """Forward-fill (last-set wins) arrays whose set positions are never
    more than 511 apart from the positions that need them: 9 rounds of
    shifted selects (static pad+slice, no gather, no custom-combine
    associative_scan — which the detached-TPU backend compiler chews on
    for MINUTES even standalone). arrays[0] doubles as the set flag
    (nonzero = set). DEFLATE guarantees the bound: a token's payload only
    needs to reach its own span's bytes, and spans are <= 258 bytes;
    bytes further from any token start (stored spans, tile padding) are
    masked by their own flags downstream."""
    outs = list(arrays)
    for s in (1, 2, 4, 8, 16, 32, 64, 128, 256):
        flag = outs[0] != 0
        outs = [jnp.where(flag, o,
                          jnp.concatenate([jnp.zeros(s, o.dtype), o[:-s]]))
                for o in outs]
    return outs


def _resolve(packed, seg_out, words, sto_src, sto_out, sto_len, halo,
             nrounds, cfg: TileConfig):
    """Materialize output bytes from extracted tokens + stored spans.

    Layout: positions [0, HALO) are the carried window (literal fixpoints
    valued from `halo`); tile output occupies [HALO, out_pad).

    Gather discipline (gathers lower at ~90 M/s on this chip — they ARE
    the cost model): one token-level scatter fills per-byte span metadata
    (log-depth pair scan, no gather); literal bytes finish there (a
    literal token is 1 byte, so its scattered payload sits AT its byte);
    stored spans copy via per-span masked dynamic slices; only MATCH bytes
    — compacted into the cfg.ncmp-slot buffer the planner sized from the
    scan's per-segment match counts — pay pointer-doubling gathers, one
    per compact slot per round, plus one value gather and one scatter-back.
    """
    out_pad = HALO + cfg.tile_out
    C = cfg.ncmp
    out_len = (packed >> 16).T  # [nseg, k]
    low = (packed & 0xFFFF).T
    is_mt = low >= 256
    dists = jnp.where(is_mt, low - 256, 0)
    litbyte = jnp.where(is_mt, 0, low)

    # Token output start positions (exact: per-segment base from the index).
    starts = seg_out[:, None].astype(jnp.int32) + (
        jnp.cumsum(out_len, axis=1) - out_len)
    valid = out_len > 0
    flat_starts = jnp.where(valid, starts, out_pad).reshape(-1)
    flat_dist = dists.reshape(-1)
    flat_lit = litbyte.reshape(-1)
    flat_mlen = jnp.where(is_mt & valid, out_len, 0).reshape(-1)

    j = jnp.arange(out_pad, dtype=jnp.int32)
    # ONE full-domain token scatter: packed (dist << 9 | lit << 1 | 1)
    # payload at each token's first output byte (token starts never
    # collide; invalid slots point at out_pad and are dropped, which keeps
    # the unique_indices promise and lets XLA vectorize the scatter).
    # A log-depth pair scan forward-fills (span_start, payload).
    payload = (flat_dist << 9) | (flat_lit << 1) | 1
    pay_at = jnp.zeros(out_pad, dtype=jnp.int32).at[flat_starts].set(
        payload, mode="drop", unique_indices=True)
    pay, span_start = _ffill_span(pay_at, jnp.where(pay_at != 0, j, 0))
    dist_span = pay >> 9
    lit_at = (pay >> 1) & 0xFF

    # Literal-token bytes are 1-byte spans: the scattered payload sits AT
    # the byte itself, so lit_at needs no span_start gather. Halo bytes
    # are the carried window (plain concatenation, not a gather).
    lit_base = jnp.concatenate([halo.astype(jnp.int32), lit_at[HALO:]])

    # Stored spans: per-span masked copy via dynamic slices (a span is
    # contiguous in both the source words and the output, so no per-byte
    # gather). Empty slots carry sto_out = out_pad and write nothing.
    bytes_full = ((words[:, None] >> (_U32(8) * jnp.arange(
        4, dtype=_U32)[None, :])) & _U32(0xFF)).astype(jnp.int32).reshape(-1)
    bpad = jnp.concatenate(
        [bytes_full, jnp.zeros(_STO_MAX, jnp.int32)])
    lb_pad = jnp.concatenate([lit_base, jnp.zeros(_STO_MAX, jnp.int32)])
    sm_pad = jnp.zeros(out_pad + _STO_MAX, jnp.int32)
    iota_sto = jnp.arange(_STO_MAX, dtype=jnp.int32)

    def sbody(s, carry):
        lbp, smp = carry
        ln = sto_len[s]
        src0 = jnp.clip(sto_src[s], 0, bpad.shape[0] - _STO_MAX)
        o0 = jnp.clip(sto_out[s], 0, out_pad)
        chunk = jax.lax.dynamic_slice(bpad, (src0,), (_STO_MAX,))
        m = iota_sto < ln
        cur = jax.lax.dynamic_slice(lbp, (o0,), (_STO_MAX,))
        lbp = jax.lax.dynamic_update_slice(
            lbp, jnp.where(m, chunk, cur), (o0,))
        curm = jax.lax.dynamic_slice(smp, (o0,), (_STO_MAX,))
        smp = jax.lax.dynamic_update_slice(
            smp, jnp.where(m, 1, curm), (o0,))
        return lbp, smp

    lb_pad, sm_pad = jax.lax.fori_loop(
        0, sto_len.shape[0], sbody, (lb_pad, sm_pad))
    lit_base = lb_pad[:out_pad]
    in_sto = sm_pad[:out_pad] > 0

    # Match-byte compaction. Full-domain compact index (cumsum, no gather)
    # is consistent with the token-level compact bases: tokens partition
    # the content range contiguously in output order, so byte i of match
    # token t sits at compact slot cb[t] + i. (Payload fill bleeds past
    # the LAST token into the tile's padding; those phantom slots sort
    # after every real match byte and are masked by total_m below.)
    is_m = (dist_span > 0) & ~in_sto & (j >= HALO)
    cidx = jnp.cumsum(is_m.astype(jnp.int32)) - 1
    pfull = jnp.where(is_m, cidx, -(j + 1))

    cb = jnp.cumsum(flat_mlen) - flat_mlen
    total_m = jnp.sum(flat_mlen)
    cpos = jnp.where(flat_mlen > 0, cb, C)
    fs_at = jnp.zeros(C, jnp.int32).at[cpos].set(
        flat_starts, mode="drop", unique_indices=True)
    d_at = jnp.zeros(C, jnp.int32).at[cpos].set(
        flat_dist, mode="drop", unique_indices=True)
    ii = jnp.arange(C, dtype=jnp.int32)
    fs_f, cb_f, d_f = _ffill_span(
        fs_at, jnp.where(fs_at != 0, ii, 0), d_at)

    # Overlapping copies (dist < len) resolve in closed form: byte at span
    # offset o reads span_start - d + (o mod d), which collapses the whole
    # intra-span chain (a dist-1 run of any length resolves in ZERO hops).
    # Remaining chains only hop across distinct tokens and terminate at
    # literals/halo/stored bytes (fixpoints), so they are tile-local.
    o = ii - cb_f
    d_safe = jnp.maximum(d_f, 1)
    f_i = fs_f + o  # full position of compact byte i
    # clip(t, 0, f_i - 1 at most): real targets are strictly earlier bytes
    # (d >= 1, o mod d < d), so chains strictly decrease and cannot cycle
    # even on a corrupt index (the adler gate catches wrong bytes).
    t = jnp.clip(fs_f - d_f + o % d_safe, 0, out_pad - 1)
    p = pfull[t]

    # Pointer doubling over the COMPACT set: p < 0 encodes a resolved
    # literal source -(pos+1); p >= 0 points at the compact slot of the
    # next unresolved hop. The trip count is a DYNAMIC fori_loop bound fed
    # from the scanner's exact max depth (an on-device counted While: one
    # executable for any depth, no host sync per iteration — unlike a
    # data-dependent convergence cond at ~18 ms/iter on remote dispatch).
    def rnd(_, p):
        return jnp.where(p < 0, p, p[jnp.clip(p, 0, C - 1)])

    p = jax.lax.fori_loop(0, nrounds, rnd, p)
    res = jnp.clip(-p - 1, 0, out_pad - 1)
    vals = lit_base[res]
    fpos = jnp.where((ii < total_m) & (fs_f > 0),
                     jnp.clip(f_i, 0, out_pad), out_pad)
    out = lit_base.at[fpos].set(vals, mode="drop", unique_indices=True)
    return out.astype(jnp.uint8)


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

    tabs = _build_lane_tables(lens8, seg_pack[1])
    packed = _extract(words, seg_pack[0], seg_pack[2], tabs, k)
    out = _resolve(packed, seg_out, words, sto_pack[0], sto_pack[1],
                   sto_pack[2], halo, nrounds, cfg)
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
    depth: int         # max copy-nesting depth among the tile's segments


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
    # +3 words: the 64-bit window read touches words[i+2] at the last bit.
    ent_word_end = (ent_end_bit + 31) // 32 + 3
    ent_blk = np.concatenate(
        [seg[:, 2], np.full(nsto, -1, np.int64)])[order]
    # Match-byte capacity: the compact LZ-resolve buffer holds cfg.ncmp
    # slots; the scan's per-segment match-byte counts bound each tile.
    ent_match = np.concatenate([seg[:, 4], np.zeros(nsto, np.int64)])[order]
    cum_match = np.cumsum(ent_match)
    # Per-tile depth: each tile sizes its own pointer-doubling trip count
    # from the deepest chain it contains (the halo truncates cross-tile
    # chains, so the stream-global max is a loose overestimate for most
    # tiles). Stored entities contribute depth 0.
    ent_depth = np.concatenate([seg[:, 5], np.zeros(nsto, np.int64)])[order] \
        if seg.shape[1] > 5 else np.full(n_e, int(1) << 62, np.int64)
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
        j = int(min(j, np.searchsorted(
            cum_match, (cum_match[i] - ent_match[i]) + cfg.ncmp,
            side="right")))
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
        depth = int(ent_depth[i:j].max()) if j > i else 0
        tiles.append(_Tile(base, used, w0, s0, s1, t0, t1, first_blk, b1,
                           depth))
        base += used
        i = j
    return tiles


def _pick_cfg(total_out: int) -> TileConfig:
    return CFG_S if total_out <= 8 * CFG_S.tile_out else CFG_L


def _nrounds_for_depth(depth: int, cfg: TileConfig) -> int:
    """Pointer-doubling trip count for one tile: exact log2 of the deepest
    chain it contains; the halo bounds any chain inside one tile, so the
    cap is log2(tokens per tile). Fed to the kernel as a DYNAMIC loop
    bound (same executable for any depth)."""
    cap = int(np.ceil(np.log2(cfg.nseg * _EVERY)))
    if depth >= 0xFFFF:  # scanner's u16 depth saturated
        return cap
    return max(1, min(cap, int(np.ceil(np.log2(max(depth, 2))))))


def _nrounds(index, cfg: TileConfig) -> int:
    """Stream-global trip count (kept for probes/benches; the decode path
    uses the per-tile depth from _plan_tiles)."""
    return _nrounds_for_depth(int(index.get("max_depth", 0)), cfg)


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
        pack = _tile_pack(data, index, tile, cfg,
                          _nrounds_for_depth(tile.depth, cfg))
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


def inflate_device_array_acc(data: bytes, index=None, start_bit: int = 0,
                             mesh=None):
    """Like inflate_device_array(verify=False) but ALSO returns the
    device-resident (adler, crc) accumulators, so multi-member callers can
    dispatch every member back-to-back and batch the verification fetches
    at the end (each scalar fetch is a host round trip — tens of ms under
    tenant contention). Returns (arr, total, adler_acc, crc_acc)."""
    if index is None:
        index = build_decode_index(data, start_bit)
    total = int(index["total_out"])
    if total == 0:
        return None, 0, jnp.uint32(1), jnp.uint32(0)
    tiles, outs, adler_acc, crc_acc, cfg = _run_tiles(data, index, mesh)
    if len(tiles) == 1:
        return outs[0][HALO:], total, adler_acc, crc_acc
    # Each _place_tile writes a full cfg.tile_out-sized slice at tile.base;
    # capacity-cut tiles (nseg/nsto/match cuts) leave used < tile_out, so
    # the buffer must cover max(base) + tile_out — dynamic_update_slice
    # CLAMPS out-of-range starts, which would silently shift the last
    # write backwards over earlier tiles (ADVICE r4 high). Tiles are
    # written in stream order, so each tile's garbage tail is overwritten
    # by the next tile's full-width write; only the final tile's tail past
    # `total` remains padding.
    npad = 1 << int(np.ceil(np.log2(max(total, tiles[-1].base + cfg.tile_out))))
    buf = jnp.zeros(npad, jnp.uint8)
    for tile, out in zip(tiles, outs):
        buf = _place_tile(buf, out, jnp.int32(tile.base))
    return buf, total, adler_acc, crc_acc


def inflate_device_array(data: bytes, index=None, start_bit: int = 0,
                         mesh=None, verify: bool = True):
    """Like inflate_device but returns (jax.Array uint8, total_out) without
    fetching the payload to host — the device-resident decode surface.
    The returned array is padded; the first total_out bytes are the data."""
    if index is None:
        index = build_decode_index(data, start_bit)
    buf, total, adler_acc, _ = inflate_device_array_acc(data, index,
                                                        start_bit, mesh)
    if total and verify:
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
