"""Pallas TPU kernel for the adler32 per-chunk reduction.

The device adler32 (ops/checksums.py) is a segmented (sum, weighted-sum)
reduction: each 1024-byte chunk contributes (S_j, W_j) which combine
associatively. The per-chunk stage is the bandwidth-bound hot loop — this
kernel tiles it through VMEM explicitly (32 chunks = one (32, 1024) uint8
tile per grid step, within the int8 (32, 128) tiling constraint) instead of
leaving the reshape/reduce fusion to XLA. The cross-chunk combine stays in
jnp (it's tiny).

On non-TPU backends the kernel runs in interpreter mode, so the same code
path is exercised by the CPU test mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import checksums

CHUNK = 1024          # bytes per logical chunk (matches checksums._ADLER_CHUNK)
TILE_CHUNKS = 128     # chunks per grid step: (128, 1024) uint8 = 128 KB VMEM tile
MOD = checksums.ADLER_MOD


def _adler_tile_kernel(data_ref, s_ref, w_ref):
    # int32 throughout: Mosaic has no unsigned reductions, and the sums fit
    # (max weighted sum per chunk = 255 * 1024*1025/2 ~= 1.3e8 < 2^31).
    d = data_ref[:].astype(jnp.int32)                        # (32, CHUNK)
    # weight of byte i within a chunk is CHUNK - i (last byte weighs 1)
    w = jnp.int32(CHUNK) - jax.lax.broadcasted_iota(
        jnp.int32, d.shape, dimension=1
    )
    s_ref[:] = jnp.sum(d, axis=1, keepdims=True) % jnp.int32(MOD)
    w_ref[:] = jnp.sum(d * w, axis=1, keepdims=True) % jnp.int32(MOD)


@functools.cache
def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


@jax.jit
def _adler_chunks_pallas(data: jnp.ndarray):
    """data: (nchunks, CHUNK) uint8, nchunks % TILE_CHUNKS == 0.
    Returns per-chunk (S, W) residues, each (nchunks,) uint32."""
    nchunks = data.shape[0]
    grid = (nchunks // TILE_CHUNKS,)
    s, w = pl.pallas_call(
        _adler_tile_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_CHUNKS, CHUNK), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_CHUNKS, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_CHUNKS, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nchunks, 1), jnp.int32),
            jax.ShapeDtypeStruct((nchunks, 1), jnp.int32),
        ),
        interpret=_use_interpret(),
    )(data)
    return s[:, 0].astype(jnp.uint32), w[:, 0].astype(jnp.uint32)


@jax.jit
def _combine_chunks(s_c: jnp.ndarray, w_c: jnp.ndarray, n: jnp.ndarray,
                    total_padded: jnp.ndarray) -> jnp.ndarray:
    """Associative combine of per-chunk residues into the adler32 value
    (same math as checksums._adler32_padded's tail)."""
    m = jnp.uint32(MOD)
    nchunks = s_c.shape[0]
    off = ((nchunks - 1 - jnp.arange(nchunks, dtype=jnp.uint32))
           * jnp.uint32(CHUNK)) % m
    terms = (w_c + (off * s_c) % m) % m
    w_padded = checksums._mod_sum(terms)
    s_total = checksums._mod_sum(s_c)
    pad = (total_padded - n.astype(jnp.uint32)) % m
    w_real = (w_padded + (m - (pad * s_total) % m)) % m
    s1 = (jnp.uint32(1) + s_total) % m
    s2 = (n.astype(jnp.uint32) % m + w_real) % m
    return (s2 << jnp.uint32(16)) | s1


# ---------------------------------------------------------------------------
# CRC-32: gather-free Pallas formulation. The jnp path (checksums.py) folds
# words to raw CRCs via four 256-entry LUT gathers; Mosaic prefers no
# gathers, and CRC is GF(2)-linear, so raw(word) is a constant 32x32
# bit-matrix applied to the word: raw = XOR_j bit_j(word) * COLS[j].
# A row of 128 words then tree-reduces with 7 constant per-level shift
# matrices. Cross-row combine reuses the jnp log-tree.
# ---------------------------------------------------------------------------

CRC_ROW = 128            # words per row; one crc out per row
CRC_TILE_ROWS = 128      # rows per grid step: (128, 128) int32 = 64 KB tile


@functools.cache
def _crc_matrices() -> np.ndarray:
    """(8, 32) int32: row 0 = word matrix (raw CRC of each unit bit of a
    big-endian-loaded LE word), rows 1..7 = tree-level shift matrices for
    combining 2^k-word halves (shift by 4*2^k ... 4*64 bytes)."""
    t0 = checksums._crc_byte_table()
    # raw CRC of unit bit j of a 4-byte group, where byte 0 is FIRST in the
    # stream. Stream order: b0 b1 b2 b3; raw(group) = shift8^3(T0-ish)...
    # Build from byte tables: raw of byte value v at position p (0 = first)
    # is Tk[v] with k = 3 - p (checksums._crc_word_tables).
    tabs = checksums._crc_word_tables()  # (4, 256) — [k][b], k zeros after
    cols = np.zeros(32, dtype=np.uint32)
    for j in range(32):
        byte_pos = j // 8          # which byte of the LE word
        bit_in_byte = j % 8
        # LE word bit j lives in stream byte `byte_pos` (b0 = low byte)
        cols[j] = tabs[3 - byte_pos][1 << bit_in_byte]
    mats = [cols]
    m = np.frombuffer(checksums._shift_matrix_pow(2), dtype=np.uint32)  # 4B
    for _ in range(7):
        mats.append(m)
        m = checksums.gf2_matmul(m, m)
    return np.stack(mats).astype(np.int64).astype(np.int32)  # (8, 32)


def _make_crc_tile_kernel():
    """Kernel with the GF(2) matrices baked in as scalar constants (avoids a
    sub-lane-width matrix operand)."""
    mats = _crc_matrices()

    def kernel(words_ref, out_ref):
        w = words_ref[:]                              # (R, 128) int32
        # raw CRC per word: 32-step GF(2) matvec, constant word matrix.
        acc = jnp.zeros_like(w)
        for j in range(32):
            bit = jax.lax.shift_right_logical(w, jnp.int32(j)) & jnp.int32(1)
            acc = acc ^ (bit * jnp.int32(int(mats[0, j])))
        # Tree-reduce 128 -> 1 per row; step k folds the left half (which
        # precedes the right by half*4 stream bytes) onto the right.
        cur = acc
        width = CRC_ROW
        for k in range(7):
            half = width // 2
            left = cur[:, :half]
            right = cur[:, half:width]
            folded = jnp.zeros_like(left)
            for j in range(32):
                bit = (jax.lax.shift_right_logical(left, jnp.int32(j))
                       & jnp.int32(1))
                folded = folded ^ (bit * jnp.int32(int(mats[1 + (6 - k), j])))
            cur = folded ^ right
            width = half
        out_ref[:] = cur[:, :1]

    return kernel


@jax.jit
def _crc_rows_pallas(words: jnp.ndarray):
    """words: (nrows, 128) int32 (LE words). Returns per-row raw CRCs
    (nrows,) uint32 (row = 512 stream bytes)."""
    nrows = words.shape[0]
    grid = (nrows // CRC_TILE_ROWS,)
    out = pl.pallas_call(
        _make_crc_tile_kernel(),
        grid=grid,
        in_specs=[
            pl.BlockSpec((CRC_TILE_ROWS, CRC_ROW), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CRC_TILE_ROWS, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrows, 1), jnp.int32),
        interpret=_use_interpret(),
    )(words)
    return out[:, 0].astype(jnp.uint32)


@jax.jit
def _crc_combine_rows(row_crcs: jnp.ndarray, init_term: jnp.ndarray):
    """Log-tree combine of per-row (512-byte) raw CRCs + final xor-out."""
    c = row_crcs
    nrows = c.shape[0]
    levels = int(np.log2(nrows)) if nrows > 1 else 0
    mats = checksums._tree_matrices()
    # Row = 128 words = 512 bytes = 2^7 words: tree level offset 7.
    for k in range(levels):
        left = c[0::2]
        right = c[1::2]
        c = checksums._gf2_matvec_device(jnp.asarray(mats[k + 7]), left) ^ right
    return c[0] ^ init_term ^ jnp.uint32(0xFFFFFFFF)


def crc32_pallas(data) -> int:
    """CRC-32 via the Pallas fold kernel. Accepts bytes or uint8 array."""
    arr = (np.frombuffer(data, dtype=np.uint8)
           if isinstance(data, (bytes, bytearray, memoryview))
           else np.asarray(data, dtype=np.uint8))
    n = arr.shape[0]
    if n == 0:
        return 0
    step = 4 * CRC_ROW * CRC_TILE_ROWS
    target = step
    while target < n:
        target *= 2
    # Leading zeros are free in raw space: pad at the FRONT.
    padded = np.zeros(target, np.uint8)
    padded[target - n :] = arr
    words = jnp.asarray(
        padded.view("<u4").astype(np.int64).astype(np.int32)
    ).reshape(-1, CRC_ROW)
    rows = _crc_rows_pallas(words)
    init_term = checksums.crc_shift_register(0xFFFFFFFF, n)
    return int(_crc_combine_rows(rows, jnp.uint32(init_term)))


def adler32_pallas(data) -> int:
    """Adler-32 via the Pallas per-chunk kernel. Accepts bytes or uint8."""
    arr = (np.frombuffer(data, dtype=np.uint8)
           if isinstance(data, (bytes, bytearray, memoryview))
           else np.asarray(data, dtype=np.uint8))
    n = arr.shape[0]
    if n == 0:
        return 1
    step = CHUNK * TILE_CHUNKS
    target = step
    while target < n:
        target *= 2
    padded = np.zeros(target, np.uint8)
    padded[:n] = arr
    chunks = jnp.asarray(padded).reshape(-1, CHUNK)
    s_c, w_c = _adler_chunks_pallas(chunks)
    return int(_combine_chunks(s_c, w_c, jnp.uint32(n), jnp.uint32(target)))
