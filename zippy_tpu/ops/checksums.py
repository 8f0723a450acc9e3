"""TPU-native checksums: crc32 and adler32 as parallel reductions.

Reference behavior: /root/reference/src/zippy/crc.nim, adler32.nim and the
SIMD kernels in crc32_simd.nim / adler32_simd.nim. Those are serial/SIMD CPU
loops; here both checksums are recast as data-parallel reductions that XLA
maps onto the TPU VPU:

* adler32 — (s1, s2) is a segmented weighted prefix reduction. Each chunk
  contributes (S, W) = (sum d_i, sum (L-i) d_i); chunks combine associatively
  with W_AB = W_A + len_B * S_A + W_B. All math stays in uint32 lanes with
  deferred modulo (the vector analogue of zlib's NMAX trick,
  reference adler32.nim:22-63).

* crc32 — CRC is GF(2)-linear: the register after message M with init I is
  shift8^n(I) XOR raw(M), raw(M) = XOR_i shift8^{n-1-i}(T0[d_i]). We gather
  per-word raw CRCs through four 256-entry LUTs (slice-by-4 in parallel across
  ALL words at once), then combine pairs in a log-depth tree using
  precomputed GF(2) shift matrices — the same algebra as the PCLMULQDQ
  folding in the reference's crc32_simd.nim:39-144, expressed as vector ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

ADLER_MOD = 65521
CRC32_POLY = 0xEDB88320  # reflected polynomial

# ---------------------------------------------------------------------------
# Host-side GF(2) linear algebra (32x32 matrices as 32 uint32 columns)
# ---------------------------------------------------------------------------


@functools.cache
def _crc_byte_table() -> np.ndarray:
    """T0[b] = CRC register after one byte b with init 0 (standard table)."""
    table = np.zeros(256, dtype=np.uint64)
    for b in range(256):
        c = b
        for _ in range(8):
            c = (c >> 1) ^ (CRC32_POLY if (c & 1) else 0)
        table[b] = c
    return table.astype(np.uint32)


def gf2_matvec(mat: np.ndarray, vec: int) -> int:
    """Apply 32x32 GF(2) matrix (columns as uint32) to a 32-bit vector."""
    out = 0
    v = int(vec)
    for j in range(32):
        if (v >> j) & 1:
            out ^= int(mat[j])
    return out


def gf2_matmul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.array([gf2_matvec(a, int(col)) for col in b], dtype=np.uint32)


@functools.cache
def _shift8_matrix() -> bytes:
    """Matrix for one-byte CRC register advance: c -> (c>>8) ^ T0[c & 0xFF]."""
    t0 = _crc_byte_table()
    cols = np.zeros(32, dtype=np.uint32)
    for j in range(32):
        e = np.uint32(1 << j)
        cols[j] = (e >> np.uint32(8)) ^ t0[int(e) & 0xFF]
    return cols.tobytes()


@functools.cache
def _shift_matrix_pow(k: int) -> bytes:
    """shift8^(2^k) as a GF(2) matrix (advance register by 2^k bytes)."""
    if k == 0:
        return _shift8_matrix()
    m = np.frombuffer(_shift_matrix_pow(k - 1), dtype=np.uint32)
    return gf2_matmul(m, m).tobytes()


def crc_shift_register(value: int, nbytes: int) -> int:
    """Advance a CRC register by nbytes of (implicit) processing: shift8^n."""
    v = int(value)
    k = 0
    n = int(nbytes)
    while n:
        if n & 1:
            v = gf2_matvec(np.frombuffer(_shift_matrix_pow(k), dtype=np.uint32), v)
        n >>= 1
        k += 1
    return v


def crc32_combine(crc1: int, crc2: int, len2: int) -> int:
    """crc32(A || B) from crc32(A), crc32(B), len(B).

    Used by the block-parallel gather (multi-chip compress concatenates
    per-block payloads; the whole-payload gzip CRC is combined, not re-scanned).
    Identity: with standard init/xorout, crc(A||B) = shift(crc(A)^FFFF, len2)
    ^ shift(FFFF, len2) ^ crc(B) ... which simplifies to the zlib form below.
    """
    if len2 == 0:
        return crc1 & 0xFFFFFFFF
    # Register after A||B = shift^len2(reg_A) ^ raw(B).
    # crc1 = reg_A ^ FFFFFFFF ; crc2 = shift^len2(FFFFFFFF) ^ raw(B) ^ FFFFFFFF
    # => crc(A||B) = shift^len2(reg_A) ^ raw(B) ^ FFFFFFFF
    #              = shift^len2(crc1 ^ FFFFFFFF) ^ crc2 ^ shift^len2(FFFFFFFF)
    #              = shift^len2(crc1) ^ crc2        (linearity cancels init)
    return (crc_shift_register(crc1, len2) ^ crc2) & 0xFFFFFFFF


def adler32_combine(adler1: int, adler2: int, len2: int) -> int:
    """adler32(A || B) from the two part checksums (zlib adler32_combine)."""
    m = ADLER_MOD
    rem = len2 % m
    s1a, s2a = adler1 & 0xFFFF, (adler1 >> 16) & 0xFFFF
    s1b, s2b = adler2 & 0xFFFF, (adler2 >> 16) & 0xFFFF
    s1 = (s1a + s1b - 1) % m
    s2 = (s2a + s2b + rem * (s1a - 1)) % m  # s2b already counts len2 * 1 init
    return ((s2 << 16) | s1) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# Device kernels
# ---------------------------------------------------------------------------

_ADLER_CHUNK = 1024  # 255 * 1024 * 1025 / 2 < 2^32: uint32-safe weighted sums


def _mod_sum(x: jnp.ndarray, m: int = ADLER_MOD) -> jnp.ndarray:
    """Sum an array of residues (< m) with interleaved mods, uint32-safe."""
    x = x.reshape(-1)
    while x.shape[0] > 1:
        width = min(x.shape[0], 4096)  # 4096 * 65520 < 2^32
        rows = -(-x.shape[0] // width)
        x = jnp.pad(x, (0, rows * width - x.shape[0]))
        x = jnp.sum(x.reshape(rows, width), axis=1) % jnp.uint32(m)
    return x[0]


@jax.jit
def _adler32_padded(data: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """adler32 of data[:n]; data is zero-padded to a multiple of _ADLER_CHUNK."""
    m = jnp.uint32(ADLER_MOD)
    d = data.reshape(-1, _ADLER_CHUNK).astype(jnp.uint32)
    nchunks = d.shape[0]
    # Per-chunk plain and weighted sums (weights L..1, last byte weight 1).
    w = (jnp.uint32(_ADLER_CHUNK) - jnp.arange(_ADLER_CHUNK, dtype=jnp.uint32))
    s_c = jnp.sum(d, axis=1) % m
    w_c = jnp.sum(d * w[None, :], axis=1) % m
    # Chunk c is followed by (nchunks-1-c)*CHUNK padded bytes.
    off = ((nchunks - 1 - jnp.arange(nchunks, dtype=jnp.uint32))
           * jnp.uint32(_ADLER_CHUNK)) % m
    terms = (w_c + (off * s_c) % m) % m
    w_padded = _mod_sum(terms)
    s_total = _mod_sum(s_c)
    # Zero padding sits at the END: every real byte's weight is inflated by
    # pad, so W_real = W_padded - pad * S  (mod m).
    pad = (jnp.uint32(data.shape[0]) - n.astype(jnp.uint32)) % m
    w_real = (w_padded + (m - (pad * s_total) % m)) % m
    s1 = (jnp.uint32(1) + s_total) % m
    s2 = (n.astype(jnp.uint32) % m + w_real) % m
    return (s2 << jnp.uint32(16)) | s1


def adler32_device(data, *, use_pallas: bool = False) -> int:
    """Adler-32 computed on the accelerator. Accepts bytes or uint8 array.

    Default is the pure-XLA reduction: measured 309 GB/s device-resident on
    TPU v5e vs 2.5 GB/s for the Pallas tile kernel (Mosaic lowers the
    cross-lane reductions poorly) — the "let XLA fuse" rule wins here. The
    Pallas kernel (ops/pallas_checksums.py) stays available via use_pallas.
    """
    if use_pallas:
        try:
            from . import pallas_checksums

            return pallas_checksums.adler32_pallas(data)
        except Exception:  # pragma: no cover - backend without Pallas
            pass
    arr = _as_u8(data)
    n = arr.shape[0]
    if n == 0:
        return 1
    padded = _bucket_pad(arr, _ADLER_CHUNK)
    return int(_adler32_padded(jnp.asarray(padded), jnp.uint32(n)))


@functools.cache
def _crc_word_tables() -> np.ndarray:
    """Tk[b] = raw CRC of byte b followed by k zero bytes, k = 0..3.

    Lets us fold each aligned 4-byte word to its raw CRC with four gathers:
    raw(word) = T3[b0] ^ T2[b1] ^ T1[b2] ^ T0[b3].
    """
    t0 = _crc_byte_table()
    shift8 = np.frombuffer(_shift8_matrix(), dtype=np.uint32)
    tabs = [t0]
    for _ in range(3):
        prev = tabs[-1]
        tabs.append(np.array([gf2_matvec(shift8, int(v)) for v in prev],
                             dtype=np.uint32))
    return np.stack(tabs)  # (4, 256)


@functools.cache
def _tree_matrices(max_levels: int = 28) -> np.ndarray:
    """Level-k pair combine uses shift by 4*2^k bytes (word-level tree)."""
    mats = []
    # word shift = shift8^4
    m = np.frombuffer(_shift_matrix_pow(1), dtype=np.uint32)  # 2 bytes
    m = gf2_matmul(m, m)  # 4 bytes
    for _ in range(max_levels):
        mats.append(m)
        m = gf2_matmul(m, m)
    return np.stack(mats)  # (levels, 32)


def _gf2_matvec_device(cols: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Vectorized GF(2) matrix-apply: cols (32,) uint32, v (...,) uint32."""
    out = jnp.zeros_like(v)
    for j in range(32):
        bit = (v >> jnp.uint32(j)) & jnp.uint32(1)
        out = out ^ (bit * cols[j])
    return out


def _fold_raw(c: jnp.ndarray, lvl0: int = 0) -> jnp.ndarray:
    """Fold per-unit raw CRCs (power-of-two count, unit = 4*2^lvl0 bytes)
    to the raw CRC of the concatenation.

    Two phases: UNROLLED pairwise halving folds while the array is large —
    raw(L||R) = shift^{unit*2^k}(raw_L) ^ raw_R with a static per-level
    matrix, so the work HALVES per level (the old full-width fori
    butterfly did 32n selects at every one of its ~24 levels: measured
    0.09 GB/s on 64 MiB; only log2(n/2^16) levels unroll, so the graph
    stays a few hundred ops) — then the fori butterfly on the <=2^16-unit
    remainder, whose body compiles once for all remainder levels."""
    # Contiguous HALF-folding (the vector analogue of PCLMUL fold-by-K):
    # XOR-folding is commutative, so pair element i with i + m/2 under
    # shift8^(unit*(m/2)) — both slices contiguous (even/odd strided
    # slices relayout across lanes on TPU and ran ~100x slower).
    while c.shape[0] > (1 << 10):
        half = c.shape[0] // 2
        k = int(np.log2(half)) + lvl0
        cols = jnp.asarray(_tree_matrices()[k])
        left = c[:half]
        folded = jnp.zeros_like(left)
        for j in range(32):
            bit = (left >> jnp.uint32(j)) & jnp.uint32(1)
            folded = folded ^ (bit * cols[j])
        c = folded ^ c[half:]
    nwords = c.shape[0]
    levels = int(np.log2(nwords)) if nwords > 1 else 0
    if levels:
        mats = jnp.asarray(_tree_matrices()[lvl0 : lvl0 + levels])
        idx = jnp.arange(nwords, dtype=jnp.uint32)

        def step(k, c):
            stride = jnp.uint32(1) << k.astype(jnp.uint32)
            left = jnp.roll(c, 1 << k)                      # c[i - 2^k]
            cols = mats[k]
            folded = jnp.zeros_like(c)
            for j in range(32):
                bit = (left >> jnp.uint32(j)) & jnp.uint32(1)
                folded = folded ^ (bit * cols[j])
            combined = folded ^ c
            take = (idx & ((stride << 1) - 1)) == ((stride << 1) - 1)
            return jnp.where(take, combined, c)

        c = jax.lax.fori_loop(0, levels, step, c)
    return c[nwords - 1]


def _crc32_raw_words(c: jnp.ndarray) -> jnp.ndarray:
    return _fold_raw(c, 0)


_MXU_CHUNK_WORDS = 256  # 1 KiB chunks: bit counts < 2^13, exact in f32


@functools.cache
def _chunk_bit_matrix() -> np.ndarray:
    """M [8192, 32] float32 of 0/1: the GF(2) map from a 1 KiB chunk's
    bits to its 32 raw-CRC bits. Row for chunk bit p (word p//32, word bit
    p%32) is shift8^{4*(255 - p//32)} applied to that word-bit's raw-CRC
    column (_word_bit_columns). Host-built once, cached."""
    wcols = _word_bit_columns()
    K = _MXU_CHUNK_WORDS
    M = np.zeros((K * 32, 32), dtype=np.float32)
    shift = np.frombuffer(_shift_matrix_pow(2), dtype=np.uint32)  # 4 bytes
    # mats[w] = shift8^{4*w}; built back-to-front by repeated 4-byte steps.
    cur = np.array([np.uint32(1) << j for j in range(32)], dtype=np.uint32)
    mats = [cur]
    for _ in range(K - 1):
        cur = gf2_matmul(shift, cur)
        mats.append(cur)
    for w_i in range(K):
        m = mats[K - 1 - w_i]
        for b in range(32):
            v = gf2_matvec(m, int(wcols[b]))
            M[w_i * 32 + b, :] = [(v >> o) & 1 for o in range(32)]
    return M


@jax.jit
def _crc32_raw_mxu(data: jnp.ndarray) -> jnp.ndarray:
    """Raw CRC of `data` (power-of-two words >= 256, zero front padding)
    via the bit-plane popcount-matmul form: a chunk's raw CRC is GF(2)-
    linear in its 8192 bits, so [nchunks, 8192] 0/1 bf16 @ [8192, 32]
    counts bit-AND pairs on the MXU and parity (count & 1) is the GF(2)
    product. Counts < 2^13 are exact in the f32 accumulator. Replaces 32
    select-XOR vector passes per word with one matmul whose FLOPs are
    negligible — the cost is the 16x bit-plane materialization traffic,
    still ~6x less work than the select-XOR chain (CLAUDE.md r4 design,
    VERDICT r4 item 6)."""
    M = jnp.asarray(_chunk_bit_matrix(), dtype=jnp.bfloat16)

    def slab_raws(slab: jnp.ndarray) -> jnp.ndarray:
        d = slab.reshape(-1, _MXU_CHUNK_WORDS, 4).astype(jnp.uint32)
        w = (d[..., 0] | (d[..., 1] << jnp.uint32(8))
             | (d[..., 2] << jnp.uint32(16)) | (d[..., 3] << jnp.uint32(24)))
        bits = ((w[:, :, None]
                 >> jnp.arange(32, dtype=jnp.uint32)[None, None, :])
                & jnp.uint32(1)).astype(jnp.bfloat16).reshape(w.shape[0], -1)
        counts = jax.lax.dot(bits, M, preferred_element_type=jnp.float32)
        par = counts.astype(jnp.int32) & 1
        return jnp.sum(par.astype(jnp.uint32)
                       << jnp.arange(32, dtype=jnp.uint32)[None, :], axis=1)

    # The bit planes inflate data 16x (plus broadcast temporaries), so big
    # inputs stream through fixed 4 MiB slabs under lax.map (serial, one
    # buffer) instead of materializing gigabytes at once (a 64 MiB input
    # OOMed 16 GB of HBM when done in one shot).
    slab = 4 << 20
    if data.shape[0] > slab:
        raw = jax.lax.map(slab_raws, data.reshape(-1, slab)).reshape(-1)
    else:
        raw = slab_raws(data)
    return _fold_raw(raw, 8)  # chunk unit = 1024 B = 4*2^8


@functools.cache
def _word_bit_columns() -> np.ndarray:
    """C[b] = raw CRC of a 4-byte word with only bit b set (b indexes the
    word's little-endian uint32 value). The per-word raw CRC is GF(2)-
    LINEAR in the word's bits: raw(w) = XOR over set bits of C[b]."""
    tabs = _crc_word_tables()
    cols = np.zeros(32, dtype=np.uint32)
    for b in range(32):
        byte_i = b // 8          # which byte of the LE word
        cols[b] = tabs[3 - byte_i][1 << (b % 8)]
    return cols


def _words_raw_crc(data: jnp.ndarray) -> jnp.ndarray:
    """Per-4-byte-word raw CRCs (leading axis preserved; last axis must be
    a multiple of 4), as 32 select-XORs of constant columns — the GF(2)
    bit-linear form. The slice-by-4 LUT-gather formulation was measured
    ~0.07 GB/s on TPU (XLA lowers per-element gathers at ~60 M/s); the
    linear form is pure vector selects at HBM-bound speed."""
    cols = _word_bit_columns()
    d = data.reshape(data.shape[:-1] + (-1, 4)).astype(jnp.uint32)
    w = (d[..., 0] | (d[..., 1] << jnp.uint32(8))
         | (d[..., 2] << jnp.uint32(16)) | (d[..., 3] << jnp.uint32(24)))
    out = jnp.zeros_like(w)
    for b in range(32):
        out = out ^ (((w >> jnp.uint32(b)) & jnp.uint32(1))
                     * jnp.uint32(int(cols[b])))
    return out


@jax.jit
def _crc32_padded(data: jnp.ndarray, init_term: jnp.ndarray) -> jnp.ndarray:
    """Raw-space CRC over data (power-of-two words, leading zero padding).

    Leading zero bytes are free in raw space (T0[0] == 0), so callers pad at
    the FRONT to a power-of-two word count. `init_term` = shift8^n(0xFFFFFFFF),
    host-computed per call (32x32 GF(2) square-multiply, microseconds).

    The MXU bit-plane alternative (_crc32_raw_mxu) was benched on chip and
    LOSES: 0.674 GB/s vs this form's 1.9 GB/s on 64 MiB (chained timing,
    BENCH_DEVICE_r5) — the 0/1 bit-plane materialization plus its u32
    broadcast temporaries cost ~10-100x the input in HBM traffic, which no
    matmul cheapness recovers. Kept as the documented dead end (VERDICT r4
    item 6); the select-XOR chain remains the device crc path.
    """
    raw = _crc32_raw_words(_words_raw_crc(data))
    return raw ^ init_term ^ jnp.uint32(0xFFFFFFFF)


@jax.jit
def _crc32_blocks_raw(rows: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
    """Raw-space CRC of rows[r, :lens[r]] for every row at once.

    rows: (G, B) uint8 with B a power-of-two multiple of 4, data at the
    FRONT, zeros after lens[r]. Each row is rolled right so its real bytes
    end at the row boundary (leading zeros are free in raw space), then the
    per-row word CRCs fold through the log tree. Used by the block-parallel
    gzip/zlib trailer (parallel/blocks.py) with crc32_combine on host."""
    B = rows.shape[1]
    rolled = jax.vmap(lambda r, sh: jnp.roll(r, sh))(rows, B - lens)
    return jax.vmap(_crc32_raw_words)(_words_raw_crc(rolled))


def _as_u8(data):
    """bytes -> numpy view; jax.Array stays ON DEVICE (no host bounce)."""
    if isinstance(data, (bytes, bytearray, memoryview)):
        return np.frombuffer(data, dtype=np.uint8)
    if isinstance(data, jax.Array):
        return data.astype(jnp.uint8) if data.dtype != jnp.uint8 else data
    return np.asarray(data, dtype=np.uint8)


def _bucket_pad(arr, multiple: int, front: bool = False):
    """Pad to the next power-of-two multiple of `multiple` (limits recompiles).
    numpy in -> numpy out; jax.Array in -> device-side pad."""
    n = arr.shape[0]
    target = multiple
    while target < n:
        target *= 2
    pad = target - n
    if pad == 0:
        return arr
    if isinstance(arr, jax.Array):
        off = pad if front else 0
        return jnp.zeros(target, jnp.uint8).at[off : off + n].set(arr)
    return np.concatenate([np.zeros(pad, np.uint8), arr] if front
                          else [arr, np.zeros(pad, np.uint8)])


def crc32_device(data, *, use_pallas: bool = False) -> int:
    """CRC-32 computed on the accelerator. Accepts bytes or uint8 array.

    Default is pure XLA: the GF(2) bit-linear select-XOR form + log-tree
    fold, ~1.9 GB/s chained on 64 MiB (BENCH_DEVICE_r5; the r2 "329 GB/s"
    figure was a block_until_ready artifact, retracted in r4; the MXU
    bit-plane alternative measured 0.674 GB/s and is kept only as a
    documented dead end). use_pallas selects the Mosaic fold kernel.
    """
    if use_pallas:
        try:
            from . import pallas_checksums

            return pallas_checksums.crc32_pallas(data)
        except Exception:  # pragma: no cover - backend without Pallas
            pass
    arr = _as_u8(data)
    n = arr.shape[0]
    if n == 0:
        return 0
    padded = _bucket_pad(arr, 4, front=True)
    init_term = crc_shift_register(0xFFFFFFFF, n)
    return int(_crc32_padded(jnp.asarray(padded), jnp.uint32(init_term)))
