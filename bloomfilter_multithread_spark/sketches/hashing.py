"""Hash kernels for the sketch library.

Two layers:

1. ``xorshift32`` — an exact, vectorized numpy reproduction of the
   reference's string hash (``/root/reference/src/SkmerSplitter.cpp:4-13``)
   for parity tests and the reference-faithful Bloom indexing
   (``bit = xorshift32(s) % bf_size``, SkmerSplitter.cpp:83,132).
2. 64-bit mixers + Kirsch–Mitzenmacher double hashing used by the
   production sketches.  In the Spark pipeline the initial 64-bit hash is
   computed JVM-side with ``F.xxhash64`` (whole-stage codegen); everything
   here consumes int64/uint64 numpy arrays only — no per-row Python.

All arithmetic is explicit-width unsigned with wraparound, matching C
semantics.
"""

from __future__ import annotations

import numpy as np

_U32 = np.uint32
_U64 = np.uint64


def xorshift32_scalar(s: bytes | str) -> int:
    """Reference-exact xorshift32 of a byte string (seed 0).

    Parity target: ``uint32_t xorshift32(const std::string&)`` at
    ``/root/reference/src/SkmerSplitter.cpp:4-13``.
    """
    if isinstance(s, str):
        s = s.encode("utf-8")
    h = 0
    for c in s:
        h ^= c
        h = (h ^ ((h << 13) & 0xFFFFFFFF)) & 0xFFFFFFFF
        h ^= h >> 17
        h = (h ^ ((h << 5) & 0xFFFFFFFF)) & 0xFFFFFFFF
    return h


def xorshift32_batch(strings) -> np.ndarray:
    """Vectorized xorshift32 over a batch of byte/str values.

    Pads the batch into a (n, maxlen) uint8 matrix and advances all rows
    one character position per iteration (vectorized across the batch;
    rows shorter than the current position are masked out).  Exact
    uint32-wraparound parity with :func:`xorshift32_scalar`.
    """
    enc = [s.encode("utf-8") if isinstance(s, str) else bytes(s) for s in strings]
    n = len(enc)
    if n == 0:
        return np.empty(0, dtype=_U32)
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    mat = np.zeros((n, maxlen), dtype=np.uint8)
    for i, b in enumerate(enc):  # packing loop only; hashing below is vectorized
        mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    h = np.zeros(n, dtype=_U32)
    thirteen, seventeen, five = _U32(13), _U32(17), _U32(5)
    with np.errstate(over="ignore"):
        for pos in range(maxlen):
            active = lens > pos
            hp = h[active]
            hp = hp ^ mat[active, pos].astype(_U32)
            hp = hp ^ (hp << thirteen)
            hp = hp ^ (hp >> seventeen)
            hp = hp ^ (hp << five)
            h[active] = hp
    return h


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — decorrelates int64 hashes (public domain
    constants, Steele et al.).  Input any int64/uint64 array."""
    z = x.astype(_U64, copy=True)
    with np.errstate(over="ignore"):
        z += _U64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        z = z ^ (z >> _U64(31))
    return z


# ----------------------------------------------------- rolling k-mer hash
# The literal form of the reference's P3: ntHash seeds the first m-mer
# and then ROLLS in O(1) per character (NTC64(out, in, m, fh, rh) at
# /root/reference/src/SkmerExtractor.cpp:65-74,104) instead of rehashing
# each k-mer whole (O(k) per position). Re-expressed as a polynomial
# rolling hash, VECTORIZED over all positions at once via modular prefix
# sums — total work O(n) per sequence, a constant number of numpy passes:
#
#   H(i) = sum_{j<k} s[i+j] * B^j          (mod 2^64)
#        = (prefix[i+k] - prefix[i]) * B^{-i}
#
# with prefix[i] = sum_{j<i} s[j] * B^j. B is odd, so B^{-1} exists mod
# 2^64 and both power tables come from wraparound cumprods. A splitmix64
# finalizer decorrelates the raw polynomial values for Bloom indexing.

ROLL_BASE = 0x100000001B3  # FNV-1a 64 prime (odd, public constant)
_ROLL_BASE_INV = pow(ROLL_BASE, -1, 1 << 64)


def rolling_kmer_hashes(seq: bytes | str | np.ndarray, k: int,
                        mix: bool = True) -> np.ndarray:
    """All ``len(seq)-k+1`` k-mer hashes of one sequence, O(n) total.

    Returns uint64 (n-k+1,). Position-independent: the hash of a k-mer
    depends only on its characters, so build and probe agree wherever
    the k-mer occurs (the reference's correctness keystone). Property-
    tested equal to per-position whole-k-mer rehash AND to the
    sequential O(1) roll recurrence in tests/test_rolling_hash.py."""
    if isinstance(seq, str):
        seq = seq.encode("ascii")
    if isinstance(seq, (bytes, bytearray)):
        a = np.frombuffer(bytes(seq), dtype=np.uint8)
    else:
        a = np.asarray(seq, dtype=np.uint8)
    n = a.size
    if n < k or k <= 0:
        return np.empty(0, dtype=_U64)
    npos = n - k + 1
    with np.errstate(over="ignore"):
        pows = np.empty(n, dtype=_U64)
        pows[0] = 1
        if n > 1:
            np.cumprod(np.full(n - 1, ROLL_BASE, dtype=_U64), out=pows[1:])
        prefix = np.empty(n + 1, dtype=_U64)
        prefix[0] = 0
        np.cumsum(a.astype(_U64) * pows, out=prefix[1:])
        invpows = np.empty(npos, dtype=_U64)
        invpows[0] = 1
        if npos > 1:
            np.cumprod(np.full(npos - 1, _ROLL_BASE_INV, dtype=_U64), out=invpows[1:])
        h = (prefix[k : k + npos] - prefix[:npos]) * invpows
    return splitmix64(h) if mix else h


def rolling_kmer_hashes_naive(seq: bytes | str, k: int, mix: bool = True) -> np.ndarray:
    """O(n*k) per-position whole-k-mer rehash of the SAME polynomial —
    the comparison baseline (what re-hashing every k-mer whole costs)
    and the parity oracle for the O(n) kernel."""
    if isinstance(seq, str):
        seq = seq.encode("ascii")
    a = np.frombuffer(bytes(seq), dtype=np.uint8)
    n = a.size
    if n < k or k <= 0:
        return np.empty(0, dtype=_U64)
    win = np.lib.stride_tricks.sliding_window_view(a, k).astype(_U64)
    with np.errstate(over="ignore"):
        pows = np.empty(k, dtype=_U64)
        pows[0] = 1
        if k > 1:
            np.cumprod(np.full(k - 1, ROLL_BASE, dtype=_U64), out=pows[1:])
        h = (win * pows).sum(axis=1, dtype=_U64)
    return splitmix64(h) if mix else h


def to_u64(h) -> np.ndarray:
    """View/convert an int64-ish array (e.g. Spark xxhash64 output) as uint64."""
    a = np.asarray(h)
    if a.dtype == _U64:
        return a
    return a.astype(np.int64, copy=False).view(_U64)


def double_hash_indices(h: np.ndarray, k: int, m: int) -> np.ndarray:
    """Kirsch–Mitzenmacher k-index derivation: ``idx_i = (h1 + i*h2) mod m``.

    ``h`` is a (n,) array of 64-bit hashes (JVM xxhash64 or splitmix64).
    Returns (k, n) uint64 indices.  ``m`` must be a power of two, so mod
    is a mask.  ``h2`` is forced odd so the stride cycles the whole table.

    This is the production replacement for the reference's single-hash
    indexing (``SkmerSplitter.cpp:83``) demanded by the north rule
    ("identical k-hash (double-hashing) indexing").
    """
    if m & (m - 1):
        raise ValueError(f"m must be a power of two, got {m}")
    u = to_u64(h)
    h1 = u
    h2 = splitmix64(u) | _U64(1)
    mask = _U64(m - 1)
    i = np.arange(k, dtype=_U64)[:, None]
    with np.errstate(over="ignore"):
        return (h1[None, :] + i * h2[None, :]) & mask
