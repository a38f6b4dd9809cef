"""Bloom filter — the reference-faithful core sketch.

Re-expression of the reference's per-thread 65,536-bit BitMagic filters
(``/root/reference/src/main.cpp:75,86,96-99``; insert
``src/SkmerSplitter.cpp:83``; probe ``:132-136``) as a single mergeable
numpy uint64 bit array:

- insert  = set bits at k double-hashed indices (vectorized
  ``np.bitwise_or.at``) — generalizes the reference's single
  ``xorshift32 % bf_size`` hash to Kirsch–Mitzenmacher k-hash indexing
  (north rule: "identical k-hash (double-hashing) indexing").
- merge   = ``np.bitwise_or`` of word arrays — THE primitive the
  reference lacks (its q filters stay disjoint forever).
- probe   = all k bits set → zero false negatives by construction, FPR
  bounded by the published ``(1 - e^{-kn/m})^k``.

A ``ReferenceBloom`` compatibility class reproduces the reference's exact
single-hash indexing (``bit = xorshift32(s) % m``) for parity tests.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import MergeableSketch, np_frombytes, np_tobytes, register
from .hashing import double_hash_indices, to_u64, xorshift32_batch

_U64 = np.uint64


def optimal_params(n_items: int, target_fpr: float) -> tuple[int, int]:
    """(m_bits, k_hashes) sizing: m = -n ln p / (ln 2)^2 rounded up to a
    power of two; k = (m/n) ln 2.  At the 10^12-turn design point with
    p=1e-3 this is ~1.8 TB total — hence sharded/partitioned deployment
    (see operators.build) — while per-partition partials stay ~MBs."""
    if n_items <= 0:
        n_items = 1
    m = -n_items * math.log(target_fpr) / (math.log(2) ** 2)
    m_bits = 1 << max(6, math.ceil(math.log2(m)))
    k = max(1, round(m_bits / n_items * math.log(2)))
    return m_bits, int(k)


@register(1)
class BloomSketch(MergeableSketch):
    NAME = "bloom"

    def __init__(self, m_bits: int = 1 << 20, k: int = 5, words: np.ndarray | None = None):
        if m_bits & (m_bits - 1) or m_bits < 64:
            raise ValueError("m_bits must be a power of two >= 64")
        self.m_bits = int(m_bits)
        self.k = int(k)
        self.words = (
            np.zeros(m_bits // 64, dtype=_U64) if words is None else words.astype(_U64, copy=False)
        )

    @classmethod
    def create(cls, m_bits: int = 1 << 20, k: int = 5) -> "BloomSketch":
        return cls(m_bits=m_bits, k=k)

    @classmethod
    def for_capacity(cls, n_items: int, target_fpr: float = 1e-3) -> "BloomSketch":
        m, k = optimal_params(n_items, target_fpr)
        return cls(m_bits=m, k=k)

    # -- hot path (numpy only) ------------------------------------------
    def update_hashes(self, h) -> "BloomSketch":
        """Insert a batch of pre-hashed 64-bit keys (JVM xxhash64)."""
        u = to_u64(h)
        if u.size == 0:
            return self
        idx = double_hash_indices(u, self.k, self.m_bits).ravel()
        np.bitwise_or.at(self.words, (idx >> _U64(6)).astype(np.int64), _U64(1) << (idx & _U64(63)))
        return self

    def probe_hashes(self, h) -> np.ndarray:
        """might_contain for a batch of pre-hashed keys -> bool (n,)."""
        u = to_u64(h)
        if u.size == 0:
            return np.empty(0, dtype=bool)
        idx = double_hash_indices(u, self.k, self.m_bits)  # (k, n)
        bits = (self.words[(idx >> _U64(6)).astype(np.int64)] >> (idx & _U64(63))) & _U64(1)
        return bits.all(axis=0)

    # -- mergeable interface --------------------------------------------
    def merge(self, other: "BloomSketch") -> "BloomSketch":
        self._require_same_kind(other)
        if (self.m_bits, self.k) != (other.m_bits, other.k):
            raise ValueError("bloom param mismatch")
        np.bitwise_or(self.words, other.words, out=self.words)
        return self

    def estimate_cardinality(self) -> float:
        """Swamidass–Baldi fill-ratio cardinality estimate."""
        x = int(np.unpackbits(self.words.view(np.uint8)).sum())
        if x >= self.m_bits:
            return float("inf")
        return -self.m_bits / self.k * math.log(1.0 - x / self.m_bits)

    def fpr_bound(self, n_inserted: int) -> float:
        """Published (1 - e^{-kn/m})^k for n inserted keys."""
        return (1.0 - math.exp(-self.k * n_inserted / self.m_bits)) ** self.k

    def estimate(self, h) -> np.ndarray:
        return self.probe_hashes(h)

    # Adaptive payload: per-partition partials are typically sparse
    # (set bits ~ n_partition * k << m), and shipping the full dense bit
    # array per partition makes the merge I/O O(P * m/8) — the measured
    # bottleneck at m=2^26.  Sparse format stores set-bit indices
    # (uint32 when m < 2^32) so partial size is O(n_partition * k * 4B),
    # independent of m.  Dense kicks in automatically once cheaper.
    _FMT_DENSE, _FMT_SPARSE32, _FMT_SPARSE64 = 0, 1, 2

    def _set_bit_indices(self) -> np.ndarray:
        nz = np.flatnonzero(self.words)
        if nz.size == 0:
            return np.empty(0, dtype=_U64)
        out = []
        for start in range(0, nz.size, 1 << 16):  # bound temp matrix to ~32MB
            chunk = nz[start : start + (1 << 16)]
            mat = (self.words[chunk][:, None] >> np.arange(64, dtype=_U64)[None, :]) & _U64(1)
            r, c = np.nonzero(mat)
            out.append(chunk[r].astype(_U64) * _U64(64) + c.astype(_U64))
        return np.concatenate(out)

    def _payload_bytes(self) -> bytes:
        nset = int(np.count_nonzero(
            np.unpackbits(self.words.view(np.uint8))
        )) if self.words.any() else 0
        idx_width = 4 if self.m_bits <= (1 << 32) else 8
        head = struct.pack("<QI", self.m_bits, self.k)
        if nset * idx_width < self.words.nbytes:
            idx = self._set_bit_indices()
            if idx_width == 4:
                return head + struct.pack("<B", self._FMT_SPARSE32) + np_tobytes(idx.astype(np.uint32))
            return head + struct.pack("<B", self._FMT_SPARSE64) + np_tobytes(idx)
        return head + struct.pack("<B", self._FMT_DENSE) + np_tobytes(self.words)

    @classmethod
    def _from_payload(cls, payload: bytes) -> "BloomSketch":
        m_bits, k = struct.unpack_from("<QI", payload, 0)
        (fmt,) = struct.unpack_from("<B", payload, 12)
        body = payload[13:]
        if fmt == cls._FMT_DENSE:
            (words,) = np_frombytes(body, [(_U64, None)])
            return cls(m_bits=m_bits, k=k, words=words.copy())
        dtype = np.uint32 if fmt == cls._FMT_SPARSE32 else _U64
        (idx,) = np_frombytes(body, [(dtype, None)])
        sk = cls(m_bits=m_bits, k=k)
        if idx.size:
            u = idx.astype(_U64, copy=False)
            np.bitwise_or.at(sk.words, (u >> _U64(6)).astype(np.int64), _U64(1) << (u & _U64(63)))
        return sk


class ReferenceBloom:
    """Parity-exact model of one reference worker filter: 65,536 bits,
    single hash ``xorshift32(s) % m`` (``SkmerSplitter.cpp:83,132``;
    size at ``main.cpp:75``).  Test-only — strings hashed in (vectorized)
    Python, matching the C++ value-for-value."""

    def __init__(self, m_bits: int = 65536):
        self.m_bits = m_bits
        self.bits = np.zeros(m_bits, dtype=bool)

    def insert(self, strings) -> None:
        idx = xorshift32_batch(strings) % np.uint32(self.m_bits)
        self.bits[idx.astype(np.int64)] = True

    def test(self, strings) -> np.ndarray:
        idx = xorshift32_batch(strings) % np.uint32(self.m_bits)
        return self.bits[idx.astype(np.int64)]
