"""Counting Bloom filter — the deletion-capable member of the Bloom family.

The reference's filters are insert-only (``src/SkmerSplitter.cpp:62-89``
sets bits, nothing ever clears them) — fine for its one-shot corpus
scan, but a curation pipeline retracts data (documents withdrawn after
a takedown, an eval split carved OUT of an already-sketched corpus).
This sketch (Fan et al. 1998/2000, "Summary Cache") replaces each bit
with a counter so the multiset of insertions is subtractable:

- insert  = +1 at the same k Kirsch–Mitzenmacher double-hashed indices
  the plain Bloom uses (bloom.py / hashing.double_hash_indices — the
  north rule's "identical k-hash (double-hashing) indexing").
- delete  = -1 at those indices; only valid for keys actually inserted
  (enforced: a counter going negative raises instead of corrupting).
- merge   = elementwise counter ADD (associative + commutative), so
  per-partition partials combine exactly like every other sketch here.
- subtract = elementwise counter SUBTRACT — *distributed deletion*:
  build a mergeable CBF over the rows to retract (an ordinary
  build_sketches pass) and subtract it from the corpus CBF.  When the
  retracted rows are a sub-multiset of the corpus rows the result is
  COUNTER-EXACT equal to a CBF built fresh on the remainder (property-
  tested), so probes keep zero false negatives for surviving keys and
  the published (1-e^{-kn/m})^k FPR bound at the surviving n.
- probe   = all k counters > 0 (identical semantics to Bloom's bit
  test; a CBF with every counter clamped to {0,1} IS the plain Bloom).

Counters are int64 in memory (vectorized ``np.add.at`` scatter, no
wraparound ambiguity) and serialize adaptively: sparse
(index,count) pairs while the table is mostly empty — the per-partition
partial form — else a dense uint32 array.  sum(counters) == k * (net
inserted multiset size) exactly, giving an exact net-insert count for
free (``net_insert_count``).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import MergeableSketch, np_frombytes, np_tobytes, register
from .hashing import double_hash_indices, to_u64


@register(8)
class CBFSketch(MergeableSketch):
    NAME = "cbf"
    VERSION = 1

    def __init__(self, m_slots: int = 1 << 20, k: int = 5,
                 counters: np.ndarray | None = None):
        if m_slots & (m_slots - 1) or m_slots < 64:
            raise ValueError("m_slots must be a power of two >= 64")
        self.m_slots = int(m_slots)
        self.k = int(k)
        if counters is not None:
            self.counters = counters.astype(np.int64, copy=False)
        else:
            self.counters = np.zeros(m_slots, dtype=np.int64)

    @classmethod
    def create(cls, m_slots: int = 1 << 20, k: int = 5) -> "CBFSketch":
        return cls(m_slots=m_slots, k=k)

    # -- hot path --------------------------------------------------------
    def _indices(self, h) -> np.ndarray:
        u = to_u64(h)
        if u.size == 0:
            return np.empty((self.k, 0), dtype=np.int64)
        return double_hash_indices(u, self.k, self.m_slots).astype(np.int64)

    def update_hashes(self, h) -> "CBFSketch":
        """Insert a batch of pre-hashed 64-bit keys: +1 at each of the k
        indices.  A key whose k indices collide still contributes exactly
        k increments total (``np.add.at`` accumulates duplicates), so
        delete_hashes of the same key is always an exact inverse."""
        idx = self._indices(h)
        if idx.size:
            np.add.at(self.counters, idx.ravel(), 1)
        return self

    def delete_hashes(self, h) -> "CBFSketch":
        """Retract a batch of previously inserted keys (-1 at the same k
        indices).  Raises if any counter would go negative — deleting a
        key that was never inserted silently poisons a plain CBF with
        false negatives; here it is a loud error instead."""
        idx = self._indices(h)
        if idx.size:
            flat = idx.ravel()
            np.subtract.at(self.counters, flat, 1)
            # only touched slots can have gone negative (everything else
            # is >= 0 by invariant) — O(batch*k) check, not O(m_slots)
            if self.counters[flat].min() < 0:
                np.add.at(self.counters, flat, 1)  # restore
                raise ValueError("CBF delete of key(s) never inserted (counter underflow)")
        return self

    def probe_hashes(self, h) -> np.ndarray:
        """might_contain: all k counters positive -> bool (n,)."""
        u = to_u64(h)
        if u.size == 0:
            return np.empty(0, dtype=bool)
        idx = self._indices(u)
        return (self.counters[idx] > 0).all(axis=0)

    # -- mergeable interface ----------------------------------------------
    def _require_same_params(self, other: "CBFSketch") -> None:
        self._require_same_kind(other)
        if (self.m_slots, self.k) != (other.m_slots, other.k):
            raise ValueError("cbf param mismatch")

    def merge(self, other: "CBFSketch") -> "CBFSketch":
        self._require_same_params(other)
        self.counters += other.counters
        return self

    def subtract(self, other: "CBFSketch") -> "CBFSketch":
        """Distributed deletion: subtract a CBF built over the rows to
        retract.  Exact inverse of ``merge`` — requires the retracted
        multiset to be contained in this sketch's inserted multiset
        (underflow raises).  Returns a NEW sketch; operands unchanged."""
        self._require_same_params(other)
        out = self.counters - other.counters
        if out.min() < 0:
            raise ValueError("CBF subtract of rows never inserted (counter underflow)")
        return CBFSketch(m_slots=self.m_slots, k=self.k, counters=out)

    # -- estimates ---------------------------------------------------------
    def net_insert_count(self) -> int:
        """Exact net multiset size (inserts - deletes): every insert adds
        exactly k to sum(counters), every delete removes exactly k."""
        total = int(self.counters.sum())
        if total % self.k:
            raise ValueError(
                f"corrupt CBF state: sum(counters)={total} not divisible by k={self.k}"
            )
        return total // self.k

    def fpr_bound(self, n_items: int) -> float:
        """Published Bloom bound (1 - e^{-kn/m})^k — a CBF's positive-
        counter support is exactly the bit set of a plain Bloom over the
        same surviving multiset, so the bound carries over unchanged."""
        return (1.0 - math.exp(-self.k * n_items / self.m_slots)) ** self.k

    def estimate(self, h) -> np.ndarray:
        return self.probe_hashes(h)

    def resident_nbytes(self) -> int:
        # working form is the full int64 counter array regardless of how
        # sparse the wire payload was — byte-bounded caches must account
        # for THIS, not the blob length
        return self.m_slots * 8

    # -- serialization -------------------------------------------------------
    # sparse: (uint32 idx, uint32 count) of nonzero slots — the
    # per-partition partial form (O(rows*k), independent of m);
    # dense: uint32 counters — the merged-result form.
    _FMT_DENSE, _FMT_SPARSE = 0, 1
    _U32_MAX = (1 << 32) - 1

    def _payload_bytes(self) -> bytes:
        if self.counters.max(initial=0) > self._U32_MAX:
            raise ValueError("CBF counter exceeds uint32 wire range")
        head = struct.pack("<QI", self.m_slots, self.k)
        nz = np.flatnonzero(self.counters)
        if nz.size * 2 < self.m_slots:
            return (head + struct.pack("<B", self._FMT_SPARSE)
                    + np_tobytes(nz.astype(np.uint32),
                                 self.counters[nz].astype(np.uint32)))
        return (head + struct.pack("<B", self._FMT_DENSE)
                + np_tobytes(self.counters.astype(np.uint32)))

    @classmethod
    def _from_payload(cls, payload: bytes) -> "CBFSketch":
        m_slots, k = struct.unpack_from("<QI", payload, 0)
        (fmt,) = struct.unpack_from("<B", payload, 12)
        body = payload[13:]
        if fmt == cls._FMT_DENSE:
            (cnt,) = np_frombytes(body, [(np.uint32, None)])
            return cls(m_slots=m_slots, k=k, counters=cnt.astype(np.int64))
        idx, cnt = np_frombytes(body, [(np.uint32, None), (np.uint32, None)])
        sk = cls(m_slots=m_slots, k=k)
        if idx.size:
            sk.counters[idx.astype(np.int64)] = cnt.astype(np.int64)
        return sk
