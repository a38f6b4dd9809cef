"""HyperLogLog — distinct-count companion sketch (SURVEY.md §2.3).

Flajolet et al. HLL with the standard small-range linear-counting
correction.  Merge = elementwise register max (associative, commutative,
idempotent — partition-order invariant by construction).  Relative error
≈ 1.04 / sqrt(2^p).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import MergeableSketch, np_frombytes, np_tobytes, register
from .hashing import to_u64

_U64 = np.uint64


def _clz64_after_shift(w: np.ndarray) -> np.ndarray:
    """Position (1-based) of the highest set bit from the MSB side, i.e.
    rho = clz(w) + 1 for w != 0 — vectorized via 6-step binary reduction."""
    n = np.zeros(w.shape, dtype=np.int64)
    x = w.copy()
    for shift, width in ((32, 0xFFFFFFFF00000000), (16, 0xFFFF000000000000),
                         (8, 0xFF00000000000000), (4, 0xF000000000000000),
                         (2, 0xC000000000000000), (1, 0x8000000000000000)):
        mask = (x & _U64(width)) == 0
        n += np.where(mask, shift, 0)
        x = np.where(mask, x << _U64(shift), x)
    return n + 1


@register(2)
class HLLSketch(MergeableSketch):
    NAME = "hll"

    def __init__(self, p: int = 14, registers: np.ndarray | None = None):
        if not 4 <= p <= 18:
            raise ValueError("p in [4, 18]")
        self.p = int(p)
        self.m = 1 << p
        self.registers = (
            np.zeros(self.m, dtype=np.uint8) if registers is None else registers.astype(np.uint8, copy=False)
        )

    @classmethod
    def create(cls, p: int = 14) -> "HLLSketch":
        return cls(p=p)

    def update_hashes(self, h) -> "HLLSketch":
        u = to_u64(h)
        if u.size == 0:
            return self
        p = _U64(self.p)
        bucket = (u >> (_U64(64) - p)).astype(np.int64)
        w = u << p  # remaining 64-p bits shifted to MSB
        rho = np.where(w == 0, 64 - self.p + 1, _clz64_after_shift(w)).astype(np.uint8)
        np.maximum.at(self.registers, bucket, rho)
        return self

    def merge(self, other: "HLLSketch") -> "HLLSketch":
        self._require_same_kind(other)
        if self.p != other.p:
            raise ValueError("hll p mismatch")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}[m]
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))
        raw = alpha * m * m / inv.sum()
        if raw <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                return m * math.log(m / zeros)  # linear counting
        return float(raw)

    def rel_error_bound(self) -> float:
        return 1.04 / math.sqrt(self.m)

    def copy(self) -> "HLLSketch":
        return HLLSketch(p=self.p, registers=self.registers.copy())

    def estimate_union(self, other: "HLLSketch") -> float:
        """|A ∪ B| — merge is union, so this is exact sketch algebra
        (register max on copies; neither operand is mutated)."""
        return self.copy().merge(other).estimate()

    def estimate_intersection(self, other: "HLLSketch") -> float:
        """|A ∩ B| by inclusion–exclusion on the estimates. Error is
        ADDITIVE in the union size (~1.04/sqrt(m) * |A∪B|), so the
        relative error blows up for small intersections of large sets —
        callers should bound-check against eps * |A∪B|, not eps * |A∩B|
        (standard HLL set-algebra caveat)."""
        return max(0.0, self.estimate() + other.estimate() - self.estimate_union(other))

    def _payload_bytes(self) -> bytes:
        return struct.pack("<I", self.p) + np_tobytes(self.registers)

    @classmethod
    def _from_payload(cls, payload: bytes) -> "HLLSketch":
        (p,) = struct.unpack_from("<I", payload, 0)
        (regs,) = np_frombytes(payload[4:], [(np.uint8, None)])
        return cls(p=p, registers=regs.copy())
