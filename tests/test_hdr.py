"""HDR histogram sketch: exact-small-value region, multiplicative error
contract, merge law (byte-exact, order-independent), serde, and the
integer-vs-float ceil rank trap that quantile_frac exists to avoid."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bloomfilter_multithread_spark.sketches import MergeableSketch, merge_all
from bloomfilter_multithread_spark.sketches.hdr import HDRSketch

RNG = np.random.default_rng(42)


def _bucket_width(s: HDRSketch, idx: int) -> int:
    if idx < (1 << (s.sub_bits + 1)):
        return 1
    shift = (idx >> s.sub_bits) - 1
    return 1 << shift


class TestMapping:
    def test_small_values_exact(self):
        s = HDRSketch.create(sub_bits=5)
        v = np.arange(0, (1 << 6) - 1, dtype=np.int64)  # w = v+1 < 2^6
        idx = s.bucket_of(v)
        # distinct values -> distinct buckets, and decode is the identity
        assert len(np.unique(idx)) == len(v)
        assert all(s.lower_bound_of(int(i)) == int(x) for i, x in zip(idx, v))

    def test_bounds_and_relative_width(self):
        s = HDRSketch.create(sub_bits=5, max_bits=40)
        v = RNG.integers(0, 1 << 39, size=20_000, dtype=np.int64)
        idx = s.bucket_of(v)
        for i, x in zip(idx[:2000], v[:2000]):
            lb = s.lower_bound_of(int(i))
            width = _bucket_width(s, int(i))
            assert lb <= x < lb + width
            # multiplicative contract: width <= max(1, w_lo * 2^-s)
            assert width <= max(1, (lb + 1) >> s.sub_bits)

    def test_blocks_are_collision_free(self):
        s = HDRSketch.create(sub_bits=3, max_bits=20)
        v = np.arange(0, (1 << 20) - 1, dtype=np.int64)  # w = v+1 <= 2^20 - 1
        idx = s.bucket_of(v)
        # mapping is monotone non-decreasing and decode(bucket) <= v
        assert (np.diff(idx) >= 0).all()
        assert int(idx.max()) < s.n_buckets

    def test_domain_errors(self):
        s = HDRSketch.create(sub_bits=5, max_bits=20)
        with pytest.raises(ValueError):
            s.bucket_of(np.array([-1], dtype=np.int64))
        with pytest.raises(ValueError):
            s.bucket_of(np.array([1 << 25], dtype=np.int64))


class TestQuantiles:
    def test_rank_contract(self):
        s = HDRSketch.create(sub_bits=5, max_bits=40)
        data = np.floor(RNG.lognormal(6, 2, 100_000)).astype(np.int64)
        s.update_values(data.astype(np.float64))
        srt = np.sort(data)
        for num, den in [(1, 100), (1, 4), (1, 2), (3, 4), (19, 20), (99, 100)]:
            est = s.quantile_frac(num, den)
            true = int(srt[(num * len(srt) + den - 1) // den - 1])
            assert est <= true
            # est is the lower bound of true's bucket: true < est+width
            idx = int(s.bucket_of(np.array([true]))[0])
            assert true < est + _bucket_width(s, idx)
            assert true <= est * (1 + 2.0 ** -s.sub_bits) + 1

    def test_float_ceil_trap(self):
        # float rank math breaks once n exceeds 2^53 (the 100-TB-scale
        # regime float can't count rows in): n = 2^53 + 1, q = 1/2 —
        # float(n) rounds to 2^53, so ceil(0.5 * n) loses rank 1
        import math

        n = 2**53 + 1
        assert math.ceil(0.5 * n) == 2**52  # the trap is real
        assert (1 * n + 1) // 2 == 2**52 + 1  # integer ceil is right
        s = HDRSketch.create(sub_bits=5)
        s.update_values(np.arange(1, 21, dtype=np.float64))
        # rank 19 -> value 19 in the exact region; Fraction path agrees
        assert s.quantile_frac(19, 20) == 19
        assert s.quantile(0.95) == 19

    def test_unit_scale_floor(self):
        s = HDRSketch.create(sub_bits=5, unit_scale=1000)
        s.update_values(np.array([0.0015, 1.9999, 490.02]))
        # floor(v*1000): 1, 1999, 490020 — all in range, n counted
        assert s.n_total == 3
        assert s.quantile_frac(1, 3) == 1


class TestMergeSerde:
    def test_merge_law_byte_exact(self):
        data = np.floor(RNG.lognormal(5, 2, 50_000)).astype(np.float64)
        whole = HDRSketch.create(sub_bits=5).update_values(data)
        def mk():
            return [
                HDRSketch.create(sub_bits=5).update_values(c)
                for c in np.array_split(data, 16)
            ]

        # merge_all folds in place, so build fresh parts per fold
        merged = merge_all(mk())
        rev = merge_all(mk()[::-1])
        assert merged.to_bytes() == whole.to_bytes() == rev.to_bytes()
        assert merged.n_total == len(data)

    def test_serde_roundtrip(self):
        s = HDRSketch.create(sub_bits=5, max_bits=40, unit_scale=1000)
        s.update_values(RNG.uniform(0, 500, 10_000))
        s2 = MergeableSketch.from_bytes(s.to_bytes())
        assert isinstance(s2, HDRSketch)
        assert s2.to_bytes() == s.to_bytes()
        for num, den in [(1, 2), (19, 20), (99, 100)]:
            assert s2.quantile_frac(num, den) == s.quantile_frac(num, den)

    def test_geometry_mismatch_raises(self):
        a = HDRSketch.create(sub_bits=5)
        b = HDRSketch.create(sub_bits=6)
        with pytest.raises(ValueError):
            a.merge(b)

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.integers(0, 10**9), min_size=1, max_size=200))
    def test_property_est_is_bucket_floor_of_true(self, xs):
        s = HDRSketch.create(sub_bits=4, max_bits=40)
        arr = np.array(xs, dtype=np.int64)
        s.update_values(arr.astype(np.float64))
        srt = np.sort(arr)
        for num, den in [(1, 2), (9, 10)]:
            est = s.quantile_frac(num, den)
            true = int(srt[(num * len(srt) + den - 1) // den - 1])
            tb = int(s.bucket_of(np.array([true]))[0])
            assert est == s.lower_bound_of(tb)
