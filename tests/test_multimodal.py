"""Multimodal plumbing tests: schema/batch shape of the stubbed decode,
deterministic fake features, byte-aware partitioning, frame-sample fanout,
and the NotImplementedError seam for real codecs."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bloomfilter_multithread_spark.operators.multimodal import (
    FEATURE_DIM,
    _fake_decode,
    decode_bmp,
    decode_stats,
    decode_wav,
    encode_bmp,
    encode_wav,
    extract_features,
    frame_sample_plan,
    media_repartition,
    synth_media,
    synth_real_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, n=60, seed=42).cache()


def test_extract_features_schema_and_determinism(spark, media):
    out = extract_features(media, dim=16)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 60
    for r in rows.values():
        assert len(r["feature"]) == 16
    # determinism: same payload -> same feature, twice
    again = {r["media_id"]: r for r in extract_features(media, dim=16).collect()}
    assert all(rows[k]["feature"] == again[k]["feature"] for k in rows)


def test_fake_decode_matches_row_wise(spark, media):
    row = media.where("media_id = 3").first()
    expected = _fake_decode(bytes(row["payload"]), FEATURE_DIM)
    got = extract_features(media.where("media_id = 3")).first()["feature"]
    assert np.allclose(expected, got, atol=1e-6)


def test_real_decoder_seam_raises(spark, media):
    with pytest.raises(Exception) as exc_info:
        extract_features(media.limit(2), decode_stub=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_frame_sample_fanout(spark, media):
    plan = frame_sample_plan(media, every_ms=1000)
    got = plan.groupBy("media_id").count().collect()
    vids = {r["media_id"]: r["duration_ms"] for r in media.where("kind = 'video'").collect()}
    assert {r["media_id"] for r in got} == set(vids)
    for r in got:
        dur = vids[r["media_id"]]
        assert r["count"] == max(dur - 1, 0) // 1000 + 1


def test_media_repartition_sample_path_is_byte_aware(spark, media):
    # in-memory frame -> no input files -> sampled-length sizing
    # (sample_frac=1.0 makes the estimate exact for the assertion)
    out = media_repartition(media, target_bytes=1 << 10, sample_frac=1.0)
    total = media.select(F.sum(F.length("payload"))).first()[0]
    import math

    assert out.rdd.getNumPartitions() == math.ceil(total / (1 << 10))


class TestRealCodecs:
    """Round-4 real trivial-format codecs: pure-numpy BMP and WAV
    encode/decode (the NotImplementedError seam now covers only formats
    that genuinely need external libraries)."""

    def test_bmp_roundtrip_exact(self):
        rng = np.random.default_rng(7)
        for h, w in [(1, 1), (2, 7), (5, 4), (13, 16), (11, 3)]:
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            assert (decode_bmp(encode_bmp(px)) == px).all(), (h, w)

    def test_bmp_roundtrip_hypothesis(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=30, deadline=None)
        @given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
        def prop(h, w, seed):
            px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
            assert (decode_bmp(encode_bmp(px)) == px).all()

        prop()

    def test_bmp_top_down_rows(self):
        """Negative header height = top-down row order — decoders that
        always flip get this wrong."""
        px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
        buf = bytearray(encode_bmp(px))
        # rewrite height to -2 and un-flip the stored rows
        stride = (3 * 3 + 3) & ~3
        rows = np.frombuffer(bytes(buf[54:]), dtype=np.uint8).reshape(2, stride)
        buf[22:26] = (-2).to_bytes(4, "little", signed=True)
        buf[54:] = rows[::-1].tobytes()
        assert (decode_bmp(bytes(buf)) == px).all()

    def test_bmp_rejects_junk_and_truncation(self):
        with pytest.raises(ValueError):
            decode_bmp(b"not a bmp at all" * 10)
        good = encode_bmp(np.zeros((4, 4, 3), dtype=np.uint8))
        with pytest.raises(ValueError):
            decode_bmp(good[:-5])

    def test_wav_roundtrip_hypothesis(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=30, deadline=None)
        @given(st.integers(1, 2000), st.integers(0, 2**32 - 1),
               st.sampled_from([8000, 16000, 44100]))
        def prop(n, seed, rate):
            s = (np.random.default_rng(seed)
                 .integers(-(2**15), 2**15, n).astype(np.int16))
            got_rate, got = decode_wav(encode_wav(s, rate))
            assert got_rate == rate and (got == s).all()

        prop()

    def test_wav_roundtrip_and_chunk_walk(self):
        rng = np.random.default_rng(11)
        s = rng.integers(-(2**15), 2**15, 333).astype(np.int16)
        payload = encode_wav(s, 16000)
        rate, out = decode_wav(payload)
        assert rate == 16000 and (out == s).all()
        # insert an unknown odd-sized chunk before fmt: the walker must
        # skip it (word-aligned) rather than assume the canonical layout
        junk = b"LIST" + (5).to_bytes(4, "little") + b"abcde" + b"\x00"
        body = junk + payload[12:]
        weird = b"RIFF" + len(b"WAVE" + body).to_bytes(4, "little") + b"WAVE" + body
        rate2, out2 = decode_wav(weird)
        assert rate2 == 16000 and (out2 == s).all()

    def test_real_media_decode_stats_match_formula(self, spark):
        """End-to-end: synth real containers in one mapInPandas pass,
        parse them back in another, and check the decoded-value stats
        against the closed-form formula computed in plain numpy."""
        ids = spark.range(40).select(F.col("id").alias("media_id"))
        media = synth_real_media(ids, "media_id")
        got = {r["media_id"]: r for r in decode_stats(media).collect()}
        assert len(got) == len([i for i in range(40) if i % 3 != 2])
        for mid in range(40):
            if mid % 3 == 0:
                w, h = 4 + mid % 13, 4 + mid % 11
                y, x, c = np.ogrid[0:h, 0:w, 0:3]
                v = ((mid * 7 + x * 3 + y * 5 + c * 11) % 256).astype(np.int64).ravel()
                kind = "image"
            elif mid % 3 == 1:
                i = np.arange(64 + mid % 64, dtype=np.int64)
                v = (mid * 13 + i * 7919) % 4096 - 2048
                kind = "audio"
            else:
                assert mid not in got
                continue
            r = got[mid]
            assert (r["kind"], r["units"], r["val_sum"], r["val_min"], r["val_max"]) == (
                kind, int(v.size), int(v.sum()), int(v.min()), int(v.max())
            ), mid

    def test_extract_features_real_path(self, spark):
        """decode_stub=False now actually decodes trivial formats; the
        header elements of the feature vector carry the real decoded
        dimensions."""
        ids = spark.range(12).select(F.col("id").alias("media_id"))
        media = synth_real_media(ids, "media_id")
        out = {r["media_id"]: r["feature"]
               for r in extract_features(media, decode_stub=False).collect()}
        for mid, feat in out.items():
            assert len(feat) == FEATURE_DIM
            if mid % 3 == 0:
                assert feat[:4] == [4 + mid % 13, 4 + mid % 11, 3.0, 24.0]
            else:
                assert feat[:4] == [64 + mid % 64, 8000.0, 1.0, 16.0]

    def test_seam_still_raises_for_compressed_formats(self, spark, media):
        """The NotImplementedError seam is still there for mimes with no
        trivial decoder (synth_media's application/octet-stream)."""
        with pytest.raises(Exception) as exc_info:
            extract_features(media.limit(2), decode_stub=False).collect()
        assert "NotImplementedError" in str(exc_info.value) or isinstance(
            exc_info.value, NotImplementedError
        )


def test_media_repartition_file_sizing_reads_no_data(spark, media, tmp_path, monkeypatch):
    """File-backed sizing must come from filesystem metadata only — no
    sample, no payload scan (VERDICT.md 'What's wrong' #1)."""
    import glob
    import math
    import os

    from pyspark.sql import DataFrame

    p = str(tmp_path / "media_pq")
    media.write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)

    def _no_scan(self, *a, **k):
        raise AssertionError("sizing must not scan data rows")

    monkeypatch.setattr(DataFrame, "sample", _no_scan)
    out = media_repartition(df, target_bytes=1 << 12)
    disk = sum(os.path.getsize(f) for f in glob.glob(os.path.join(p, "*.parquet")))
    assert out.rdd.getNumPartitions() == math.ceil(disk / (1 << 12))


def test_synth_real_media_video_only_batch_yields_empty_cleanly(spark):
    """A batch containing only id % 3 == 2 (video) rows produces ZERO
    synth rows — the empty pandas frame must still cross Arrow with the
    declared schema (dtype-pinned, not inferred from an empty object
    column)."""
    ids = spark.range(20).select((F.col("id") * 3 + 2).alias("media_id"))
    media = synth_real_media(ids, "media_id")
    assert media.count() == 0
    assert decode_stats(media).count() == 0


class TestMediaNearDup:
    """Round-5 perceptual dedup: dHash over DECODED pixels + the shared
    banded-Hamming machinery."""

    def test_dhash_survives_the_codec_roundtrip(self, spark):
        """dhash(decode_bmp(encode_bmp(grid))) == dhash computed on the
        formula grid directly — the signature reads the DECODED pixels,
        so a stride/flip/channel-order bug would shift it."""
        import numpy as np

        from bloomfilter_multithread_spark.operators.multimodal import (
            DHASH_GRID_H,
            DHASH_GRID_W,
            dhash_signatures,
            synth_textured_images,
            texture_pixel_grid,
        )

        ids = spark.createDataFrame([(i,) for i in range(0, 90, 3)],
                                    "media_id long")
        media = synth_textured_images(ids)
        got = {r["media_id"]: r["dhash"]
               for r in dhash_signatures(media).collect()}

        def model(base, pert):
            w, h = 4 + base % 13, 4 + base % 11
            gray = texture_pixel_grid(base, w, h, pert).astype(np.int64).sum(axis=2)
            sy = (np.arange(DHASH_GRID_H) * h) // DHASH_GRID_H
            sx = (np.arange(DHASH_GRID_W) * w) // DHASH_GRID_W
            cells = gray[np.ix_(sy, sx)]
            sig = 0
            for gy in range(DHASH_GRID_H):
                for gx in range(DHASH_GRID_W - 1):
                    idx = gy * (DHASH_GRID_W - 1) + gx
                    if idx < 63 and cells[gy, gx + 1] > cells[gy, gx]:
                        sig |= 1 << idx
            return sig

        assert len(got) > 30  # bases + twins
        for mid, sig in got.items():
            base = mid - 1_000_000 if mid >= 1_000_000 else mid
            assert sig == model(base, mid >= 1_000_000), mid

    def test_planted_twins_found_and_nothing_else_at_gate_scale(self, spark):
        from bloomfilter_multithread_spark.operators.multimodal import (
            TWIN_OFFSET,
            media_near_dups,
            synth_textured_images,
        )

        ids = spark.createDataFrame([(i,) for i in range(500)], "media_id long")
        pairs = media_near_dups(synth_textured_images(ids)).collect()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        want = {(i, i + TWIN_OFFSET) for i in range(0, 500, 15)}
        assert got == want
        assert all(r["hamming"] <= 1 for r in pairs)

    def test_no_exchange_carries_payload_or_pixels(self, spark):
        """The BMP bytes die inside the signature stage: every exchange
        in the near-dup plan carries (id, dhash, band) longs only."""
        import re

        from bloomfilter_multithread_spark.operators.multimodal import (
            media_near_dups,
            synth_textured_images,
        )

        ids = spark.createDataFrame([(i,) for i in range(60)], "media_id long")
        df = media_near_dups(synth_textured_images(ids))
        fmt = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        assert "CartesianProduct" not in fmt
        assert "BroadcastNestedLoopJoin" not in fmt
        for sec in re.split(r"\n\(\d+\) ", "\n" + fmt):
            head = sec.split("\n", 1)[0].strip()
            if not head.startswith("Exchange"):
                continue
            m = re.search(r"Input \[\d+\]: \[([^\]]*)\]", sec)
            cols = m.group(1) if m else ""
            assert not re.search(r"(payload|pixel)#", cols), (head, cols)


class TestAudioNearDup:
    """Round-5 perceptual audio dedup: waveform-gradient fingerprints
    over DECODED PCM samples + the shared banded-Hamming machinery —
    the audio twin of TestMediaNearDup."""

    def test_fingerprint_survives_the_codec_roundtrip(self, spark):
        """afp(decode_wav(encode_wav(samples))) == afp computed on the
        formula samples directly — the fingerprint reads the DECODED
        int16 stream, so a byte-order/header-offset bug would shift
        it."""
        from bloomfilter_multithread_spark.operators.multimodal import (
            AUDIO_FP_POINTS,
            audio_fingerprints,
            synth_textured_audio,
            texture_audio_samples,
        )

        ids = spark.createDataFrame([(i,) for i in range(1, 91, 3)],
                                    "media_id long")
        media = synth_textured_audio(ids)
        got = {r["media_id"]: r["afp"]
               for r in audio_fingerprints(media).collect()}

        def model(base, pert):
            n = 64 + base % 64
            s = texture_audio_samples(base, n, pert).astype(np.int64)
            pos = (np.arange(AUDIO_FP_POINTS + 1, dtype=np.int64) * n) \
                // (AUDIO_FP_POINTS + 1)
            v = s[pos]
            sig = 0
            for j in range(63):
                if v[j + 1] > v[j]:
                    sig |= 1 << j
            return sig

        assert len(got) > 30  # bases + twins
        for mid, sig in got.items():
            base = mid - 1_000_000 if mid >= 1_000_000 else mid
            assert sig == model(base, mid >= 1_000_000), mid

    def test_planted_twins_found_and_nothing_else_at_gate_scale(self, spark):
        from bloomfilter_multithread_spark.operators.multimodal import (
            TWIN_OFFSET,
            audio_near_dups,
            synth_textured_audio,
        )

        ids = spark.createDataFrame([(i,) for i in range(500)], "media_id long")
        pairs = audio_near_dups(synth_textured_audio(ids)).collect()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        want = {(i, i + TWIN_OFFSET) for i in range(1, 500, 15)}
        assert got == want
        assert all(r["hamming"] <= 1 for r in pairs)

    def test_no_exchange_carries_payload_or_samples(self, spark):
        """The WAV bytes die inside the fingerprint stage: every
        exchange in the near-dup plan carries (id, afp, band) longs
        only."""
        import re

        from bloomfilter_multithread_spark.operators.multimodal import (
            audio_near_dups,
            synth_textured_audio,
        )

        ids = spark.createDataFrame([(i,) for i in range(60)], "media_id long")
        df = audio_near_dups(synth_textured_audio(ids))
        fmt = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        assert "CartesianProduct" not in fmt
        assert "BroadcastNestedLoopJoin" not in fmt
        for sec in re.split(r"\n\(\d+\) ", "\n" + fmt):
            head = sec.split("\n", 1)[0].strip()
            if not head.startswith("Exchange"):
                continue
            m = re.search(r"Input \[\d+\]: \[([^\]]*)\]", sec)
            cols = m.group(1) if m else ""
            assert not re.search(r"(payload|sample)#", cols), (head, cols)
