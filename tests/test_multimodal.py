"""Multimodal plumbing: FakeCodec determinism, frame-sample
cardinality, RealCodec stub contract (SURVEY §2.10)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from social_media_data_pipeline_recession_political_sentiment_spark.operators.multimodal import (
    FRAME_BYTES,
    FakeCodec,
    RealCodec,
)
from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries
from tests.conftest import SF_SMOKE


def test_fake_codec_exact_stats():
    payload = bytes(range(10))  # sum 45
    out = FakeCodec().decode_stats(pd.Series([payload, b""]))
    assert out["byte_sum"].tolist() == [45, 0]
    assert out["n_frames"].tolist() == [10 // FRAME_BYTES + 1, 1]
    assert out["mean_byte"].tolist() == [4.5, 0.0]


def test_real_codec_is_an_explicit_stub():
    with pytest.raises(NotImplementedError):
        RealCodec().decode_stats(pd.Series([b"x"]))


def test_decode_stub_matches_local_computation(spark):
    out = queries()["ext_mm_decode_stub"](spark, SF_SMOKE).limit(5).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50).collect()
    }
    for r in out:
        raw = docs[r.doc_id].encode()
        assert r.byte_sum == int(np.frombuffer(raw, dtype=np.uint8).sum())
        assert r.n_frames == len(raw) // FRAME_BYTES + 1


def test_frame_sample_cardinality(spark):
    out = queries()["ext_mm_frame_sample"](spark, SF_SMOKE)
    per_doc = out.groupBy("doc_id").count().collect()
    docs = {
        r.doc_id: len(r.text.encode())
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    for r in per_doc[:20]:
        n = docs[r.doc_id]
        expected = len(range(0, n, FRAME_BYTES * 2))
        assert r["count"] == expected


def test_pair_filter_decision_surface(spark):
    """ext_mm_pair_filter invariants: only image-typed docs can be
    kept, every keep satisfies all four gates when recomputed from
    the emitted features, and the fixture exercises both outcomes."""
    from tests.conftest import SF_SMOKE

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.multimodal import (
        ASPECT_MAX,
        MIN_CAPTION_WORDS,
        MIN_PIXELS,
    )
    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries

    rows = queries()["ext_mm_pair_filter"](spark, SF_SMOKE).collect()
    assert rows
    kept = [r for r in rows if r.keep]
    dropped = [r for r in rows if not r.keep]
    assert kept and dropped  # fixture exercises both branches
    for r in rows:
        expect = (
            r.is_image
            and r.n_pixels >= MIN_PIXELS
            and 1.0 / ASPECT_MAX <= r.aspect <= ASPECT_MAX
            and r.caption_words >= MIN_CAPTION_WORDS
        )
        assert r.keep == expect, r.doc_id
    # non-images can never be kept
    assert all(r.is_image for r in kept)


def test_phash_finds_planted_reencodes_within_bound(spark):
    """ext_mm_dedup_phash: every emitted pair is ordered and within
    the Hamming bound, and the planted one-byte re-encodes are found
    at high recall (the odd pair legitimately drifts past 3 bits)."""
    from tests.conftest import SF_SMOKE

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.multimodal import (
        PHASH_HAMMING_MAX,
        PHASH_REENC_MOD,
        PHASH_REENC_OFFSET,
    )
    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries

    rows = queries()["ext_mm_dedup_phash"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0 <= r.hamming <= PHASH_HAMMING_MAX
    found = {(r.doc_a, r.doc_b) for r in rows}
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    planted = {
        (r.doc_id, r.doc_id + PHASH_REENC_OFFSET)
        for r in docs.filter(
            (F.col("doc_id") % PHASH_REENC_MOD == 0) & (F.length("text") > 1)
        ).collect()
    }
    assert planted
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9, recall


def test_phash_cluster_keepers_and_reencode_collapse(spark):
    """ext_mm_phash_cluster: exactly one keeper per component, the
    keeper is the component minimum, every media id appears once,
    and planted re-encode pairs that the miner found share their
    original's cluster."""
    from tests.conftest import SF_SMOKE

    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries

    rows = queries()["ext_mm_phash_cluster"](spark, SF_SMOKE).collect()
    assert rows
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append(r)
    for comp, members in by_comp.items():
        keepers = [m for m in members if m.is_keeper]
        assert len(keepers) == 1
        assert keepers[0].media_id == comp == min(m.media_id for m in members)
    pairs = queries()["ext_mm_dedup_phash"](spark, SF_SMOKE).collect()
    comp_of = {r.media_id: r.component for r in rows}
    assert len(comp_of) == len(rows)
    for p in pairs:
        assert comp_of[p.doc_a] == comp_of[p.doc_b]
    assert len(by_comp) < len(rows)  # some clusters are non-trivial


def test_audio_segments_zero_byte_payload_emits_nothing(spark, tmp_path):
    """A zero-byte media payload produces NO segments (regression:
    sequence(0, -1) auto-steps down and fabricated seg_idx -1/0 rows
    where the oracle's generate_series is empty)."""
    from social_media_data_pipeline_recession_political_sentiment_spark.registry import (
        queries,
    )

    work = str(tmp_path / "sfzero")
    spark.createDataFrame(
        [(1, "", "src0", 0), (2, "abcd" * 10000, "src0", 40000)],
        "doc_id long, text string, source string, n_chars long",
    ).write.parquet(f"{work}/documents.parquet")
    rows = queries()["ext_mm_audio_segments"](spark, work).collect()
    assert all(r.doc_id == 2 for r in rows)  # doc 1: zero bytes, no segments
    assert len(rows) == 6  # 40000 bytes * 4 ms = 160 s -> 6 x 30 s chunks
    assert min(r.seg_idx for r in rows) == 0
    assert max(r.end_ms for r in rows) == 160000


def test_mm_exact_dedup_groups_identical_payloads(spark):
    """Byte-identical payloads collapse to one CAS object with the
    min doc_id as keeper and the duplicate bytes accounted; distinct
    payloads stay singletons with zero reclaim."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.multimodal import (
        ext_mm_dedup_exact,
    )

    rows = [
        (5, "same bytes here", "en", "s", 15),
        (2, "same bytes here", "en", "s", 15),
        (9, "same bytes here", "en", "s", 15),
        (3, "different", "en", "s", 9),
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_mmx_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = {r.doc_id: r for r in ext_mm_dedup_exact(spark, tmp).collect()}
    assert set(out) == {2, 3}
    assert out[2].n_copies == 3
    assert out[2].dup_bytes == 2 * len(b"same bytes here")
    assert out[3].n_copies == 1 and out[3].dup_bytes == 0


def test_tile_plan_ceil_division_and_pad(spark):
    """ext_mm_tile_plan: grid is ceil(w/16) x ceil(h/16), seq_len
    adds the CLS token, pad_px is the edge-tile overhang."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.multimodal import (
        ext_mm_tile_plan,
    )

    # doc_id % 3 == 0 -> image; n_chars=100 -> w=116, h=116
    rows = [(0, "irrelevant", "en", "s", 100), (1, "skip", "en", "s", 50),
            (3, "x", "en", "s", 640)]  # w = 640%640+16 = 16, h = 640%480+16 = 176
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_tile_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = {r.doc_id: r for r in ext_mm_tile_plan(spark, tmp).collect()}
    assert set(out) == {0, 3}  # only image rows planned
    r = out[0]
    assert (r.width, r.height) == (116, 116)
    assert (r.tiles_x, r.tiles_y, r.n_tiles, r.seq_len) == (8, 8, 64, 65)
    assert r.pad_px == 128 * 128 - 116 * 116
    r3 = out[3]
    assert (r3.tiles_x, r3.tiles_y) == (1, 11)
    assert r3.pad_px == 16 * 176 - 16 * 176  # both dims already multiples
