"""Multimodal plumbing: schema, batch shape, determinism, multiplicity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from optimized_climate_data_integration_with_real_time_llm_querying_spark.catalog import (
    load_table,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.operators import (
    multimodal as mm,
)


@pytest.fixture(scope="module")
def media(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").limit(50)
    return mm.synthesize_media(docs).cache()


def test_media_schema(media):
    assert dict((f.name, f.dataType.simpleString()) for f in media.schema.fields)[
        "media"
    ] == "binary"
    meta_type = media.schema["media_meta"].dataType
    assert [f.name for f in meta_type.fields] == [
        "mime",
        "width",
        "height",
        "n_frames",
        "sample_rate",
    ]


def test_feature_extraction_deterministic(media):
    f1 = {r["doc_id"]: r["features"] for r in mm.extract_features(media).collect()}
    f2 = {r["doc_id"]: r["features"] for r in mm.extract_features(media).collect()}
    assert f1 == f2
    assert all(len(v) == 8 for v in f1.values())
    assert all(0.0 <= x < 1.0 for v in f1.values() for x in v)
    # payload-dependent: distinct texts -> distinct features
    assert len({tuple(v) for v in f1.values()}) > 1


def test_real_decoder_is_explicit_stub(media):
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        mm.extract_features(media, decoder="real").collect()


def test_frame_sampling_multiplicity(media):
    frames = mm.sample_frames(media, every_n=10)
    per_doc = {
        r["doc_id"]: r["n"]
        for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    metas = {r["doc_id"]: r["media_meta"]["n_frames"] for r in media.collect()}
    assert per_doc.keys() == metas.keys()
    for doc_id, n_frames in metas.items():
        expected = len(range(0, n_frames, 10))
        assert per_doc[doc_id] == expected
    # frames are distinct binaries per (doc, idx)
    sample = frames.limit(20).collect()
    assert len({bytes(r["frame"]) for r in sample}) == len(sample)


def test_fit_within_dimension_math():
    # aspect preserved, never upscaled, floored at 1px
    assert mm.fit_within(64, 32, 32, 32) == (32, 16)
    assert mm.fit_within(32, 64, 32, 32) == (16, 32)
    assert mm.fit_within(10, 10, 32, 32) == (10, 10)  # no upscale
    assert mm.fit_within(1000, 1, 32, 32) == (32, 1)
    with pytest.raises(ValueError, match="invalid source"):
        mm.fit_within(0, 5, 32, 32)


def test_resize_media_updates_meta_and_is_deterministic(media):
    r1 = {r["doc_id"]: r for r in mm.resize_media(media, 24, 24).collect()}
    r2 = {r["doc_id"]: r for r in mm.resize_media(media, 24, 24).collect()}
    src = {r["doc_id"]: r["media_meta"] for r in media.collect()}
    assert r1.keys() == src.keys()
    for doc_id, row in r1.items():
        meta = row["media_meta"]
        w, h = meta["width"], meta["height"]
        assert w <= 24 and h <= 24
        assert (w, h) == mm.fit_within(src[doc_id]["width"], src[doc_id]["height"], 24, 24)
        # passthrough fields survive the rewrite
        assert meta["mime"] == src[doc_id]["mime"]
        assert meta["n_frames"] == src[doc_id]["n_frames"]
        assert bytes(row["media"]) == bytes(r2[doc_id]["media"])
    # resized payloads are payload+dims dependent -> distinct
    assert len({bytes(r["media"]) for r in r1.values()}) > 1
    with pytest.raises(Exception, match="NotImplementedError|Pillow"):
        mm.resize_media(media, decoder="real").collect()


def test_media_dedup_report_collapses_injected_copies(spark, tmp_path):
    """The registered media_dedup_report runs on testdata with no
    exact duplicates (all groups are singletons, like
    exact_dedup_docs); this proves the collapse path on injected
    copies — including whitespace/case variants that only match
    after normalization — and that copies share identical Arrow-path
    features."""
    rows = [
        (1, "The Quick   Brown fox"),
        (2, "the quick brown fox"),     # normalizes equal to 1
        (3, "a completely different document"),
        (4, "  THE QUICK BROWN FOX  "), # also equal after normalize
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.queries import (
        all_queries,
    )

    out = all_queries()["media_dedup_report"].builder(spark, str(tmp_path)).collect()
    by_copies = {r.n_copies: r for r in out}
    assert len(out) == 2
    assert by_copies[3].keep_id == 1     # min doc_id wins
    assert by_copies[1].keep_id == 3
    # Copies produced identical featurizer output (single value per group
    # survived the MIN aggregate; spot-check range).
    for r in out:
        assert 0.0 <= r.feat0 < 1.0 and 0.0 <= r.feat1 < 1.0
