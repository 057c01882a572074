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
