"""Multimodal plumbing: schema, fan-out shape, determinism, and the
feature-vector handoff into the similarity operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _payloads(spark):
    from tez_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    return docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    ).limit(50)


def test_extract_features_schema_and_norm(spark):
    from tez_spark.operators.multimodal import FEATURE_BINS, extract_features

    out = extract_features(_payloads(spark)).collect()
    assert len(out) == 50
    for r in out:
        assert len(r.feature) == FEATURE_BINS
        assert abs(sum(r.feature) - 1.0) < 1e-9


def test_frame_sample_fanout(spark):
    from tez_spark.operators.multimodal import frame_sample

    out = frame_sample(_payloads(spark), n_frames=4)
    counts = out.groupBy("doc_id").count().collect()
    assert all(1 <= r["count"] <= 4 for r in counts)
    assert out.schema["frame"].dataType.simpleString() == "binary"


def test_resize_fixed_size(spark):
    from tez_spark.operators.multimodal import resize_image

    out = resize_image(_payloads(spark), 8, 8).collect()
    assert all(len(r.pixels) == 64 for r in out)


def test_real_decode_path_is_marked(spark):
    """The non-fake path must fail loudly, not silently fake."""
    import pytest

    from tez_spark.operators.multimodal import decode_image_meta

    df = decode_image_meta(_payloads(spark), fake=False)
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        df.collect()


def test_features_feed_similarity(spark):
    """Extracted feature vectors run through the ANN brute-force operator
    unchanged — the multimodal->similarity pipeline handoff."""
    from tez_spark.operators.multimodal import extract_features
    from tez_spark.operators.similarity import brute_force_topk

    feats = extract_features(_payloads(spark)).withColumnRenamed(
        "doc_id", "vec_id"
    )
    queries = feats.filter(F.col("vec_id") < 3)
    out = brute_force_topk(feats, queries, k=3, vec_col="feature")
    rows = out.collect()
    assert {r.q_id for r in rows} <= {0, 1, 2}
    assert all(r.rn <= 3 for r in rows)
