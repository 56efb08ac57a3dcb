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
    """Where PIL is absent the non-fake path must fail loudly, not
    silently fake (where PIL IS present, the real branch is exercised by
    the PIL-gated tests below instead)."""
    import pytest

    from tez_spark.operators.multimodal import _pil_image, decode_image_meta

    if _pil_image() is not None:
        pytest.skip("PIL installed — real branch covered by PIL-gated tests")
    df = decode_image_meta(_payloads(spark), fake=False)
    with pytest.raises(Exception, match="NotImplementedError|requires PIL"):
        df.collect()


def test_pil_decode_reads_real_png_dimensions(spark):
    """PIL branch (runs only where PIL is installed): generated PNGs of
    known sizes come back with their TRUE width/height and intact
    checksum through the Arrow mapInPandas pipeline."""
    import hashlib
    import io

    import pytest

    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from tez_spark.operators.multimodal import decode_image_meta, resize_image

    rows = []
    sizes = [(13, 7), (64, 64), (3, 100), (640, 1)]
    for i, (w, h) in enumerate(sizes):
        im = Image.new("RGB", (w, h), color=(i * 11 % 256, 50, 200))
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        rows.append((i, bytearray(buf.getvalue())))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    got = {r.doc_id: r for r in decode_image_meta(df, fake=False).collect()}
    for i, (w, h) in enumerate(sizes):
        assert (got[i].width, got[i].height) == (w, h)
        assert got[i].n_bytes == len(rows[i][1])
        assert got[i].checksum == hashlib.md5(bytes(rows[i][1])).hexdigest()

    # real resize: every payload becomes exactly 8*6 grayscale bytes
    pix = {r.doc_id: r.pixels for r in resize_image(df, 8, 6, fake=False).collect()}
    assert set(pix) == set(range(len(sizes)))
    assert all(len(p) == 48 for p in pix.values())
    # and matches a direct PIL reference for one image
    ref = (
        Image.open(io.BytesIO(bytes(rows[0][1])))
        .convert("L")
        .resize((8, 6))
        .tobytes()
    )
    assert bytes(pix[0]) == ref


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
