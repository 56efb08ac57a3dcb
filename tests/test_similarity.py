"""ANN: LSH recall against the brute-force truth."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_lsh_recall_vs_brute_force(spark):
    from tez_spark.operators.similarity import q_ann_lsh, q_ann_topk

    truth = {
        (r.q_id, r.vec_id) for r in q_ann_topk(spark, SF_DIR).collect()
    }
    got = {(r.q_id, r.vec_id) for r in q_ann_lsh(spark, SF_DIR).collect()}
    assert truth, "brute force returned nothing"
    recall = len(truth & got) / len(truth)
    # 4 tables x 8 planes on random 64-dim data: generous floor; the point
    # is the pipeline shape, tuning comes from table/plane counts.
    assert recall >= 0.3, f"LSH recall collapsed: {recall:.2f}"
