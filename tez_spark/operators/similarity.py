"""Similarity search over embedding columns (north-star extension,
SURVEY.md §7 step 7 — no reference analog; Tez has no vector ops).

Two paths:
- brute-force cosine top-k: broadcast the (small) query set against the
  full corpus — one scan, no shuffle of the corpus, exact. The baseline
  and the oracle.
- LSH (random hyperplane) top-k: signature bucketing prunes the corpus
  before exact re-ranking. The 100TB path: candidate generation is an
  equijoin on (band, signature) — shuffle keys are ~uniform hash values,
  and per-bucket work is bounded. Probabilistic recall -> declared as a
  rows-only check; tests assert recall against the brute-force truth.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tez_spark.functions.vectors import as_double, cosine
from tez_spark.sources.catalog import load_table

K = 5
N_QUERIES = 10  # query set = vec_id < 10, fixed for oracle reproducibility

# LSH config: 8 tables x 4 hyperplanes (4-bit signatures, 16 buckets per
# table). Tuned for the fixtures' uniform-random embeddings, where top-5
# neighbors sit at cosine ~0.3-0.5 — LSH's worst case: P(bucket match per
# table) = (1-θ/π)^4 ≈ 0.13-0.18, so 8 tables give ~0.7 recall while
# pruning ~half the corpus. Real clustered embeddings (the 100TB case)
# have much closer neighbors — raise LSH_PLANES there for sharper pruning.
# Planes are deterministic (seed 42), generated once driver-side and
# embedded as literals — tiny (tables*planes*dim doubles) and identical on
# every executor.
LSH_TABLES = 8
LSH_PLANES = 4
_LSH_SEED = 42


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine: corpus ⨯ broadcast(queries), windowed rank.
    The corpus is never shuffled — each task scans its partition against
    the broadcast query block (the 100TB-sane exact layout)."""
    from tez_spark.operators.core import fan_out

    q = queries.select(
        F.col(id_col).alias("q_id"), as_double(vec_col).alias("q_vec")
    )
    # fan_out the corpus side: the dot products are the compute; a tiny
    # local file otherwise scores single-threaded.
    c = fan_out(corpus.select(F.col(id_col), as_double(vec_col).alias("c_vec")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("q_id"))
        .select(
            "q_id",
            id_col,
            cosine(F.col("q_vec"), F.col("c_vec")).alias("sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
    )


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for the fixed query set (vec_id < N_QUERIES)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    out = brute_force_topk(emb, queries)
    return out.orderBy("q_id", "rn")


def _planes(dim: int) -> np.ndarray:
    rng = np.random.RandomState(_LSH_SEED)
    return rng.standard_normal((LSH_TABLES, LSH_PLANES, dim))


def lsh_signatures(
    df: DataFrame, dim: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, table, sig): one 8-bit signature per hash table, computed with
    JVM-side dot products against literal hyperplanes."""
    from tez_spark.operators.core import fan_out

    planes = _planes(dim)
    vec = as_double(vec_col)
    df = fan_out(df)
    rows = []
    for t in range(LSH_TABLES):
        sig = F.lit(0)
        for p in range(LSH_PLANES):
            plane = F.array(*[F.lit(float(v)) for v in planes[t, p]])
            bit = F.when(
                F.aggregate(
                    F.zip_with(vec, plane, lambda x, y: x * y),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                > 0,
                F.lit(2**p),
            ).otherwise(F.lit(0))
            sig = sig + bit
        rows.append(F.struct(F.lit(t).alias("table"), sig.alias("sig")))
    return df.select(
        F.col(id_col), F.explode(F.array(*rows)).alias("ts")
    ).select(id_col, F.col("ts.table").alias("table"), F.col("ts.sig").alias("sig"))


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: candidates share a (table, signature) bucket with
    the query, then exact cosine re-rank to top-5. Rows-only check (recall
    asserted against brute force in tests/test_similarity.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    dim = 64
    queries = emb.filter(F.col("vec_id") < N_QUERIES)

    c_sig = lsh_signatures(emb, dim)
    q_sig = lsh_signatures(queries, dim).select(
        F.col("vec_id").alias("q_id"), "table", "sig"
    )
    cand = (
        c_sig.join(F.broadcast(q_sig), ["table", "sig"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
        .distinct()
    )
    q_vecs = queries.select(
        F.col("vec_id").alias("q_id"), as_double("embedding").alias("q_vec")
    )
    c_vecs = emb.select("vec_id", as_double("embedding").alias("c_vec"))
    scored = (
        cand.join(F.broadcast(q_vecs), "q_id")
        .join(c_vecs, "vec_id")
        .select("q_id", "vec_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= K)
        .orderBy("q_id", "rn")
    )


ORACLE: dict[str, str] = {
    "ann_topk": f"""
        WITH q AS (
            SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec
            FROM embeddings WHERE vec_id < {N_QUERIES}
        ), scored AS (
            SELECT q.q_id, c.vec_id,
                   CASE WHEN list_dot_product(q.q_vec, q.q_vec) > 0
                         AND list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]) > 0
                        THEN list_dot_product(q.q_vec, c.embedding::DOUBLE[]) /
                             (sqrt(list_dot_product(q.q_vec, q.q_vec)) *
                              sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])))
                        ELSE 0.0 END AS sim
            FROM embeddings c CROSS JOIN q
            WHERE c.vec_id <> q.q_id
        )
        SELECT q_id, vec_id, sim, rn FROM (
            SELECT q_id, vec_id, sim,
                   ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
            FROM scored)
        WHERE rn <= {K} ORDER BY q_id, rn
    """,
    # ann_lsh: intentionally no oracle — probabilistic recall; rows-only.
}

QUERIES = {
    "ann_topk": q_ann_topk,
    "ann_lsh": q_ann_lsh,
}
