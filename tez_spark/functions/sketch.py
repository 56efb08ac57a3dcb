"""Count-Min Sketch heavy hitters — a mergeable frequency sketch built
as an ordinary aggregation (Cormode & Muthukrishnan, "An Improved Data
Stream Summary: The Count-Min Sketch and its Applications", J.Alg 2005).

Why it matters at 100TB: an exact token wordcount shuffles the full
VOCABULARY (one key per distinct token — billions of keys for web text);
the CMS build shuffles at most D×W counter cells (4096 here) regardless
of vocabulary or corpus size — map-side partial aggregation collapses
each partition's contribution to ≤ D×W rows before the exchange. The
sketch is mergeable by construction (cell-wise sum), so it also works as
a streaming/update-mode aggregate or across day-partitioned builds.

Estimates are biased HIGH only: est(t) = min over rows d of
cell[d, h_d(t)] ≥ true(t), and with probability ≥ 1-2^-D the
overestimate is ≤ e·N/W (N = total tokens). Both properties are
asserted in tests; the declared query is rows-only (sketch cell layout
is engine-specific — same policy as approx_distinct).

All JVM-side: xxhash64-seeded row hashes, explode of a D-element
struct array, one groupBy. No Python in the build path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tez_spark.functions.text import tokens
from tez_spark.sources.catalog import load_table

CMS_W = 1024  # cells per hash row
CMS_D = 4     # independent hash rows


def _cell(col: F.Column, d: int) -> F.Column:
    """Row-d cell index: seed the hash by prefixing the row id."""
    return F.pmod(F.xxhash64(F.lit(d), col), F.lit(CMS_W))


def build_cms(toks: DataFrame, col: str = "tok") -> DataFrame:
    """(d, j, cnt) sketch cells from a token column — the distributed
    CMS build: explode D (row, cell) pairs per token, one bounded-key
    aggregation (≤ CMS_D × CMS_W distinct keys in the exchange)."""
    cells = F.array(
        *[
            F.struct(F.lit(d).alias("d"), _cell(F.col(col), d).alias("j"))
            for d in range(CMS_D)
        ]
    )
    return (
        toks.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.j").alias("j"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, candidates: DataFrame, col: str = "tok") -> DataFrame:
    """Point-query candidates against the sketch: est = MIN over rows of
    the token's cell. The sketch is tiny (≤ D×W rows) — broadcast it;
    candidates stay distributed.

    LEFT join + coalesce(cnt, 0): an empty sketch cell means NO token
    hashed there, so the true cell value — and therefore the min — is 0.
    An inner join would instead drop a candidate whose D cells are all
    absent (true est=0) and overestimate one with some absent cells by
    taking min over only the populated ones (ADVICE r4)."""
    cells = F.array(
        *[
            F.struct(F.lit(d).alias("d"), _cell(F.col(col), d).alias("j"))
            for d in range(CMS_D)
        ]
    )
    cand = candidates.select(F.col(col), F.explode(cells).alias("c")).select(
        col, F.col("c.d").alias("d"), F.col("c.j").alias("j")
    )
    return (
        cand.join(F.broadcast(sketch), ["d", "j"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def q_cms_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 exact heavy hitters with their CMS estimates side by side:
    (tok, exact, est). Rows-only by design; est >= exact and the CMS
    error bound are asserted in tests/test_sketch.py. The candidate set
    here is the exact top-20 so the output is deterministic — a pure
    production flow would instead point-query a externally-supplied
    watchlist against the sketch without any exact pass."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("tok"))
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact"))
    w = Window.orderBy(F.desc("exact"), F.asc("tok"))
    top = (
        exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("tok", "exact")
    )
    sketch = build_cms(toks)
    est = cms_estimate(sketch, top.select("tok"))
    return (
        top.join(est, "tok")
        .select("tok", "exact", "est")
        .orderBy(F.desc("exact"), F.asc("tok"))
    )


QUERIES = {"cms_heavyhitters": q_cms_heavyhitters}
