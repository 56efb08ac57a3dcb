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
asserted in tests AND (r7, the approx_distinct promotion pattern)
carried in-query as booleans next to the exact audit counts, so the
declared query is a FULL oracle: sketch cell values are engine-specific
and can never hash-match across engines, but the sketch's CONTRACT —
no-underestimate + the e·N/W error bound — is portable, and the
driver's rows+schema+hash comparison now verifies it end-to-end.

All JVM-side: xxhash64-seeded row hashes, explode of a D-element
struct array, one groupBy. No Python in the build path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tez_spark.functions.text import tokens
from tez_spark.sources.catalog import load_table

CMS_W = 1024  # cells per hash row
CMS_D = 4     # independent hash rows


def _cell(col: F.Column, d: int) -> F.Column:
    """Row-d cell index: seed the hash by prefixing the row id."""
    return F.pmod(F.xxhash64(F.lit(d), col), F.lit(CMS_W))


def _cells_array(col: str) -> F.Column:
    """The D-struct (d, j) cell array for one input column — a module
    constant per column name (CMS_D/CMS_W are fixed), so it builds ONCE
    per JVM via jvm_expr_memo (r17: build_cms and cms_estimate each
    paid ~40 Py4J Column round-trips per query build for byte-identical
    expression trees)."""
    from tez_spark.operators.core import jvm_expr_memo

    return jvm_expr_memo(
        f"cms.cells.{col}.{CMS_D}.{CMS_W}",
        lambda: F.array(
            *[
                F.struct(F.lit(d).alias("d"), _cell(F.col(col), d).alias("j"))
                for d in range(CMS_D)
            ]
        ),
    )


def build_cms(toks: DataFrame, col: str = "tok") -> DataFrame:
    """(d, j, cnt) sketch cells from a token column — the distributed
    CMS build: explode D (row, cell) pairs per token, one bounded-key
    aggregation (≤ CMS_D × CMS_W distinct keys in the exchange)."""
    return (
        toks.select(F.explode(_cells_array(col)).alias("c"))
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
    cand = candidates.select(
        F.col(col), F.explode(_cells_array(col)).alias("c")
    ).select(
        col, F.col("c.d").alias("d"), F.col("c.j").alias("j")
    )
    return (
        cand.join(F.broadcast(sketch), ["d", "j"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def q_cms_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 exact heavy hitters with the two CMS guarantees checked
    in-query: (tok, exact_cnt, no_underestimate, within_bound).

    FULL oracle (r7; promoted the same way approx_distinct was in r6):
    the raw estimates are engine-specific, but `no_underestimate`
    (est ≥ exact — deterministic, min-of-cells ≥ any contributor) and
    `within_bound` (est − exact ≤ e·N/W, the Cormode-Muthukrishnan
    error bound; holds w.p. ≥ 1−2^−D per query and deterministically on
    the fixtures — worst observed excess is 0 at every SF) ARE the
    sketch's portable contract; the DuckDB oracle emits the same exact
    top-20 with literal TRUEs. The candidate set is the exact top-20 so
    the output is deterministic — a production flow instead point-queries
    an externally-supplied watchlist against the sketch with no exact
    pass; the exact side here is the AUDIT the oracle needs, dropped at
    100TB where the bounded-key sketch is the whole point."""
    import math

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("tok"))
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_cnt"))
    # top-20 via orderBy+limit (TakeOrderedAndProject: per-partition
    # heaps + a 20-row driver merge — the q13/q14 pattern), NEVER a
    # row_number window with no partition key: that form moves the
    # ENTIRE distinct-token vocabulary to one partition (r14 self-audit
    # — the same WindowExec class as the r13 tpch15 finding). The
    # (exact_cnt desc, tok asc) total order makes the cut deterministic.
    top = (
        exact.orderBy(F.desc("exact_cnt"), F.asc("tok"))
        .limit(20)
        .select("tok", "exact_cnt")
    )
    # N = total tokens: a single-row re-agg of the exact wordcount
    # already computed above (no second corpus scan), broadcast onto the
    # 20 output rows
    n_total = exact.agg(F.sum("exact_cnt").alias("_n_total"))
    sketch = build_cms(toks)
    est = cms_estimate(sketch, top.select("tok"))
    return (
        top.join(est, "tok")
        .crossJoin(F.broadcast(n_total))
        .select(
            "tok",
            "exact_cnt",
            (F.col("est") >= F.col("exact_cnt")).alias("no_underestimate"),
            (
                (F.col("est") - F.col("exact_cnt"))
                <= F.lit(math.e) * F.col("_n_total") / F.lit(CMS_W)
            ).alias("within_bound"),
        )
        .orderBy(F.desc("exact_cnt"), F.asc("tok"))
    )


ORACLE = {
    "cms_heavyhitters": """
        WITH toks AS (
            SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
            FROM documents
        )
        SELECT tok, COUNT(*) AS exact_cnt,
               TRUE AS no_underestimate,
               TRUE AS within_bound
        FROM toks
        GROUP BY tok
        ORDER BY exact_cnt DESC, tok ASC
        LIMIT 20
    """,
}

QUERIES = {"cms_heavyhitters": q_cms_heavyhitters}
