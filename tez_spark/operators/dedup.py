"""Deduplication operators for training-data pipelines.

Extensions beyond the reference surface (SURVEY.md §7 step 7): exact
dedup, exact n-gram Jaccard, MinHash+LSH, SimHash. The reference's
nearest analog is grouped-key iteration (OrderedGroupedKVInput /
ValuesIterator.java:45 — dedup = emit one value per key); everything
fuzzier is new capability.

Scale design (100TB):
- exact dedup: one hash shuffle on the dedup key — the cheapest possible.
- n-gram Jaccard ALL-PAIRS is quadratic and exists as the small-scale
  oracle path; the scale path is MinHash+LSH: candidates come from
  band-bucket equijoins (shuffle on (band, signature), skew-safe because
  signatures are ~uniform), then candidates-only exact verification.
- SimHash: fingerprint is a pure map-side projection; near-pair discovery
  is a banded equijoin with pigeonhole-guaranteed recall for the declared
  hamming radius. No quadratic stage anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tez_spark.functions.text import tokens
from tez_spark.operators.core import bounded_sort
from tez_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# shared shingling
# ---------------------------------------------------------------------------

def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, sh) with sh a
    64-bit xxhash of the n-gram string — 8 bytes instead of ~25 through
    every downstream shuffle/join (distinct, minhash agg, verification
    equijoins). Collision risk at 100TB: ~(total shingles)²/2⁶⁵ pairwise —
    one spurious shared shingle per ~6×10⁹ shingles changes a Jaccard
    count by 1; acceptable for dedup semantics (and the exact DuckDB
    oracle over raw strings still hash-matches at fixture scale).

    fan_out first: shingling is compute-heavy per row and the local fixture
    arrives as one split. The distinct is a shuffle on (id, sh) — at scale
    this is the materialize-once shingle table every downstream stage
    (signatures, verification) reuses, hence callers persist() it."""
    from tez_spark.operators.core import fan_out

    # Materialize the token array in its own projection first: referencing
    # the tokenizer expression inside the transform() lambda would re-split
    # the whole text once per shingle (no subexpression elimination across
    # lambda scopes) — O(tokens^2) per document.
    toks = F.col("_toks")
    base = fan_out(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), tokens(text_col).alias("_toks")
    )
    sh = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.xxhash64(F.array_join(F.slice(toks, i + 1, n), " ")),
    )
    # ONE shuffle, not two: repartition by doc id FIRST, then dedupe.
    # HashPartitioning(id) satisfies the distinct-aggregate's clustering
    # requirement (id is a subset of its grouping keys {id, sh}), so the
    # dedup runs partition-local with no second exchange — and the output
    # stays hash-partitioned on the id, which every consumer needs
    # (signatures, sizes, verification aggregate or semi-join on it;
    # InMemoryRelation preserves outputPartitioning). The former
    # .distinct().repartition(id) shape paid a (id, sh) exchange AND an
    # id exchange; without id-partitioning at all, the 128-state minhash
    # partial aggregation ships every doc's partial row from every map
    # task — measured 92MB of shuffle for a 4MB table at sf0.1.
    return (
        base.filter(F.size(toks) >= n)
        .select(F.col(id_col), F.explode(sh).alias("sh"))
        .repartition(id_col)
        .dropDuplicates([id_col, "sh"])
    )


def shingle_table(spark: SparkSession, sf_dir: str, n: int = 3) -> DataFrame:
    """Session-memoized persisted shingle table for the fixture corpus.

    Seven registry queries (ngram_jaccard, minhash_lsh, winnow, clusters,
    both curation pipelines, decontaminate) need the identical
    (doc_id, sh) table; building it per query re-shingled the corpus up
    to 7× per bench/driver run. shared_artifact keys on the documents
    fingerprint, so a regenerated fixture rebuilds it."""
    import os

    from tez_spark.operators.core import shared_artifact
    from tez_spark.sources.catalog import path_fingerprint

    path = os.path.join(sf_dir, "documents.parquet")
    key = ("shingles", os.path.abspath(sf_dir), path_fingerprint(path), n)
    return shared_artifact(
        spark,
        key,
        lambda: shingles(load_table(spark, sf_dir, "documents"), "doc_id", "text", n=n),
    )


def winnow_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized winnowing fingerprints (doc_id, fp) — shared by
    dedup_winnow and decontaminate."""
    import os

    from tez_spark.functions.text_queries import winnow_fingerprints
    from tez_spark.operators.core import shared_artifact
    from tez_spark.sources.catalog import path_fingerprint

    path = os.path.join(sf_dir, "documents.parquet")
    key = ("winnow_fps", os.path.abspath(sf_dir), path_fingerprint(path))
    return shared_artifact(
        spark,
        key,
        lambda: winnow_fingerprints(load_table(spark, sf_dir, "documents")),
    )


def _pair_jaccard(sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(da, db, j) for every pair sharing ≥1 shingle. Quadratic in
    co-shingled docs — oracle/verification path, not the 100TB path."""
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("da"), F.col(f"b.{id_col}").alias("db"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col(id_col).alias("da"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("db"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "da")
        .join(sb, "db")
        .select(
            "da",
            "db",
            (F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))).alias("j"),
        )
    )


def pair_jaccard_at(sh: DataFrame, t: float, id_col: str = "doc_id") -> DataFrame:
    """EXACT (da, db, j) for every pair with Jaccard >= t, prefix-filtered
    (Bayardo all-pairs / SSJoin): under any global shingle order,
    J(A,B) >= t implies |A∩B| >= ceil(t·|A|), so B must hit one of A's
    first |A| - ceil(t·|A|) + 1 shingles (and symmetrically) — joining
    only those ~(1-t)·n prefix shingles per doc, with zero recall loss;
    exact verification then scores candidates only. Same output as the
    naive all-pairs join (asserted in tests/test_dedup_property.py).

    WHEN TO USE: sparse corpora, where most docs have no near-dup — the
    typical web-scale case — so the candidate set is small and the
    pruned join avoids scoring the co-shingle cross product. On the
    DENSE templated fixtures it measured ~5x SLOWER than the naive join
    (the prefix shingles are each doc's minimum hashes, which template
    siblings share, so candidates ≈ all template pairs and the
    verification machinery outweighs the pruning); the declared queries
    therefore stay on the naive path, which is also the DuckDB oracle
    shape.

    The prefix ranking window partitions by doc id — partition-local
    over the co-partitioned persisted shingle table, no extra shuffle."""
    from pyspark.sql import Window

    n_w = Window.partitionBy(id_col)
    rn_w = n_w.orderBy("sh")
    ranked = sh.select(
        id_col,
        "sh",
        F.row_number().over(rn_w).alias("_rn"),
        F.count(F.lit(1)).over(n_w).alias("_n"),
    )
    prefix = ranked.filter(
        F.col("_rn") <= F.col("_n") - F.ceil(F.lit(t) * F.col("_n")) + 1
    )
    a = prefix.select(F.col(id_col).alias("da"), "sh")
    b = prefix.select(F.col(id_col).alias("db"), "sh")
    from tez_spark.operators.core import tracked_persist

    # verification consumes the candidate set twice (the pair join on da
    # + the b-side id filter) — persist so the prefix join runs once.
    cand = tracked_persist(
        a.join(b, "sh")
        .filter(F.col("da") < F.col("db"))
        .select("da", "db")
        .distinct()
    )
    # broadcast_small=False: on dense corpora the prefix-filtered
    # candidate set can approach all co-shingled pairs — let AQE size the
    # joins instead of forcing a driver-side collect via broadcast hints.
    return _verify_pairs(
        cand, sh, id_col=id_col, broadcast_small=False
    ).filter(F.col("j") >= t)


def _verify_pairs(
    cand: DataFrame,
    sh: DataFrame,
    id_col: str = "doc_id",
    broadcast_small: bool = True,
    sh_b: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard for candidate pairs only — the LSH verification stage.
    Cost is O(candidates × shingles-per-doc), never all-pairs.

    Plan shape (r6 rewrite — set-per-doc instead of pair-expansion): each
    side's candidate doc ids semi-filter its shingle table ONCE, one
    groupBy folds the surviving shingles into a per-doc SET (docs are
    bounded — a set is one array cell, and |A| is just its size), and the
    candidate pairs join the two set tables to score
    |A∩B| / (|A|+|B|-|A∩B|) with array_intersect, entirely map-side when
    the sides broadcast. Compared with the former pair-expanded shape
    (shingles joined to pairs, three aggregations, an (id, sh) equijoin,
    two stitch-back joins) this halves the stage count and scans each
    shingle table once — the per-run floor dedup_incremental pays per
    batch (r5 verdict: the ~30-stage floor WAS the residual). Bytes
    moved are unchanged: O(candidate docs × doc size) either way.

    broadcast_small: when the candidate set is known to be pruned-small
    (the MinHash-LSH path), broadcast the candidate-bounded sides
    explicitly rather than letting AQE discover it one shuffle-stage at
    a time. Callers whose candidate set can be LARGE (prefix filtering
    on a dense corpus) must pass False — an explicit broadcast hint
    overrides size thresholds and would collect the whole candidate
    table to the driver.

    sh_b: when the caller KNOWS every db comes from a smaller table (the
    incremental path: db is always a new-batch doc), pass that table so
    the b-side semi-filter scans it instead of the full corpus union.

    r11 measured-and-REJECTED variant (VERDICT r10 item 3): a one-pass
    shape — da ∪ db id union, one semi-filter, one groupBy, the single
    set table broadcast to both joins — looked strictly job-leaner on
    paper but A/B-profiled WORSE on dedup_incremental (27-28 AQE jobs /
    4.02 s idle min-of-3 vs this shape's 21 / 3.52 s; the union +
    doubly-consumed aggregate made AQE materialize MORE stages, not
    fewer) and a wash on the other callers (six-query bench total 6.74
    vs 7.07 s, per-query moves within noise). Full table in PERF.md
    round 11. Keep this shape; re-measure before re-attempting."""
    maybe_b = F.broadcast if broadcast_small else (lambda df: df)

    def doc_sets(table: DataFrame, ids: DataFrame, out: str) -> DataFrame:
        return (
            table.join(maybe_b(ids), id_col, "left_semi")
            .groupBy(id_col)
            .agg(F.collect_set("sh").alias(out))
        )

    # In the broadcast regime, no .distinct() on the id projections: the
    # broadcast hash relation the left_semi builds is a SET, so duplicate
    # ids collapse in the build anyway — the distinct added one exchange
    # + one AQE job per side for nothing (r7 stage-floor profile:
    # dedup_incremental's wall is driver orchestration, not bytes; see
    # PERF.md round 7). In the shuffle regime (broadcast_small=False) the
    # distinct stays: there the dup ids would travel the exchange.
    maybe_distinct = (lambda df: df) if broadcast_small else (lambda df: df.distinct())
    a_sets = doc_sets(
        sh, maybe_distinct(cand.select(F.col("da").alias(id_col))), "sha"
    )
    b_sets = doc_sets(
        sh_b if sh_b is not None else sh,
        maybe_distinct(cand.select(F.col("db").alias(id_col))),
        "shb",
    )
    return (
        cand.join(maybe_b(a_sets.select(F.col(id_col).alias("da"), "sha")), "da")
        .join(maybe_b(b_sets.select(F.col(id_col).alias("db"), "shb")), "db")
        .withColumn("_i", F.size(F.array_intersect("sha", "shb")))
        .select(
            "da",
            "db",
            (
                F.col("_i")
                / (F.size("sha") + F.size("shb") - F.col("_i"))
            ).alias("j"),
        )
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(df: DataFrame, cols: list[str]) -> DataFrame:
    """Keep one row per distinct key (hash-groupBy; single shuffle)."""
    return df.dropDuplicates(cols)


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level exact-dup summary (fixtures contain no exact text dups
    — the near-dup signal is at the shingle level, below)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text").alias("n_unique"),
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (small-scale / verification truth)
# ---------------------------------------------------------------------------

def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All near-dup pairs with exact 3-gram Jaccard ≥ 0.8 (naive
    all-pairs join — measured faster than prefix filtering on these
    dense fixtures; see pair_jaccard_at for the sparse-corpus
    alternative). The shingle table is the session-memoized shared
    artifact — "materialize the shingle table once", the standard
    pipeline shape, now shared across the seven consumers."""
    sh = shingle_table(spark, sf_dir)
    return bounded_sort(_pair_jaccard(sh).filter(F.col("j") >= 0.8), "da", "db")


# ---------------------------------------------------------------------------
# MinHash + LSH (the 100TB path)
# ---------------------------------------------------------------------------

NUM_HASHES = 128
BANDS = 32          # 32 bands x 4 rows: P(miss | j=0.8) = (1-0.8^4)^32 ≈ 5e-8
ROWS_PER_BAND = NUM_HASHES // BANDS


# Affine universal-hash family over one base hash: h_i(x) = a_i*H(x)+b_i
# over the prime field p=2^31-1. One string hash per shingle instead of
# NUM_HASHES of them — the standard MinHash trick. The 31-bit field keeps
# a_i*H+b_i < 2^62 (Spark 4 runs ANSI mode: long overflow would throw);
# min-collision probability over ~100 shingles is ~100/2^31 — negligible.
# Constants from a fixed seed: deterministic across runs/executors.
_MERSENNE_P = (1 << 31) - 1


def _hash_family() -> list[tuple[int, int]]:
    import random

    rng = random.Random(42)
    return [
        (rng.randrange(1, _MERSENNE_P), rng.randrange(0, _MERSENNE_P))
        for _ in range(NUM_HASHES)
    ]


def minhash_signatures(sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """128 minhashes per doc — one aggregation, no row blowup (h_i is MIN
    over shingles per seed); single xxhash64 per shingle + cheap long
    arithmetic for the family."""
    # Hash once per row in a projection; the 128 agg expressions then do
    # only long arithmetic on `_base` (no cross-aggregate subexpression
    # elimination in codegen — inlining the hash would xxhash64 every
    # shingle 128x, measured ~2.5x the CPU of the whole stage).
    hashed = sh.select(
        F.col(id_col),
        F.pmod(F.xxhash64(F.col("sh")), F.lit(_MERSENNE_P)).alias("_base"),
    )
    # the trailing mod is essential: without it a*h+b is monotonic in h and
    # every "hash function" would select the same min shingle.
    # Built as SQL expr strings and memoized per JVM (r16): the Column-API
    # form cost ~600 Py4J round-trips per query BUILD (~0.5-1 s, paid by
    # every minhash consumer on every bench sample); one parse per
    # process now. Value-identical: min(pmod(_base*a + b, P)) with long
    # literals — same arithmetic, same types after implicit promotion.
    from tez_spark.operators.core import jvm_expr_memo

    aggs = jvm_expr_memo(
        "minhash_aggs",
        lambda: [
            F.expr(
                f"min(pmod(_base * {a}L + {b}L, {_MERSENNE_P}L)) AS h{i}"
            )
            for i, (a, b) in enumerate(_hash_family())
        ],
    )
    return hashed.groupBy(id_col).agg(*aggs)


def band_signatures(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, band, sig) banded-signature plan (un-persisted) — xxhash64 of
    each band's ROWS_PER_BAND minhashes. The 32-struct band array is one
    memoized SQL expr (r16 — same Py4J-round-trip economy as the minhash
    aggs; identical struct/int/long types as the Column-API form)."""
    from tez_spark.operators.core import jvm_expr_memo

    def _band_array():
        parts = ", ".join(
            "struct({b} AS band, xxhash64({cols}) AS sig)".format(
                b=b,
                cols=", ".join(
                    f"h{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
                ),
            )
            for b in range(BANDS)
        )
        return F.expr(f"array({parts})")

    bands = jvm_expr_memo("lsh_band_array", _band_array)
    return sig.select(F.col(id_col), F.explode(bands).alias("bs")).select(
        id_col, F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )


def candidates_from_bands(
    banded: DataFrame, id_col: str = "doc_id", dedupe: bool = True
) -> DataFrame:
    """Bucket equijoin over a (persisted) banded-signature table ->
    distinct candidate pairs. Shuffle key (band, sig) is ~uniform (hash
    values), so no skew. dedupe=False returns the raw (multi-band) pair
    stream for callers that fold several candidate branches into ONE
    union-wide distinct (q_dedup_incremental)."""
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("da"), F.col(f"b.{id_col}").alias("db"))
    )
    return pairs.distinct() if dedupe else pairs


def lsh_candidates(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Band signatures -> bucket equijoin -> distinct candidate pairs.
    The banded table is persisted (the self-join would otherwise recompute
    the full 128-hash signature aggregation for BOTH sides); (id, band,
    sig) is tiny — BANDS rows per doc. Tracked for release between
    registry runs."""
    from tez_spark.operators.core import tracked_persist

    return candidates_from_bands(tracked_persist(band_signatures(sig, id_col)), id_col)


def lsh_candidate_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized MinHash-LSH candidate pairs (da, db) for the
    fixture corpus — dedup_minhash_lsh and curation_pipeline_lsh run the
    IDENTICAL shingle→signature→band→bucket-join pipeline; memoizing the
    candidate table (and the banded table under it) makes the second
    consumer's heaviest stages a cache read. Verification stays
    per-query (it is candidate-bounded and cheap)."""
    import os

    from tez_spark.operators.core import shared_artifact
    from tez_spark.sources.catalog import path_fingerprint

    path = os.path.join(sf_dir, "documents.parquet")
    fp = path_fingerprint(path)
    sf_abs = os.path.abspath(sf_dir)

    def build_banded() -> DataFrame:
        return band_signatures(minhash_signatures(shingle_table(spark, sf_dir)))

    banded = shared_artifact(spark, ("mh_bands", sf_abs, fp), build_banded)
    return shared_artifact(
        spark,
        ("mh_candidates", sf_abs, fp),
        lambda: candidates_from_bands(banded),
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidates + exact verification at Jaccard ≥ 0.8.

    Output is identical to q_dedup_ngram_jaccard (the oracle) whenever LSH
    misses nothing; with 32x4 banding the per-pair miss probability at the
    0.8 threshold is ~5e-8 — the declared oracle is the exact computation.
    """
    sh = shingle_table(spark, sf_dir)  # shared artifact, reused 4x below
    # candidate table is also session-memoized: curation_pipeline_lsh
    # consumes the identical pipeline in the same run.
    cand = lsh_candidate_table(spark, sf_dir)
    return bounded_sort(_verify_pairs(cand, sh).filter(F.col("j") >= 0.8), "da", "db")


def q_dedup_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-fingerprint candidate generation + exact verification at
    Jaccard ≥ 0.8 — a third candidate generator alongside MinHash-LSH and
    SimHash, reusing the same exact verifier.

    Candidates are pairs sharing ≥ 1 winnowing fingerprint
    (functions/text_queries.winnow_fingerprints): the fp equijoin is the
    bucket-join shape (uniform md5 keys, no skew), and fingerprints
    sample ~2/(W+1) of each doc's grams, so the candidate join moves a
    ~5x-reduced table compared with the full shingle self-join.

    Recall note: winnowing guarantees a shared fingerprint only for
    shared token runs of length ≥ K+W-1 (= 6); a J≥0.8 pair with only
    scattered short overlaps could in principle be missed. On near-dup
    corpora (edits of a common source — the case this operator exists
    for) overlaps are long runs, and the declared oracle is the exact
    all-pairs computation: equality holds on the fixtures at every SF
    (asserted by the driver) and any corpus where it doesn't is one
    where MinHash-LSH (probability-bounded) is the right generator.

    Scale caveat vs the LSH band join: band-bucket keys are uniform
    hashes of near-unique signatures, but winnow fingerprints are
    CONTENT hashes — a group of M exact/near-exact duplicates shares
    fps, so its bucket yields O(M²) candidate pairs. Candidates are
    therefore bounded by the corpus's duplicate-cluster sizes, not
    uniform; on raw web-scale data use winnow_pairs(collapse_exact=True)
    — the IMPLEMENTED mitigation, which pre-collapses identical texts
    to one representative per cluster with exactness preserved (see
    winnow_pairs) — or prefer dedup_minhash_lsh, whose 128-hash band
    keys stay uniform regardless of duplication structure.

    Candidate filter: pairs must share >= 2 fingerprints. One shared fp
    is routinely boilerplate (on the template-generated fixtures the
    1-fp candidate set is 41x larger — 334k pairs at sf0.1 for 256 true
    pairs — and verification dominates the runtime); a J>=0.8 pair's
    shared content spans many winnow windows, so it shares several. The
    count falls out of the same fp equijoin (groupBy replaces distinct —
    same shuffle), and recall vs the exact all-pairs oracle is asserted
    at every SF by the driver (min shared-fp over true pairs is 2 on the
    fixtures; a corpus where true pairs share exactly one fp wants
    dedup_minhash_lsh instead)."""
    fps = winnow_table(spark, sf_dir)
    sh = shingle_table(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    return bounded_sort(winnow_pairs(docs, fps, sh), "da", "db")


def _winnow_candidates(fps: DataFrame) -> DataFrame:
    """≥2-shared-fingerprint candidate pairs from a (doc_id, fp) table —
    the bucket equijoin + shared-count filter described in
    q_dedup_winnow. Persisted: verification consumes it twice."""
    from tez_spark.operators.core import tracked_persist

    a = fps.alias("a")
    b = fps.alias("b")
    return tracked_persist(
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).alias("_nshared"))
        .filter(F.col("_nshared") >= 2)
        .select("da", "db")
    )


def winnow_pairs(
    docs: DataFrame,
    fps: DataFrame,
    sh: DataFrame,
    t: float = 0.8,
    collapse_exact: bool = False,
) -> DataFrame:
    """(da, db, j) for every pair with Jaccard ≥ t whose candidates share
    ≥2 winnow fingerprints.

    collapse_exact=True is the implemented mitigation for the
    content-hash bucket caveat (q_dedup_winnow docstring): identical
    texts are collapsed to one representative BEFORE the fp self-join,
    so an M-sized exact-duplicate cluster contributes ONE row per
    bucket instead of O(M²) candidate pairs. Exactness is preserved,
    not approximated: identical texts have identical shingle sets (so
    every intra-cluster pair has J=1 ≥ t) AND identical fingerprint
    sets (so the direct path's ≥2-shared-fp filter admits an exact pair
    iff its text carries ≥2 fps — intra emission is gated on exactly
    that, keeping 3-6-token exact duplicates out of both paths alike);
    a member pair (a∈A, b∈B) has exactly J(rep_A, rep_B) and shares
    exactly rep_A∩rep_B's fps — the expansion joins reattach members to
    verified representative pairs. Equality with the direct path over
    any corpus is asserted in tests/test_dedup_property.py on a corpus
    with a planted 25-doc exact cluster (where the direct path's
    candidate set is 44× larger) plus a planted short-exact-dup pair. The declared registry query keeps it OFF: the driver
    fixtures contain zero exact duplicates (checked), so the collapse
    machinery (one text-hash agg + two expansion joins) would be pure
    overhead there; flip it on for raw web-scale ingest, where giant
    identical clusters are the norm."""
    if not collapse_exact:
        return _verify_pairs(_winnow_candidates(fps), sh).filter(F.col("j") >= t)

    # pairs are defined over shingled docs only (oracle parity: docs
    # below the shingle length floor never enter the exact all-pairs
    # computation either)
    th = (
        docs.select("doc_id", F.md5(F.encode(F.col("text"), "UTF-8")).alias("_th"))
        .join(sh.select("doc_id").distinct(), "doc_id", "left_semi")
    )
    rep = th.groupBy("_th").agg(F.min("doc_id").alias("rep"))
    from tez_spark.operators.core import tracked_persist

    mr = tracked_persist(th.join(rep, "_th").select("doc_id", "rep"))
    rfps = fps.join(
        mr.select(F.col("rep").alias("doc_id")).distinct(), "doc_id", "left_semi"
    )
    rp = _verify_pairs(_winnow_candidates(rfps), sh).filter(F.col("j") >= t)
    a = mr.alias("a")
    b = mr.alias("b")
    # Intra-cluster pairs are emitted only for clusters whose
    # representative carries >= 2 fingerprints: identical texts share ALL
    # their fps, so the direct path's >=2-shared-fp candidate filter
    # admits an exact-duplicate pair iff its text has >=2 fps — without
    # this gate, identical 3-6-token docs (shingled, but too short for 2
    # winnow windows at K=3/W=4) would appear here and not in the direct
    # path, breaking the documented equality.
    eligible = (
        rfps.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_nfp"))
        .filter(F.col("_nfp") >= 2)
        .select(F.col("doc_id").alias("_elig_rep"))
    )
    intra = (
        a.join(
            b,
            (F.col("a.rep") == F.col("b.rep"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .join(eligible, F.col("a.rep") == F.col("_elig_rep"), "left_semi")
        .select(
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
            F.lit(1.0).alias("j"),
        )
    )
    cross = (
        rp.join(mr.select(F.col("rep").alias("da"), F.col("doc_id").alias("ma")), "da")
        .join(mr.select(F.col("rep").alias("db"), F.col("doc_id").alias("mb")), "db")
        .select(
            F.least("ma", "mb").alias("da"),
            F.greatest("ma", "mb").alias("db"),
            "j",
        )
    )
    return intra.unionByName(cross)


# ---------------------------------------------------------------------------
# incremental cross-snapshot dedup (daily-ingest shape)
# ---------------------------------------------------------------------------

def corpus_artifacts(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(corpus_shingles, corpus_bands) for the persisted snapshot side of
    incremental dedup — the signature store a daily ingest maintains
    ACROSS snapshots so arriving batches never re-shingle history. Here
    the store is the session-memoized shared artifact; in production it
    is a parquet table written once per snapshot (write_bucketed on
    doc_id for the verify semi-join; merge_snapshot appends each batch's
    rows after it passes dedup)."""
    import os

    from tez_spark.operators.core import shared_artifact
    from tez_spark.sources.catalog import path_fingerprint

    path = os.path.join(sf_dir, "documents.parquet")
    fp = path_fingerprint(path)
    sf_abs = os.path.abspath(sf_dir)

    def corpus_docs() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        h = F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8"))
        return docs.filter(F.substring(h, 1, 2) < "e6")

    sh = shared_artifact(
        spark,
        ("corpus_shingles", sf_abs, fp),
        lambda: shingles(corpus_docs(), "doc_id", "text", n=3),
    )
    # The band table is memoized PRE-PARTITIONED on the band-join key:
    # the persisted partitioning satisfies the equijoin's clustering
    # requirement, so every incremental batch joins against the store
    # WITHOUT re-exchanging the corpus side (r7 stage-floor profile —
    # this is the store-side analog of writing the production parquet
    # signature store bucketed by (band, sig)).
    bands = shared_artifact(
        spark,
        ("corpus_bands", sf_abs, fp),
        lambda: band_signatures(minhash_signatures(sh)).repartition("band", "sig"),
    )
    return sh, bands


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cross-snapshot dedup — the operation a daily 100TB
    ingest actually runs: near-dup report for a NEW batch (the ~10% of
    docs with md5(doc_id) >= 'e6' — the same content-independent split as
    train_split) against the persisted corpus (the other ~90%), plus
    within-batch dedup, WITHOUT ever re-processing the corpus.

    Plan: the corpus side contributes only its persisted shingle + band
    tables (corpus_artifacts — at scale a parquet signature store
    maintained across snapshots); the batch is shingled/signed fresh
    (it is new data). Candidates are the batch-bands × corpus-bands
    bucket equijoin (new-vs-all — never all-vs-all) unioned with the
    batch's own band self-join (new-vs-new), then exact Jaccard
    verification on candidates only. Output orientation: cross-split
    pairs as (da=corpus doc, db=batch doc) regardless of id order;
    within-batch pairs as da < db. Declared against the exact all-pairs
    oracle restricted to pairs touching the batch (corpus×corpus pairs
    were deduped when earlier snapshots merged — not this job's output);
    the same ~5e-8 LSH miss bound as dedup_minhash_lsh applies."""
    from tez_spark.operators.core import tracked_persist

    corpus_sh, corpus_bands = corpus_artifacts(spark, sf_dir)

    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8"))
    batch_docs = docs.filter(F.substring(h, 1, 2) >= "e6")
    batch_sh = tracked_persist(shingles(batch_docs, "doc_id", "text", n=3))
    # Both persists below are load-bearing (r7 profile, A/B-measured):
    # the un-persisted form re-runs the minhash aggregation and band
    # joins inside every broadcast-subquery consumer — AQE exchange
    # reuse does NOT span those subtrees — and measured >=2x slower
    # (7.9s vs 3.8s idle min at sf0.1).
    batch_bands = tracked_persist(band_signatures(minhash_signatures(batch_sh)))

    cross = (
        batch_bands.alias("b")
        .join(
            corpus_bands.alias("c"),
            (F.col("b.band") == F.col("c.band")) & (F.col("b.sig") == F.col("c.sig")),
        )
        .select(F.col("c.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
    )
    within = candidates_from_bands(batch_bands, dedupe=False)
    # ONE union-wide distinct, not one per branch (r7 flip of the r6
    # shape): the branches' pre-distinct pair streams carry the same
    # rows either way, so a single exchange over the (narrow) union
    # moves identical bytes through HALF the distinct stages/AQE jobs —
    # and the profile showed this query's floor is stage orchestration,
    # not shuffle bytes.
    cand = tracked_persist(cross.unionByName(within).distinct())

    sh_all = corpus_sh.unionByName(batch_sh)
    # bounded_sort (repartition(1)), not coalesce(1): the verified
    # report is candidate-bounded (hundreds of rows at any SF here) so
    # it skips orderBy's sampling job either way, but coalesce is a
    # narrow dependency that would merge back through the lineage and
    # single-thread the final verify probe stage (ADVICE r7; the exact
    # failure bounded_sort's own docstring documents). A/B at sf0.1
    # idle: no measurable difference (PERF.md round 9 — the r8 window
    # closed before the section was written) — the exchange moves
    # hundreds of rows. At true 100TB output sizes swap to orderBy.
    return bounded_sort(
        _verify_pairs(cand, sh_all, sh_b=batch_sh).filter(F.col("j") >= 0.8),
        "da",
        "db",
    )


# ---------------------------------------------------------------------------
# duplicate clusters (connected components over near-dup pairs)
# ---------------------------------------------------------------------------

def connected_components(
    pairs: DataFrame,
    a_col: str = "da",
    b_col: str = "db",
    max_iter: int = 20,
    edges_unique: bool = False,
) -> DataFrame:
    """(doc_id, component) with component = min doc id reachable through
    the undirected pair graph — turns pairwise near-dup hits into
    duplicate CLUSTERS so a pipeline keeps exactly one canonical doc per
    group (the pairwise drop-larger rule is not transitive).

    Min-label propagation: each round every node takes the min of its
    own label and its neighbors' labels; converges in O(cluster diameter)
    rounds (dup clusters are shallow — near-dups of a common source).
    This is the iterative-DAG pattern (Tez reuses its session to submit
    successive DAGs; here each round is a join+agg over the SAME
    persisted edge table, and the driver only checks a scalar
    convergence count). Each round's labels are persisted and the
    previous round's released, so lineage stays one round deep — at
    100TB swap persist for localCheckpoint and replace min-label with
    the large-star/small-star variant if diameters grow.

    edges_unique: the caller guarantees `pairs` holds each undirected
    pair at most once with a_col < b_col (true for every aggregated /
    block-deduped pair producer in this module) — skips the edge-table
    distinct, whose exchange only ever removed duplicates min-label is
    insensitive to anyway (r16: one less exchange + AQE job per query).

    r16 round fusion: the initial labels are seeded at ONE HOP —
    label₀(v) = min(v, min over neighbors of their ids) — which equals
    the result of propagation round 1 from identity labels, computed as
    a single groupBy over the persisted edge table instead of a full
    join + agg + left-join + count round (measured: one fewer loop
    round on every fixture graph). A deeper (2-hop) seed was A/B'd and
    REJECTED in r17: under AQE the extra hop's own exchange
    materializations cost what the saved round's left-join + count
    cost (job-count wash at sf0.1; OPTIMIZATION_r17.md).

    Verified-diameter bound (ADVICE r16): convergence detection needs
    a final CHANGE-FREE round, so the seed's 1 hop + at most
    (max_iter - 1) change rounds verify diameters up to max_iter hops;
    anything deeper raises."""
    from tez_spark.operators.core import tracked_persist

    # Persisted PRE-PARTITIONED on the per-round join key: every
    # iteration joins edges.dst against that round's labels.node, and a
    # cached hash partitioning on dst satisfies the join's clustering
    # requirement — the edge table is exchanged once at build, never per
    # round (the same store-side economy as corpus_bands; labels come
    # out of each round's join already partitioned on node, so the only
    # per-round exchange left is the groupBy(src)).
    both = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst")).union(
        pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    )
    if not edges_unique:
        both = both.distinct()
    edges = tracked_persist(both.repartition("dst"))
    # 1-hop seed (fused round 1): every node of the symmetric edge table
    # appears as src, so groupBy(src) enumerates the node set AND its
    # round-1 neighbor-min in one aggregation.
    persisted = tracked_persist(
        edges.groupBy("src")
        .agg(F.min("dst").alias("_mn"))
        .select(
            F.col("src").alias("node"),
            F.least(F.col("src"), F.col("_mn")).alias("label"),
        )
    )
    labels = persisted
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        new_min = F.least(F.col("label"), F.coalesce("nmin", F.col("label")))
        # carry the changed flag in the same projection: the convergence
        # check is then one count over the persisted frame instead of a
        # join back against the previous round's labels.
        new_labels = tracked_persist(
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                new_min.alias("label"),
                (new_min != F.col("label")).alias("_changed"),
            )
        )
        changed = new_labels.filter(F.col("_changed")).count()
        # unpersist the FRAME THAT WAS PERSISTED — calling it on a
        # derived .drop() lineage would be a silent no-op leak.
        persisted.unpersist()
        persisted = new_labels
        labels = new_labels.drop("_changed")
        if changed == 0:
            converged = True
            break
    if not converged:
        # silently returning non-minimal labels would be a WRONG answer
        # (components split); a >max_iter diameter means the caller should
        # raise max_iter or switch to large-star/small-star.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"after the 1-hop seed (component diameter exceeds {max_iter}: "
            "the last round must be change-free to verify convergence)"
        )
    return labels.select(F.col("label").alias("component"), F.col("node").alias("doc_id"))


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters at exact Jaccard >= 0.8: every clustered doc
    with its component id (= min doc id in the cluster)."""
    sh = shingle_table(spark, sf_dir)
    pairs = _pair_jaccard(sh).filter(F.col("j") >= 0.8)
    # clustered-docs output is corpus-fraction-scaled (duplicated docs):
    # parallel range sort, not bounded_sort's single-partition funnel (r13).
    # edges_unique: _pair_jaccard's groupBy(da, db) emits each da<db pair
    # exactly once — skip the edge distinct (r16).
    return connected_components(pairs, edges_unique=True).orderBy(
        "component", "doc_id"
    )


def q_dedup_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC duplicate clusters: connected components over the
    embedding cosine>=0.45 near-dup graph (dedup_embedding's pairs) —
    the cluster view a curation pipeline dedups against when paraphrases
    share no n-grams. Same min-label propagation (and the same
    recursive-CTE oracle shape) as the text-shingle clusters; the pair
    stage is the distributed block-pair matmul, so nothing corpus-sized
    ever reaches the driver."""
    from tez_spark.operators.core import tracked_persist
    from tez_spark.operators.similarity import all_pairs_cosine
    from tez_spark.sources.catalog import table_row_count

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = tracked_persist(
        all_pairs_cosine(
            emb, threshold=0.45, n_rows=table_row_count(sf_dir, "embeddings")
        ).select(F.col("va").alias("da"), F.col("vb").alias("db"))
    )
    # corpus-fraction-scaled output: parallel range sort (see
    # q_dedup_clusters). edges_unique: all_pairs_cosine scores each
    # unordered block pair in exactly one group and emits va < vb —
    # each pair at most once — skip the edge distinct (r16).
    # A 2-hop seed (pre-fusing the one measured change round) was A/B'd
    # and REJECTED in r17: the hop's own join+agg exchange
    # materializations exactly offset the saved round's left-join +
    # count (23 -> 23 jobs, 77 -> 76 stages, +3 KB shuffle at sf0.1) —
    # see OPTIMIZATION_r17.md.
    return (
        connected_components(pairs, edges_unique=True)
        .withColumnRenamed("doc_id", "vec_id")
        .orderBy("component", "vec_id")
    )


# ---------------------------------------------------------------------------
# SimHash (32-bit, md5-nibble bits so the oracle is cross-engine exact)
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32
HAMMING_MAX = 3
SIMHASH_BANDS = 4   # pigeonhole: hamming<=3 over 4 bands -> >=1 band equal
_BAND_WIDTH = SIMHASH_BITS // SIMHASH_BANDS  # 8 bits -> values 0..255


def _simhash_col() -> F.Column:
    """32-bit SimHash over a precomputed `_h` md5-hex column (see
    simhash_fingerprints): bit j of a token = (hex digit j of md5(token))
    >= '8' — the high bit of that nibble. Expressible identically in
    DuckDB, which is the whole point (xxhash64 isn't).

    One memoized SQL expr (r16): the Column-API fold (32 sums of CASEs,
    Python-summed into a 32-deep Add chain) cost ~3.4 s of Py4J
    round-trips per query build; the CASE WHEN string is the identical
    expression tree parsed in one call. Value-equality pinned by the
    dedup_simhash oracle test."""
    from tez_spark.operators.core import jvm_expr_memo

    def _fold():
        terms = " + ".join(
            f"(CASE WHEN SUM(CASE WHEN substring(_h, {j + 1}, 1) >= '8' "
            f"THEN 1 ELSE -1 END) > 0 THEN {2 ** j}L ELSE 0L END)"
            for j in range(SIMHASH_BITS)
        )
        return F.expr(f"CAST({terms} AS BIGINT)")

    return jvm_expr_memo("simhash_fold", _fold)


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): pure map-side explode + one aggregation.
    fan_out: 32 md5-substring terms per token are compute-heavy — spread
    the explode across slots when the scan is a single tiny split."""
    from tez_spark.operators.core import fan_out

    words = fan_out(docs.select("doc_id", "text")).select(
        "doc_id", F.explode(tokens("text")).alias("word")
    )
    # one md5 per token row; the 32 bit-extractions are substrings of this
    # column (inlining md5 into each term would hash every token 32x).
    hashed = words.select("doc_id", F.md5(F.col("word").cast("binary")).alias("_h"))
    return hashed.groupBy("doc_id").agg(_simhash_col().alias("simhash"))


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs at hamming distance ≤ 3 over 32-bit SimHash.
    Candidates from 4x8-bit band equijoin (guaranteed recall for d≤3),
    then exact bit_count(xor) filter."""
    from tez_spark.operators.core import tracked_persist

    docs = load_table(spark, sf_dir, "documents")
    fp = simhash_fingerprints(docs)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                ((F.col("simhash") / F.lit(2 ** (b * _BAND_WIDTH))).cast("long")
                 % F.lit(2**_BAND_WIDTH)).alias("sig"),
            )
            for b in range(SIMHASH_BANDS)
        ]
    )
    # Both sides of the self-join read this frame; without the persist the
    # md5-explode + 32-term fingerprint aggregation (the heaviest stage)
    # executes twice — Catalyst does not CSE across a self-join.
    banded = tracked_persist(
        fp.select("doc_id", "simhash", F.explode(bands).alias("bs")).select(
            "doc_id", "simhash", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
        )
    )
    a = banded.alias("a")
    b = banded.alias("b")
    # A pair sharing k bands comes out of the equijoin k times. Instead of
    # a distinct (a full shuffle of the candidate set — the fixtures are
    # templated, so candidates run to millions of rows at sf0.1), keep a
    # pair only in its FIRST matching band: both full fingerprints ride
    # along in the join row, so "some earlier band also matches" is a pure
    # map-side xor/byte test and the join output is exactly one row per
    # pair with no dedup stage at all.
    xor = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    earlier_band_matches = F.lit(False)
    for bp in range(SIMHASH_BANDS):
        band_eq = (
            F.shiftrightunsigned(xor, bp * _BAND_WIDTH) % F.lit(2**_BAND_WIDTH)
        ) == 0
        earlier_band_matches = earlier_band_matches | (
            (F.lit(bp) < F.col("a.band")) & band_eq
        )
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(~earlier_band_matches)
        .select(
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
            F.bit_count(xor).cast("long").alias("hamming"),
        )
    )
    return bounded_sort(pairs.filter(F.col("hamming") <= HAMMING_MAX), "da", "db")


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

_SH_CTE = """
    WITH t AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, array_to_string(list_slice(toks, i + 1, i + 3), ' ') AS sh
        FROM t, unnest(range(len(toks) - 2)) AS u(i)
        WHERE len(toks) >= 3
    ), sizes AS (
        SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
    ), inter AS (
        SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT da, db, i / (sa.n + sb.n - i) AS j
    FROM inter
    JOIN sizes sa ON da = sa.doc_id
    JOIN sizes sb ON db = sb.doc_id
"""

_JACCARD_SQL = f"""
    SELECT da, db, j FROM ({_SH_CTE}) WHERE j >= 0.8 ORDER BY da, db
"""

# Exact truth for incremental dedup: every J>=0.8 pair touching the
# ~10% "new batch" split (md5(doc_id) >= 'e6'), oriented corpus-doc-as-da
# for cross-split pairs and da<db within the batch; corpus×corpus pairs
# are excluded (previous snapshots already deduped them).
_INCREMENTAL_SQL = f"""
    WITH parts AS (
        SELECT doc_id,
               substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' AS is_corpus
        FROM documents
    ), base_pairs AS (
        SELECT da, db, j FROM ({_SH_CTE}) WHERE j >= 0.8
    )
    SELECT CASE WHEN pb.is_corpus THEN p.db ELSE p.da END AS da,
           CASE WHEN pb.is_corpus THEN p.da ELSE p.db END AS db,
           j
    FROM base_pairs p
    JOIN parts pa ON p.da = pa.doc_id
    JOIN parts pb ON p.db = pb.doc_id
    WHERE NOT (pa.is_corpus AND pb.is_corpus)
    ORDER BY da, db
"""

_SIMHASH_SQL = """
    WITH words AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
        FROM documents
    ), fp AS (
        SELECT doc_id,
               CAST(SUM_BITS AS BIGINT) AS simhash
        FROM words GROUP BY doc_id
    )
    SELECT a.doc_id AS da, b.doc_id AS db,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    ORDER BY da, db
"""


def _simhash_sum_bits_sql() -> str:
    terms = []
    for j in range(SIMHASH_BITS):
        terms.append(
            f"CASE WHEN sum(CASE WHEN substring(md5(word), {j + 1}, 1) >= '8' "
            f"THEN 1 ELSE -1 END) > 0 THEN {2**j} ELSE 0 END"
        )
    return " + ".join(terms)


_EMB_PAIR = """list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"""

_EMB_CLUSTERS_SQL = f"""
    WITH RECURSIVE pairs AS (
        SELECT a.vec_id AS da, b.vec_id AS db
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE {_EMB_PAIR} >= 0.45
    ), nodes AS (
        SELECT DISTINCT vec_id FROM (
            SELECT da AS vec_id FROM pairs UNION SELECT db FROM pairs)
    ), edges AS (
        SELECT da AS src, db AS dst FROM pairs
        UNION SELECT db, da FROM pairs
    ), reach(src, dst) AS (
        SELECT vec_id, vec_id FROM nodes
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT MIN(dst) AS component, src AS vec_id
    FROM reach GROUP BY src ORDER BY 1, 2
"""

_CLUSTERS_SQL = f"""
    WITH RECURSIVE pairs AS (
        SELECT da, db FROM ({_SH_CTE}) WHERE j >= 0.8
    ), nodes AS (
        SELECT DISTINCT doc_id FROM (
            SELECT da AS doc_id FROM pairs UNION SELECT db FROM pairs)
    ), edges AS (
        SELECT da AS src, db AS dst FROM pairs
        UNION SELECT db, da FROM pairs
    ), reach(src, dst) AS (
        SELECT doc_id, doc_id FROM nodes
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT MIN(dst) AS component, src AS doc_id
    FROM reach GROUP BY src ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# edit-distance near-dup (candidate-bounded Levenshtein verification)
# ---------------------------------------------------------------------------

# Char-level edit-distance radius. Fixture near-dup band sits at ed 4-8
# with the next pair mass at ~38, so 16 separates signal from noise with
# margin on both sides.
K_ED = 16


def q_dedup_editdistance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance profile of the corpus's near-dup pairs: for every
    exact-Jaccard >= 0.8 pair (the dedup_ngram_jaccard truth, reached
    through the memoized shared shingle artifact), the char-level
    Levenshtein distance — computed with the K_ED-banded threshold
    algorithm (F.levenshtein's 3-arg form: O(K*L) per pair instead of
    O(L^2), -1 when the band is exceeded). Completes the fuzzy-dedup
    family (set overlap: jaccard/minhash; bit fingerprint: simhash;
    fingerprint sampling: winnow) with the sequence-edit metric — the
    verifier of record for OCR noise and small in-place mutations,
    where token-set metrics under-count single-char churn inside words.

    CANDIDATE-BOUNDED BY DESIGN: the sequence metric is verified only
    on pairs the set-overlap stage already surfaced, so the plan adds
    two broadcast joins (the pair list is output-bounded) + one banded
    DP per near-dup pair on top of the shared jaccard lineage. At
    100TB the candidate source swaps to the MinHash band join
    (dedup_minhash_lsh) with its (1-j^4)^32 miss bound; everything
    downstream is unchanged.

    Discovery BY edit distance alone is the harder problem and is
    deliberately NOT this query: editdistance_pairs below implements
    the exact small-scale path (width-K length-bucket equijoin — an
    exact-complete candidate window, but quadratic WITHIN a window:
    the sf0.1 fixture's 5k docs already yield 812k candidate pairs =
    ~12 min of DP, measured, and the all-pairs SQL oracle degrades the
    same way). It stays an operator with a brute-force-DP property
    test (tests/test_dedup_property.py); exact ed-only discovery at
    corpus scale is passjoin_pairs below (PassJoin segment indexing,
    Li et al. ICDE 2011 — built, property-tested, 37 s vs the length
    window's 714 s at sf0.1/k=16, and linear in docs). Reference tie:
    candidates-then-verify is the same two-stage shape as the
    reference's grouped-key iteration followed by user verification
    (OrderedGroupedKVInput, ValuesIterator.java:45); the metric itself
    is new capability.
    """
    sh = shingle_table(spark, sf_dir)
    pairs = _pair_jaccard(sh).filter(F.col("j") >= 0.8).select("da", "db")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # Only output-bounded relations are ever broadcast: pairs into the
    # first doc scan (picks up ta), then that still-pair-sized result
    # into the second doc scan (picks up tb). The corpus itself is
    # never broadcast and never shuffled here.
    with_ta = (
        docs.select(F.col("doc_id").alias("da"), F.col("text").alias("ta"))
        .join(F.broadcast(pairs), "da")
    )
    out = (
        docs.select(F.col("doc_id").alias("db"), F.col("text").alias("tb"))
        .join(F.broadcast(with_ta), "db")
        .select(
            "da",
            "db",
            F.levenshtein("ta", "tb", K_ED).cast("long").alias("dist"),
        )
    )
    return bounded_sort(out, "da", "db")


def editdistance_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = K_ED,
) -> DataFrame:
    """(da, db, dist) for every id pair with levenshtein <= k, via the
    width-k length-bucket equijoin described in q_dedup_editdistance."""
    base = docs.select(
        F.col(id_col), F.col(text_col), F.length(text_col).alias("_l")
    )
    bk = F.floor(F.col("_l") / k)
    a = base.select(
        F.col(id_col).alias("da"),
        F.col(text_col).alias("ta"),
        F.col("_l").alias("la"),
        bk.alias("_bk"),
    )
    b = base.select(
        F.col(id_col).alias("db"),
        F.col(text_col).alias("tb"),
        F.col("_l").alias("lb"),
        F.explode(F.array(bk - 1, bk, bk + 1)).alias("_bk"),
    )
    return (
        a.join(b, "_bk")
        .filter(
            (F.col("da") < F.col("db")) & (F.abs(F.col("la") - F.col("lb")) <= k)
        )
        .withColumn("dist", F.levenshtein("ta", "tb").cast("long"))
        .filter(F.col("dist") <= k)
        .select("da", "db", "dist")
    )


def passjoin_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = K_ED,
) -> DataFrame:
    """Exact edit-distance DISCOVERY at corpus scale: every (da, db,
    dist) with levenshtein <= k, candidates from PassJoin-style segment
    indexing (Li, Deng, Feng, ICDE 2011) instead of the quadratic
    length-window join of editdistance_pairs.

    Pigeonhole: <= k edits touch <= k of a string's k+1 contiguous
    segments, so for any pair with ed <= k at least one segment of s
    survives VERBATIM in t, shifted by at most k positions. Candidates
    therefore come from an EQUIJOIN:

    - index side: each doc's k+1 even-partition segments as rows
      (segment_text, segment_index, segment_len) — k+1 rows per doc;
    - probe side: multi-match-aware substring selection (the paper's
      §4): for each partner length la in [L-k, L+k] and segment i, the
      match position is confined to the intersection of the two error
      cones [p0-i, p0+i] and [p0+dl-(k-i), p0+dl+(k-i)] around the
      partner's segment start p0(la) — at most i edits precede the
      FIRST unedited segment and at most k-i follow it. ~85 probe
      rows/doc measured at k=4/sf0.1 (vs ~255 for the earlier +/-2k
      all-lengths window), with la in the join key so cross-length
      false candidates never materialize: 261 candidate pairs for 251
      true pairs at sf0.1 — essentially output-bounded. LINEAR in
      corpus size, vs the length-window join's quadratic-within-window
      candidates (812k pairs at sf0.1, PERF.md round 7).

    Matched (segment, i, slen) rows join, duplicate candidates collapse,
    and banded levenshtein verifies — candidates-then-verify again.
    Docs too short to fill k+1 nonempty segments (L <= k) have no
    pigeonhole guarantee; any partner within ed <= k then has
    L' <= 2k, so the short stratum cross-joins DISTINCT TEXTS of the
    <= 2k length class (levenshtein-prefiltered, ids expanded back only
    for verified text pairs) — bounded by distinct short strings, not
    rows, so a corpus with millions of empty/near-empty docs stays
    linear (VERDICT r8 item 7; planted-block property test in
    tests/test_dedup_property.py). Pairing is a banded-length EQUIJOIN
    — never an explicit broadcast, so it is safe at ANY k (ADVICE r9);
    AQE broadcasts the tiny side on its own when warranted.

    Equality with editdistance_pairs (itself brute-force-DP-verified)
    on random mutated corpora: tests/test_dedup_property.py. Measured
    at sf0.1 (5k docs): 2.2 s warm at k=4 with the multi-match probe
    (3.6 s with the +/-2k window it replaced; 714 s for the
    length-window join at k=16). Not a registry query (the discovery
    query above is the oracled surface); this is the operator."""
    base = docs.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("txt"),
        F.length(text_col).alias("L"),
    )
    kk = F.lit(k)
    from tez_spark.operators.core import fan_out

    # Slot-target spread before the segment/probe explodes (r17): the
    # probe side fans every doc into ~(k+1)x(2k+1)xO(k) substring rows
    # (~85/doc measured at k=4) — compute-heavy per-row work, exactly
    # fan_out's documented case — and a KB-scale corpus arrives as ONE
    # parquet split, serializing it all on one core (measured at sf0.1:
    # the probe stage was the query's whole executor bill). Both strata
    # consume the same spread subtree, so the exchange is planned once
    # and reused; at 100TB the scan's natural splits make this a no-op.
    long_docs = fan_out(base.filter(F.col("L") > k))
    idx = (
        long_docs.select(
            "id",
            "txt",
            "L",
            F.explode(F.sequence(F.lit(0), kk)).alias("i"),
        )
        .withColumn("m", (F.col("L") / (k + 1)).cast("long"))
        .withColumn("r", F.col("L") % (k + 1))
        .withColumn(
            "start", F.col("i") * F.col("m") + F.least(F.col("i"), F.col("r"))
        )
        .withColumn(
            "slen", F.col("m") + (F.col("i") < F.col("r")).cast("long")
        )
        .filter(F.col("slen") > 0)
        .select(
            F.col("id").alias("ia"),
            F.col("L").alias("la"),
            "i",
            "slen",
            F.expr("substring(txt, start + 1, slen)").alias("seg"),
        )
    )
    # probe rows: multi-match-aware substring selection (Li et al.,
    # ICDE 2011 §4 — the paper's actual contribution, VERDICT r8 item
    # 3). For each candidate PARTNER LENGTH la in [L-k, L+k], the
    # partner's segment i starts at p0(la); a verbatim match in this
    # doc must start within the intersection of the two error cones:
    #   offset in [max(-i, dl-(k-i)), min(i, dl+(k-i))],  dl = L - la
    # (at most i edits can precede the FIRST unedited segment, at most
    # k-i can follow it). That is O(1)-to-O(k) positions per (i, la) —
    # 85.0 probe rows/doc measured at k=4/sf0.1 (425k rows / 5k docs;
    # r10 re-measure, reconciling the stale ~108 figure ADVICE r9
    # flagged) vs the ~255 of the previous +/-2k all-lengths window —
    # and la joins as a key, so cross-length false
    # candidates vanish instead of being filtered after the join.
    # Probing only long docs is still complete: a short doc's (L <= k)
    # partners all sit at L' <= 2k, so cand_short below already
    # generates every such pair.
    probe = (
        long_docs.select(
            "id", "txt", "L", F.explode(F.sequence(F.lit(0), kk)).alias("i")
        )
        # partner length la in [max(L-k, k+1), L+k] (partners with
        # la <= k have no segment index; the short stratum covers them)
        .withColumn(
            "la",
            F.explode(
                F.sequence(
                    F.greatest(F.col("L") - kk, F.lit(k + 1)), F.col("L") + kk
                )
            ),
        )
        # the PARTNER's even-partition geometry for this (i, la)
        .withColumn("m", (F.col("la") / (k + 1)).cast("long"))
        .withColumn("r", F.col("la") % (k + 1))
        .withColumn(
            "p0", F.col("i") * F.col("m") + F.least(F.col("i"), F.col("r"))
        )
        .withColumn("slen", F.col("m") + (F.col("i") < F.col("r")).cast("long"))
        .withColumn("dl", F.col("L") - F.col("la"))
        .withColumn(
            "p_lo",
            F.greatest(
                F.col("p0") - F.col("i"),
                F.col("p0") + F.col("dl") - (kk - F.col("i")),
                F.lit(0),
            ),
        )
        .withColumn(
            "p_hi",
            F.least(
                F.col("p0") + F.col("i"),
                F.col("p0") + F.col("dl") + (kk - F.col("i")),
                F.col("L") - F.col("slen"),
            ),
        )
        # sequence(lo, hi) DESCENDS when lo > hi — guard the empty window
        .filter(F.col("p_lo") <= F.col("p_hi"))
        .withColumn("p", F.explode(F.sequence(F.col("p_lo"), F.col("p_hi"))))
        .select(
            F.col("id").alias("ib"),
            F.col("la"),
            "i",
            "slen",
            F.expr("substring(txt, p + 1, slen)").alias("seg"),
        )
    )
    cand_long = (
        idx.join(probe, ["seg", "i", "slen", "la"])
        .filter(F.col("ia") != F.col("ib"))
        .select(
            F.least("ia", "ib").alias("da"), F.greatest("ia", "ib").alias("db")
        )
    )
    # short stratum: L <= k docs against the L' <= 2k class. Collapse to
    # DISTINCT TEXTS first (VERDICT r8 item 7): a web corpus can hold
    # millions of empty/1-char docs, and an id-level cross join there is
    # quadratic in ROWS; distinct short strings over alphabet sigma are
    # bounded by min(distinct texts, |sigma|^2k), so the cross join and
    # the levenshtein prefilter run on text classes, and ids expand back
    # only for text pairs already verified ed <= k (output-bounded).
    stext = base.filter(F.col("L") <= 2 * k)
    rep = stext.select(
        F.col("txt").alias("t_any"), F.col("L").alias("l_any")
    ).distinct()
    rep_short = rep.filter(F.col("l_any") <= k).select(
        F.col("t_any").alias("t_sh"), F.col("l_any").alias("l_sh")
    )
    # Pairing via a banded-length EQUIJOIN, never an explicit broadcast
    # (ADVICE r9: broadcasting ALL distinct <=2k-length texts is safe at
    # the declared k=4 radius but unguarded at arbitrary k — at k=16 a
    # diverse corpus's distinct <=32-char strings can blow the driver/
    # broadcast limit). Each short text probes partner lengths
    # [max(0, l_sh - k), l_sh + k] (<= 2k+1 keys/row, exactly the
    # |l_sh - l_any| <= k band) and length joins as a key — same
    # candidates, no driver materialization at ANY k, and when the
    # stratum is genuinely tiny AQE turns the shuffle join into a
    # broadcast join on its own (no hand-gated count() job, which cost
    # ~0.4 s of serialized driver time per invocation when measured).
    keyed = rep_short.withColumn(
        "l_any",
        F.explode(
            F.sequence(
                F.greatest(F.col("l_sh") - kk, F.lit(0)),
                F.col("l_sh") + kk,
            )
        ),
    )
    cand_txt = (
        keyed.join(rep, "l_any")
        .filter(F.levenshtein("t_sh", "t_any", k) >= 0)
        .select("t_sh", "t_any")
    )
    ids_a = stext.select(F.col("id").alias("ia"), F.col("txt").alias("t_sh"))
    ids_b = stext.select(F.col("id").alias("ib"), F.col("txt").alias("t_any"))
    cand_short = (
        cand_txt.join(ids_a, "t_sh")
        .join(ids_b, "t_any")
        .filter(F.col("ia") != F.col("ib"))
        .select(
            F.least("ia", "ib").alias("da"), F.greatest("ia", "ib").alias("db")
        )
    )
    cand = cand_long.unionByName(cand_short).distinct()
    ta = docs.select(F.col(id_col).alias("da"), F.col(text_col).alias("ta"))
    tb = docs.select(F.col(id_col).alias("db"), F.col(text_col).alias("tb"))
    return (
        cand.join(ta, "da")
        .join(tb, "db")
        .withColumn("dist", F.levenshtein("ta", "tb", k).cast("long"))
        .filter(F.col("dist") >= 0)
        .select("da", "db", "dist")
    )


# editdistance_discovery's declared radius: the common near-dup
# workloads (OCR noise, single-token mutations) live at small k, where
# passjoin's per-doc probe constant is tiny (measured 2.2 s warm at
# sf0.1/k=4 with the multi-match probe). Distinct from K_ED (the PROFILE
# radius): the profile verifies a metric on already-found candidates,
# discovery must find the pairs — its cost is the probe fan-out, so it
# declares the radius users actually discover at.
K_ED_DISCOVERY = 4


def q_editdistance_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance DISCOVERY as a driver-verified query: every doc
    pair with levenshtein <= K_ED_DISCOVERY, found by passjoin_pairs'
    PassJoin segment index (no prior candidate stage — this query IS
    the candidate generator, unlike dedup_editdistance which profiles
    pairs the Jaccard stage already surfaced).

    Oracle strategy (VERDICT r7 item 1): the DuckDB side re-implements
    the same multi-match-aware candidate equijoin via
    unnest(range(...)) — candidate-bounded at every SF exactly like the
    Spark plan (1.8 s at sf0.1 vs >120 s for the naive length-window
    oracle, measured) — then verifies with full levenshtein. Candidate
    COMPLETENESS is independently pinned two ways: the brute-force-DP
    property test (tests/test_dedup_property.py) and a fixture-level
    equality check of this oracle against the all-pairs length-window
    truth at both correctness SFs (24/24 pairs, r8 build log; re-run
    green after the r9 probe tightening). Same self-validating-join
    shape as the reference's JoinValidate
    (tez-examples/.../JoinValidate.java:151-181).

    Scale: linear in docs — k+1 index rows and O(k) probe rows per
    (doc, partner-length), equijoin on (segment, i, slen, la),
    banded-DP verify on matched candidates only. At k=4/sf0.1 that is
    5 index rows and ~85 probe rows per doc, and 261 candidates for
    251 true pairs — the verify set is output-bounded. Engine 2.2 s /
    oracle 1.8 s warm min-of-3 at sf0.1 (PERF.md round 9; was 3.6 s /
    1.1 s with the +/-2k probe — the r8 'weak' flag)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = passjoin_pairs(docs, k=K_ED_DISCOVERY)
    # global_sort, not bounded_sort: the discovery surface is ALL pairs
    # with ed<=k — near-dup pair count grows ~SF-proportionally in these
    # corpus families, exactly the corpus-scaled case bounded_sort's
    # docstring excludes (ADVICE r8).
    from tez_spark.operators.core import global_sort

    return global_sort(out, "da", "db")


def _passjoin_oracle_sql(k: int) -> str:
    """DuckDB twin of passjoin_pairs: identical segment index + probe
    windows (unnest(range()) instead of explode(sequence())), identical
    short-stratum corner, full-levenshtein verify."""
    return f"""
    WITH base AS (
      SELECT doc_id AS id, text AS txt, length(text) AS L FROM documents
    ), long_docs AS (
      SELECT * FROM base WHERE L > {k}
    ), seg AS (
      SELECT id, txt, L, unnest(range(0, {k} + 1)) AS i FROM long_docs
    ), idx AS (
      SELECT id AS ia, L AS la, i,
             (L // ({k}+1)) + CASE WHEN i < (L % ({k}+1)) THEN 1 ELSE 0 END AS slen,
             substring(txt,
                       CAST(i * (L // ({k}+1)) + least(i, L % ({k}+1)) + 1 AS INT),
                       CAST((L // ({k}+1)) + CASE WHEN i < (L % ({k}+1)) THEN 1 ELSE 0 END AS INT)
             ) AS sg
      FROM seg
      WHERE (L // ({k}+1)) + CASE WHEN i < (L % ({k}+1)) THEN 1 ELSE 0 END > 0
    ), probe0 AS (
      SELECT id, txt, L, i,
             unnest(range(greatest(L - {k}, {k} + 1), L + {k} + 1)) AS la
      FROM seg
    ), probe1 AS (
      SELECT id, txt, L, i, la,
             (la // ({k}+1)) + CASE WHEN i < (la % ({k}+1)) THEN 1 ELSE 0 END AS slen,
             i * (la // ({k}+1)) + least(i, la % ({k}+1)) AS p0,
             L - la AS dl
      FROM probe0
    ), probe2 AS (
      SELECT id, txt, L, i, la, slen,
             greatest(p0 - i, p0 + dl - ({k} - i), 0) AS p_lo,
             least(p0 + i, p0 + dl + ({k} - i), L - slen) AS p_hi
      FROM probe1
    ), probe AS (
      SELECT id AS ib, la, i, slen,
             substring(txt, CAST(unnest(range(p_lo, p_hi + 1)) + 1 AS INT),
                       CAST(slen AS INT)) AS sg
      FROM probe2 WHERE p_lo <= p_hi
    ), cand_long AS (
      SELECT DISTINCT least(ia, ib) AS da, greatest(ia, ib) AS db
      FROM idx JOIN probe USING (sg, i, slen, la)
      WHERE ia <> ib
    ), srep AS (
      SELECT DISTINCT txt, L FROM base WHERE L <= 2*{k}
    ), scand AS (
      SELECT a.txt AS t_sh, b.txt AS t_any
      FROM srep a JOIN srep b
        ON a.L <= {k} AND abs(a.L - b.L) <= {k}
       AND levenshtein(a.txt, b.txt) <= {k}
    ), shorts AS (
      SELECT least(x.id, y.id) AS da, greatest(x.id, y.id) AS db
      FROM scand s JOIN base x ON x.txt = s.t_sh JOIN base y ON y.txt = s.t_any
      WHERE x.id <> y.id
    ), cand AS (
      SELECT da, db FROM cand_long UNION SELECT da, db FROM shorts
    ), d AS (
      SELECT c.da, c.db, levenshtein(a.txt, b.txt) AS raw
      FROM cand c JOIN base a ON a.id = c.da JOIN base b ON b.id = c.db
    )
    SELECT da, db, CAST(raw AS BIGINT) AS dist FROM d
    WHERE raw <= {k}
    ORDER BY da, db
    """


_ED_DISCOVERY_SQL = _passjoin_oracle_sql(K_ED_DISCOVERY)


# DuckDB has no thresholded levenshtein; the CASE reproduces Spark's
# 3-arg -1-when-exceeded contract. Candidate pairs come from the same
# _SH_CTE exact-Jaccard truth the rest of the family oracles use, so
# the oracle stays pair-bounded at every SF.
_EDITDISTANCE_SQL = f"""
    WITH pairs AS (
        SELECT da, db FROM ({_SH_CTE}) WHERE j >= 0.8
    ), d AS (
        SELECT p.da, p.db, levenshtein(a.text, b.text) AS raw
        FROM pairs p
        JOIN documents a ON a.doc_id = p.da
        JOIN documents b ON b.doc_id = p.db
    )
    SELECT da, db,
           CASE WHEN raw <= {K_ED} THEN CAST(raw AS BIGINT)
                ELSE CAST(-1 AS BIGINT) END AS dist
    FROM d
    ORDER BY da, db
"""


ORACLE: dict[str, str] = {
    "dedup_editdistance": _EDITDISTANCE_SQL,
    "editdistance_discovery": _ED_DISCOVERY_SQL,
    "dedup_exact": """
        SELECT COUNT(*) AS n_docs, COUNT(DISTINCT text) AS n_unique FROM documents
    """,
    "dedup_clusters": _CLUSTERS_SQL,
    "dedup_embedding_clusters": _EMB_CLUSTERS_SQL,
    "dedup_ngram_jaccard": _JACCARD_SQL,
    # LSH output == exact output up to a ~5e-8 per-pair miss probability;
    # declared against the exact oracle deliberately (recall is part of
    # the contract).
    "dedup_minhash_lsh": _JACCARD_SQL,
    # winnow-candidate recall is exact on long-run near-dups (see
    # q_dedup_winnow docstring) — declared against the exact oracle.
    "dedup_winnow": _JACCARD_SQL,
    "dedup_simhash": _SIMHASH_SQL.replace("SUM_BITS", _simhash_sum_bits_sql()),
    # LSH candidates (new-vs-corpus + new-vs-new) + exact verification;
    # same exact-oracle declaration as dedup_minhash_lsh.
    "dedup_incremental": _INCREMENTAL_SQL,
}

QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_editdistance": q_dedup_editdistance,
    "editdistance_discovery": q_editdistance_discovery,
    "dedup_incremental": q_dedup_incremental,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_winnow": q_dedup_winnow,
    "dedup_simhash": q_dedup_simhash,
    "dedup_clusters": q_dedup_clusters,
    "dedup_embedding_clusters": q_dedup_embedding_clusters,
}


def prewarm_corpus_artifacts(spark: SparkSession, sf_dir: str) -> float:
    """Materialize the session-shared corpus artifacts (shingle / LSH
    band / winnow / incremental signature-store tables) and return the
    build seconds — THE warm-session prewarm protocol bench.py declares
    (Tez prewarm parity). Shared by bench.py and tools/job_histogram.py
    (r12 review: two hand-copied prewarm blocks meant a new shared
    artifact could silently diverge the histogram's floor attribution
    from the bench protocol it mirrors)."""
    import time as _time

    t0 = _time.monotonic()
    shingle_table(spark, sf_dir).count()
    lsh_candidate_table(spark, sf_dir).count()
    winnow_table(spark, sf_dir).count()
    corpus_artifacts(spark, sf_dir)[1].count()
    # r13/r14: the ExactSubstr artifacts. Under the shipped "dupset"
    # posture the persisted artifacts are the dup-gram SETS — char and
    # token — plus the span table (instance rows recompute map-side;
    # counting the un-persisted gram plans here would explode the
    # corpus for nothing); under the A/B's "instances" posture they
    # are the full gram instance tables.
    from tez_spark.functions import text_queries as _tq

    if _tq.GRAM_POSTURE == "instances":
        _tq.char_gram_table(spark, sf_dir).count()
        _tq.token_gram_table(spark, sf_dir).count()
    _tq.dup_char_gram_set(spark, sf_dir).count()
    _tq.dup_token_gram_set(spark, sf_dir).count()
    _tq.char_span_table(spark, sf_dir).count()
    return round(_time.monotonic() - t0, 3)
