"""Similarity search over embedding columns (north-star extension,
SURVEY.md §7 step 7 — no reference analog; Tez has no vector ops).

Two paths:
- brute-force cosine top-k: broadcast the (small) query set against the
  full corpus — one scan, no shuffle of the corpus, exact. The baseline
  and the oracle.
- LSH (random hyperplane) top-k: signature bucketing prunes the corpus
  before exact re-ranking. The 100TB path: candidate generation is an
  equijoin on (band, signature) — shuffle keys are ~uniform hash values,
  and per-bucket work is bounded. Probabilistic recall -> the registry
  surfaces (q_ann_lsh, q_dedup_embedding_lsh) are in-query recall
  contracts verified against the exact path in the same plan (driver
  hash-checks them); tests additionally assert recall against the
  brute-force truth at the driver SFs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tez_spark.functions.vectors import as_double, cosine
from tez_spark.sources.catalog import load_table, read_parquet_cached
from tez_spark.operators.core import bounded_sort

K = 5
N_QUERIES = 10  # query set = vec_id < 10, fixed for oracle reproducibility

# LSH config: 12 tables x 4 hyperplanes (4-bit signatures, 16 buckets per
# table). Tuned for the fixtures' uniform-random embeddings, where top-5
# neighbors sit at cosine ~0.3-0.5 — LSH's worst case: P(bucket match per
# table) = (1-θ/π)^4 ≈ 0.13-0.18 per table. 8 tables left the ann_lsh
# recall contract with ZERO margin at sf0.1 (min exact-top-K overlap 1
# with >=1 required — ADVICE r9); 12 tables measure min 3/3/3 across
# sf0.001/0.01/0.1 (3x margin) and lift dedup_embedding_lsh recall to
# 0.71/1.00/0.95 (>=1.4x over its 0.5 bound), for +50% signature-shuffle
# on a path measured at 8 MB. Real clustered embeddings (the 100TB case)
# have much closer neighbors — raise LSH_PLANES there for sharper pruning
# and fewer tables. Planes are deterministic (seed 42), generated once
# driver-side and embedded as literals — tiny (tables*planes*dim doubles)
# and identical on every executor.
LSH_TABLES = 12
LSH_PLANES = 4
_LSH_SEED = 42
# Small ABSOLUTE slack for cross-kernel threshold comparisons: different
# BLAS reduction orders disagree in the last bits for pairs sitting
# exactly on a similarity threshold (ADVICE r9). Not "1 ulp" — one ulp
# at 0.45 is ~5.5e-17; 1e-12 is ~2e4 ulps, sized as a comfortable upper
# bound on dim * eps * ||x||*||y|| reduction-order divergence for the
# 64-dim unit-norm fixtures (64 * 2.2e-16 ≈ 1.4e-14, ~70x margin)
# while staying ~9 orders below the 1e-3-scale similarity gaps that
# matter (ADVICE r10 wording fix).
_THRESH_EPS = 1e-12


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_chunk_rows: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine: numpy matmul per Arrow batch against a
    driver-broadcast normalized query matrix, LOCAL top-k per partition,
    then a global windowed merge over the tiny survivor set.

    Design (100TB): the corpus is never shuffled — each task scores its
    partition against the broadcast query block and emits only
    k·|queries| rows, so the merge shuffle is negligible. BLAS matmul
    replaces zip_with/aggregate cosine: Catalyst evaluates higher-order
    functions interpreted per element, which benchmarked ~100x slower
    than vectorized numpy for dense float math.

    query_chunk_rows bounds DRIVER memory exactly like
    ann_ivf_probe_index's probe_chunk_rows (r11 — added when
    q_ann_incremental's audit path started brute-forcing a
    corpus-scaled batch instead of the fixed 10-query set): the query
    set streams via toLocalIterator in chunks, each chunk pays one
    corpus pass, and per-query top-k composes losslessly across chunks
    because queries partition. Each chunk's k-row-per-query RESULT is
    collected before the next chunk starts (r11 review: retaining
    per-chunk plans/broadcasts until one final action would hold every
    chunk's query vectors driver-resident simultaneously — the O(input)
    footprint this mode exists to avoid), so peak extra driver state is
    one chunk of vectors plus the O(k x |queries|) result rows the
    caller is asking for. None collects the whole query set at once —
    right for bounded query sets; a corpus-scaled audit sets a chunk
    size and pays extra scans, never input-sized driver memory."""
    if query_chunk_rows is not None:
        out_schema = f"q_id long, {id_col} long, sim double, rn long"
        result_rows: list[tuple] = []
        buf: list = []

        def flush() -> None:
            if not buf:
                return
            chunk = queries.sparkSession.createDataFrame(
                [(r[0], list(r[1])) for r in buf],
                f"{id_col} long, {vec_col} array<double>",
            )
            result_rows.extend(
                tuple(r)
                for r in brute_force_topk(
                    corpus, chunk, k, id_col, vec_col
                ).collect()
            )
            buf.clear()

        proj = queries.select(F.col(id_col), as_double(vec_col).alias("v"))
        for r in proj.toLocalIterator():
            buf.append(r)
            if len(buf) >= query_chunk_rows:
                flush()
        flush()
        return queries.sparkSession.createDataFrame(result_rows, out_schema)

    q_rows = queries.select(F.col(id_col), as_double(vec_col).alias("v")).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)
    scored = _local_topk_scored(corpus, q_ids, Qn, k, id_col, vec_col)
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
    )


def _local_topk_scored(
    corpus: DataFrame,
    q_ids: "np.ndarray",
    Qn: "np.ndarray",
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map side of brute_force_topk for a PREPARED normalized query
    block: per corpus partition, exact per-query top-k candidate rows
    (q_id, id_col, sim). Any global top-k row survives its own
    partition's cut, so one downstream rank (brute_force_topk's window,
    or _recall_contract's) recovers the exact global top-k — split out
    (r16) so q_ann_incremental can defer that rank into its single
    final action instead of paying a separate collect per chunk."""
    import pandas as pd

    from tez_spark.operators.core import fan_out

    bq = corpus.sparkSession.sparkContext.broadcast((q_ids, Qn))

    c = fan_out(corpus.select(F.col(id_col), as_double(vec_col).alias("v")))

    def local_topk(batches):
        q_ids_, Qn_ = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
            S = Cn @ Qn_.T  # corpus_rows x n_queries
            ids = pdf[id_col].to_numpy()
            out_q, out_c, out_s = [], [], []
            for j, qid in enumerate(q_ids_):
                col = S[:, j]
                cand = np.nonzero(ids != qid)[0]
                if not len(cand):
                    continue
                take = min(k, len(cand))
                # partial top-k by (sim desc, id asc) within the partition
                order = np.lexsort((ids[cand], -col[cand]))[:take]
                sel = cand[order]
                out_q.extend([qid] * len(sel))
                out_c.extend(ids[sel].tolist())
                out_s.extend(col[sel].tolist())
            yield pd.DataFrame({"q_id": out_q, id_col: out_c, "sim": out_s}).astype(
                {"q_id": "int64", id_col: "int64", "sim": "float64"}
            )

    return c.mapInPandas(local_topk, f"q_id long, {id_col} long, sim double")


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for the fixed query set (vec_id < N_QUERIES)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    out = brute_force_topk(emb, queries)
    return bounded_sort(out, "q_id", "rn")


def _planes(dim: int) -> np.ndarray:
    rng = np.random.RandomState(_LSH_SEED)
    return rng.standard_normal((LSH_TABLES, LSH_PLANES, dim))


def _lsh_signatures(V: np.ndarray, P: np.ndarray) -> np.ndarray:
    """(n, dim) vectors -> (n, LSH_TABLES) integer bucket signatures.
    THE shared signature kernel: ann_lsh_neighbors and q_ann_lsh must
    bucket identically or the recall contract silently decouples from
    the neighbor surface (r9 review finding)."""
    weights = (2 ** np.arange(LSH_PLANES)).astype(np.int64)
    bits = (V @ P.T) > 0
    return (bits.reshape(len(V), LSH_TABLES, LSH_PLANES) * weights).sum(axis=2)


def _lsh_match(sigs: np.ndarray, b2q: dict, nq: int) -> np.ndarray:
    """(n, LSH_TABLES) signatures -> (n, nq) boolean: row r shares at
    least one (table, signature) bucket with query column j."""
    match = np.zeros((len(sigs), nq), dtype=bool)
    for r in range(len(sigs)):
        for t in range(LSH_TABLES):
            for j in b2q.get((t, int(sigs[r, t])), ()):
                match[r, j] = True
    return match


def _lsh_query_setup(queries: DataFrame, dim: int):
    """Driver-side LSH query block shared by ann_lsh_neighbors and
    q_ann_lsh: collect the (small, fixed) query set, signature it with
    the seeded planes, and return (P, bucket_to_qrows, q_ids, Qn) —
    exactly what the executor kernels need broadcast."""
    q_rows = queries.select("vec_id", as_double("embedding").alias("v")).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)
    P = _planes(dim).reshape(LSH_TABLES * LSH_PLANES, dim)
    q_sigs = _lsh_signatures(Q, P)
    bucket_to_qrows: dict[tuple[int, int], list[int]] = {}
    for j in range(len(q_ids)):
        for t in range(LSH_TABLES):
            bucket_to_qrows.setdefault((t, int(q_sigs[j, t])), []).append(j)
    return P, bucket_to_qrows, q_ids, Qn


def ann_lsh_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN neighbor rows: candidates share a (table,
    signature) bucket with the query, then exact cosine re-rank to top-5.
    The rows surface behind q_ann_lsh's recall contract (same split as
    ann_ivf_neighbors / q_ann_ivf); recall asserted against brute force
    in tests/test_similarity.py.

    One Python pass over the corpus, total: the signature stage carries
    each vector alongside its bucket keys and scores bucket-matched rows
    against the broadcast query matrix in the same task — query
    signatures come from the same numpy planes driver-side (the query set
    is already collected for the re-rank matrix), so there is no second
    signature job, no join back to the corpus for vectors, and the only
    shuffle is scalar (q_id, vec_id, sim) rows into the dedup/top-k."""
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    bc = spark.sparkContext.broadcast(_lsh_query_setup(queries, dim=64))

    def sign_and_score(batches):
        P_, b2q, q_ids_, Qn_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
            ids = pdf["vec_id"].to_numpy()
            match = _lsh_match(_lsh_signatures(V, P_), b2q, len(q_ids_))
            match &= ids[:, None] != q_ids_[None, :]  # self-exclusion
            rows_c, rows_q = np.nonzero(match)
            if not len(rows_c):
                continue
            sims = np.einsum("ij,ij->i", Vn[rows_c], Qn_[rows_q])
            yield pd.DataFrame(
                {"q_id": q_ids_[rows_q], "vec_id": ids[rows_c], "sim": sims}
            ).astype({"q_id": "int64", "vec_id": "int64", "sim": "float64"})

    base = fan_out_vectors(emb)
    scored = base.mapInPandas(sign_and_score, "q_id long, vec_id long, sim double")
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return bounded_sort(
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= K),
        "q_id",
        "rn",
    )


def _recall_contract(scored: DataFrame, approx: str, k: int = K) -> DataFrame:
    """Shared tail of the recall-contract promotions (q_ann_ivf,
    q_ann_lsh, q_ann_incremental): given (path, q_id, vec_id, sim) rows
    holding both the 'exact' audit path and the approximate path, rank
    each path to top-k per query and emit (q_id, k_returned, recall_ok)
    where recall_ok asserts the approximate top-k intersects the exact
    top-k in at least one vector.

    One aggregation exchange (r16, VERDICT r15 item 3): the per-query
    intersection is computed from two k-bounded collect_sets instead of
    the former (q_id, vec_id)-keyed dedup pass + re-aggregation — one
    less shuffle per contract query. Precondition (true of all three
    producers: each scores a given (query, vector) pair exactly once
    per path, so post-rank rows are distinct): a producer that ever
    emitted duplicate (path, q_id, vec_id) rows would inflate
    k_returned here where the old dedup pass masked it — pinned by
    tests/test_similarity.py::test_recall_contract_producers_emit_unique_rows,
    which captures each contract query's actual scored frame and
    asserts (path, q_id, vec_id) uniqueness."""
    w = Window.partitionBy("path", "q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    ranked = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    out = ranked.groupBy("q_id").agg(
        F.sum((F.col("path") == approx).cast("int"))
        .cast("long")
        .alias("k_returned"),
        (
            F.size(
                F.array_intersect(
                    F.collect_set(
                        F.when(F.col("path") == approx, F.col("vec_id"))
                    ),
                    F.collect_set(
                        F.when(F.col("path") == "exact", F.col("vec_id"))
                    ),
                )
            )
            >= 1
        ).alias("recall_ok"),
    )
    return bounded_sort(out, "q_id")


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH ANN with an IN-QUERY recall contract (VERDICT r8 item 5 — the
    q_ann_ivf promotion pattern applied to the LSH path): per query,
    (q_id, k_returned, recall_ok) where recall_ok asserts the LSH
    bucket path found at least one of the EXACT cosine top-K, so the
    driver hash-verifies the recall bound end-to-end instead of the
    weaker rows-only contact. Neighbor rows stay available via
    ann_lsh_neighbors — they can't be the oracled surface because
    DuckDB cannot reproduce the seeded hyperplane signatures.

    Bound choice: per-query overlap with the exact top-5 is
    deterministic on a fixture (seeded planes, tie-broken ordering);
    measured min across sf0.001/0.01/0.1 is 3/3/3 hits (r10, at
    LSH_TABLES=12 — 8 tables left sf0.1 at exactly the bound, ADVICE
    r9) on uniform-random embeddings — LSH's worst case (neighbors at
    cosine ~0.3-0.5) — so >= 1 holds everywhere with 3x margin, and
    tests/test_similarity.py evaluates the real booleans at sf0.001,
    sf0.01 AND sf0.1 (the cms_heavyhitters guard pattern).

    ONE corpus pass for both sides: each Arrow batch computes the full
    row x query score matrix once (the exact audit needs it, and the
    LSH candidate scores are a row-subset of it) plus the batch's
    signature bits, then emits local top-k per (path, query) — per-task
    output is 2·K·|queries| scalar rows. At 100TB the exact column is
    the AUDIT: drop it there and keep the LSH path, which only scores
    bucket-matched rows."""
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    # SAME setup + signature kernels as ann_lsh_neighbors — the recall
    # contract is only meaningful if both surfaces bucket identically
    bc = spark.sparkContext.broadcast(_lsh_query_setup(queries, dim=64))
    k = K

    def score_both(batches):
        P_, b2q, q_ids_, Qn_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
            S = Vn @ Qn_.T
            ids = pdf["vec_id"].to_numpy()
            match = _lsh_match(_lsh_signatures(V, P_), b2q, len(q_ids_))
            paths, out_q, out_c, out_s = _local_topk_both(
                S, ids, q_ids_, k, "lsh",
                lambda j, cand: cand[match[cand, j]],
            )
            yield pd.DataFrame(
                {"path": paths, "q_id": out_q, "vec_id": out_c, "sim": out_s}
            ).astype({"q_id": "int64", "vec_id": "int64", "sim": "float64"})

    base = fan_out_vectors(emb)
    scored = base.mapInPandas(
        score_both, "path string, q_id long, vec_id long, sim double"
    )
    return _recall_contract(scored, "lsh", k)


def fan_out_vectors(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    from tez_spark.operators.core import fan_out

    return fan_out(df.select(F.col(id_col), as_double(vec_col).alias("v")))


# IVF config: ~sqrt(corpus) cells at fixture scale; at 100TB raise
# IVF_CELLS so cells stay executor-sized and lower IVF_NPROBE/IVF_CELLS
# for sharper pruning (clustered real embeddings concentrate neighbors in
# few cells; the uniform-random fixtures are IVF's worst case, so nprobe
# is set for recall there).
IVF_CELLS = 64
# nprobe 16 left the q_ann_ivf recall contract with zero margin at sf0.1
# (min exact-top-K overlap 1 of the >=1 required); with the k-means
# centroids below, nprobe=20 measures min 3/2/2 hits across
# sf0.001/0.01/0.1 — >=2x margin at every SF including bench (VERDICT r9
# item 3). Uniform-random fixtures are IVF's worst case; real clustered
# embeddings concentrate neighbors in fewer cells — lower nprobe there.
IVF_NPROBE = 20
# ann_incremental's contract probe: its batch query set (212 at sf0.1)
# makes the min-over-draws ~20x harsher than ann_ivf's 10 queries, and
# nprobe=20 measured a zero-overlap query at sf0.01. 40 measures min
# 2/2/2 exact-top-5 hits across sf0.001/0.01/0.1 (2x margin, the
# ann_ivf precedent). 40-of-64 cells is honest fixture tuning, not the
# scale story: clustered real embeddings prune deeper at smaller nprobe.
ANN_INCR_NPROBE = 40


# Coarse-quantizer training knobs: the sample is n_cells * IVF_KMEANS_SAMPLE
# hashed-id-ordered rows (one TakeOrderedAndProject scan, ~1 MB at the
# defaults) refined with IVF_KMEANS_ITERS spherical Lloyd iterations
# DRIVER-SIDE — the FAISS coarse-quantizer pattern: at 100TB you still
# train the quantizer on a bounded sample, never the corpus.
IVF_KMEANS_SAMPLE = 32
IVF_KMEANS_ITERS = 8


def _sample_centroids(
    df: DataFrame, n_cells: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> np.ndarray:
    """Deterministic IVF centroids, normalized: sample the
    n_cells * IVF_KMEANS_SAMPLE corpus vectors with the smallest
    (hashed id, id) key (TakeOrdered: one scan, only the sample reaches
    the driver; the corpus itself is never collected — the id tiebreak
    makes the sample deterministic even under hash collisions), seed
    with the first n_cells (the rows the pre-r10 sampler picked), then
    refine with spherical k-means driver-side (VERDICT r9 item 3: the
    raw sample left sf0.1 recall at the contract's exact bound; Lloyd
    iterations spread the centroids and buy real margin). Single
    definition shared by the index-build path (ivf_assign) and the
    declared query (q_ann_ivf) so they can never drift apart."""
    cent_rows = (
        df.select(F.col(id_col), as_double(vec_col).alias("v"))
        .orderBy(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(_MERSENNE_P_IVF)),
            F.col(id_col),
        )
        .limit(n_cells * IVF_KMEANS_SAMPLE)
        .collect()
    )
    X = np.array([list(r["v"]) for r in cent_rows], dtype=np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
    C = Xn[:n_cells].copy()
    for _ in range(IVF_KMEANS_ITERS):
        assign = np.argmax(Xn @ C.T, axis=1)
        for c in range(min(n_cells, len(C))):
            members = Xn[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
            # empty cell: keep the previous centroid (deterministic)
        C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
    return C


def ivf_assign(
    df: DataFrame,
    n_cells: int = IVF_CELLS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: "np.ndarray | None" = None,
) -> tuple[DataFrame, np.ndarray]:
    """IVF coarse quantizer: (assignments, centroids).

    Assignment is map-side: each Arrow batch does one matmul against the
    broadcast normalized centroid matrix and takes argmax — no shuffle;
    the returned assignment table carries the vector so probing needs no
    join back to the corpus.

    Pass `centroids` (already normalized) to assign NEW vectors into an
    EXISTING index's cells — the IVF append path a streaming ingest uses
    (centroids stay fixed so earlier cell assignments remain valid)."""
    import pandas as pd

    Cn = (
        centroids
        if centroids is not None
        else _sample_centroids(df, n_cells, id_col=id_col, vec_col=vec_col)
    )
    bcast = df.sparkSession.sparkContext.broadcast(Cn)

    def assign(batches):
        Cn_ = bcast.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
            cells = np.argmax(Vn @ Cn_.T, axis=1).astype(np.int32)
            yield pd.DataFrame(
                {"cell": cells, "_id": pdf["_id"], "_v": pdf["_v"]}
            )

    from tez_spark.operators.core import fan_out

    base = fan_out(
        df.select(F.col(id_col).alias("_id"), as_double(vec_col).alias("_v"))
    )
    assigned = base.mapInPandas(assign, "cell int, _id long, _v array<double>")
    return assigned, Cn


_MERSENNE_P_IVF = (1 << 31) - 1


def _ivf_query_setup(emb: DataFrame, queries: DataFrame):
    """Driver-side IVF query block shared by ann_ivf_neighbors and
    q_ann_ivf (r9 review: the recall contract must probe the same cells
    as the neighbor surface): sampled centroids, collected query block,
    and the per-query probed-cell arrays. Returns (Cn, probed, q_ids,
    Qn) with probed[j] the sorted top-nprobe cell ids for query row j."""
    Cn = _sample_centroids(emb, IVF_CELLS)
    q_rows = queries.select("vec_id", as_double("embedding").alias("v")).collect()
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r["v"]) for r in q_rows], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)
    cell_sims = Qn @ Cn.T
    nprobe = min(IVF_NPROBE, Cn.shape[0])
    probed = {
        j: np.sort(np.argsort(-cell_sims[j])[:nprobe])
        for j in range(len(q_ids))
    }
    return Cn, probed, q_ids, Qn


def _local_topk_both(S, ids, q_ids, k, approx, approx_sub):
    """Shared emit block of the recall-contract kernels (q_ann_lsh,
    q_ann_ivf): per query, local top-k over all candidates ('exact')
    and over approx_sub(j, cand) (the approximate path), tie-broken by
    (sim desc, vec_id asc). Returns the four column lists."""
    paths, out_q, out_c, out_s = [], [], [], []
    for j, qid in enumerate(q_ids):
        col = S[:, j]
        cand = np.nonzero(ids != qid)[0]
        if not len(cand):
            continue
        for path, sub in (("exact", cand), (approx, approx_sub(j, cand))):
            if not len(sub):
                continue
            order = np.lexsort((ids[sub], -col[sub]))[: min(k, len(sub))]
            sel = sub[order]
            paths.extend([path] * len(sel))
            out_q.extend([qid] * len(sel))
            out_c.extend(ids[sel].tolist())
            out_s.extend(col[sel].tolist())
    return paths, out_q, out_c, out_s


def ann_ivf_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-pruned ANN: probe the IVF_NPROBE nearest cells per query, exact
    cosine re-rank of their members to top-5 — the neighbor-row surface
    (q_id, vec_id, sim, rn) a pipeline consumes.

    Fused like q_ann_lsh: the query->probed-cells map is computed
    driver-side on the tiny query x centroid matrix and broadcast; each
    Arrow batch assigns its vectors to cells (one matmul against the
    centroid matrix) and exactly scores them against the probing queries
    in the same task. One corpus scan beyond the TakeOrdered centroid
    sample; the only shuffle is scalar (q_id, vec_id, sim) rows into
    top-k."""
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)

    Cn, probed, q_ids, Qn = _ivf_query_setup(emb, queries)
    cell_to_qrows: dict[int, list[int]] = {}
    for j in range(len(q_ids)):
        for c in probed[j]:
            cell_to_qrows.setdefault(int(c), []).append(j)
    bc = spark.sparkContext.broadcast((Cn, cell_to_qrows, q_ids, Qn))

    def assign_and_score(batches):
        Cn_, c2q, q_ids_, Qn_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
            cells = np.argmax(Vn @ Cn_.T, axis=1)
            ids = pdf["vec_id"].to_numpy()
            rows_c, rows_q = [], []
            for r in range(len(V)):
                for j in c2q.get(int(cells[r]), ()):
                    if q_ids_[j] != ids[r]:
                        rows_c.append(r)
                        rows_q.append(j)
            if not rows_c:
                continue
            sims = np.einsum("ij,ij->i", Vn[rows_c], Qn_[rows_q])
            yield pd.DataFrame(
                {"q_id": q_ids_[rows_q], "vec_id": ids[rows_c], "sim": sims}
            ).astype({"q_id": "int64", "vec_id": "int64", "sim": "float64"})

    base = fan_out_vectors(emb)
    scored = base.mapInPandas(assign_and_score, "q_id long, vec_id long, sim double")
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return bounded_sort(
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= K),
        "q_id",
        "rn",
    )


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with an IN-QUERY recall contract (VERDICT r7 item 7 — the
    cms_heavyhitters/percentiles_approx promotion pattern): per query,
    (q_id, k_returned, recall_ok) where recall_ok asserts the IVF path
    found at least one of the EXACT cosine top-K, so the driver's
    hash check verifies the recall bound end-to-end instead of the
    weaker rows-only contact. Neighbor rows themselves stay available
    via ann_ivf_neighbors / ann_ivf_probe_index — they can't be the
    oracled surface because DuckDB cannot reproduce the xxhash64
    centroid sample.

    Bound choice: per-query recall@5 is deterministic on a fixture
    (seeded sample + driver-side k-means, tie-broken ordering);
    measured min across sf0.001/0.01/0.1 is 3/2/2 hits (r10, with the
    k-means-refined centroids and nprobe=20 — the raw sample at
    nprobe=16 left sf0.1 at exactly the >=1 bound, VERDICT r9 item 3)
    on uniform-random embeddings — IVF's worst case — so >= 1 hit
    holds everywhere with >=2x margin, driver SFs and bench SF alike.
    Real clustered embeddings concentrate neighbors in probed cells,
    strengthening the contract at 100TB.

    ONE corpus pass for both sides: the exact audit needs the full
    row x query score matrix, and the IVF candidate scores are a subset
    of it, so each Arrow batch does a single matmul and emits local
    top-k per (path, query) — the per-task output is 2·K·|queries|
    scalar rows. At 100TB the exact column is the AUDIT (same role as
    cms_heavyhitters' exact wordcount): drop it there and keep the IVF
    path, whose per-batch cost is the same matmul restricted to probed
    cells."""
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    # SAME setup as ann_ivf_neighbors (shared _ivf_query_setup) — the
    # contract must probe exactly the cells the neighbor surface probes
    bc = spark.sparkContext.broadcast(_ivf_query_setup(emb, queries))
    k = K

    def score_both(batches):
        Cn_, probed_, q_ids_, Qn_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
            cells = np.argmax(Vn @ Cn_.T, axis=1)
            S = Vn @ Qn_.T
            ids = pdf["vec_id"].to_numpy()
            paths, out_q, out_c, out_s = _local_topk_both(
                S, ids, q_ids_, k, "ivf",
                lambda j, cand: cand[np.isin(cells[cand], probed_[j])],
            )
            yield pd.DataFrame(
                {"path": paths, "q_id": out_q, "vec_id": out_c, "sim": out_s}
            ).astype({"q_id": "int64", "vec_id": "int64", "sim": "float64"})

    base = fan_out_vectors(emb)
    scored = base.mapInPandas(
        score_both, "path string, q_id long, vec_id long, sim double"
    )
    return _recall_contract(scored, "ivf", k)


def all_pairs_cosine(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_rows: int = 2048,
    n_rows: "int | None" = None,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold via distributed block-pair
    matmul — NO driver-side collect of the corpus (the round-1 version
    broadcast the whole embedding matrix from the driver: O(N) driver
    memory, dead at 100TB before the job starts).

    Plan: hash rows into nb = ceil(N/block_rows) blocks; each row is
    replicated to the nb unordered block-pair groups it belongs to; each
    group task holds exactly two blocks (bounded memory: 2·block_rows·dim
    doubles) and scores them with one BLAS matmul, emitting only
    above-threshold (va < vb) pairs.

    Honest scale note: exact all-pairs is inherently O(N²) compute and
    O(N·nb) shuffle — that is the operator's contract, distributed with
    bounded task memory. The sublinear 100TB path is LSH candidate
    generation + exact re-rank on candidates only (dedup_embedding_lsh /
    q_ann_lsh below); this exact form is the oracle-verifiable truth and
    the right tool up to ~10⁶ vectors."""
    import pandas as pd

    # Block-grid sizing needs |df| — a CARDINALITY, not data. Callers
    # passing a whole fixture table supply it from parquet footer
    # metadata (catalog.table_row_count: no Spark job — r10, the
    # chunked_cross_join pattern); filtered inputs fall back to the
    # scalar count() job. An n_rows above the true count only makes
    # blocks smaller (correct, slightly more pairs), never wrong.
    n = n_rows if n_rows is not None else df.count()
    nb = max(1, -(-n // block_rows))
    v = df.select(
        F.col(id_col).alias("_id"),
        as_double(vec_col).alias("_v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(nb)).cast("int").alias("_b"),
    )
    keys = F.array(
        *[
            F.struct(
                F.least(F.col("_b"), F.lit(x)).alias("p1"),
                F.greatest(F.col("_b"), F.lit(x)).alias("p2"),
            )
            for x in range(nb)
        ]
    )
    exploded = v.select("_id", "_v", "_b", F.explode(keys).alias("_pk")).select(
        "_id",
        "_v",
        "_b",
        F.col("_pk.p1").alias("_p1"),
        F.col("_pk.p2").alias("_p2"),
    )

    def _norm_rows(pdf):
        M = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["_v"]])
        return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)

    def score_pair(key, pdf):
        i, j = int(key[0]), int(key[1])
        empty = pd.DataFrame({"va": [], "vb": [], "sim": []}).astype(
            {"va": "int64", "vb": "int64", "sim": "float64"}
        )
        a_pdf = pdf[pdf["_b"] == i]
        if not len(a_pdf):
            return empty  # hash block got no rows (small n vs block count)
        ids_a = a_pdf["_id"].to_numpy()
        An = _norm_rows(a_pdf)
        if i == j:
            S = An @ An.T
            mask = (S >= threshold) & (ids_a[:, None] < ids_a[None, :])
            r, c = np.nonzero(mask)
            va, vb, sim = ids_a[r], ids_a[c], S[r, c]
        else:
            b_pdf = pdf[pdf["_b"] == j]
            if not len(b_pdf):
                return empty
            ids_b = b_pdf["_id"].to_numpy()
            Bn = _norm_rows(b_pdf)
            S = An @ Bn.T
            r, c = np.nonzero(S >= threshold)
            va = np.minimum(ids_a[r], ids_b[c])
            vb = np.maximum(ids_a[r], ids_b[c])
            sim = S[r, c]
        return pd.DataFrame({"va": va, "vb": vb, "sim": sim}).astype(
            {"va": "int64", "vb": "int64", "sim": "float64"}
        )

    return exploded.groupBy("_p1", "_p2").applyInPandas(
        score_pair, "va long, vb long, sim double"
    )


def cross_pairs_cosine(
    a: DataFrame,
    b: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_rows: int = 2048,
    n_a: "int | None" = None,
    n_b: "int | None" = None,
) -> DataFrame:
    """Exact A×B cosine ≥ threshold (two-sided block-pair matmul) — the
    incremental twin of all_pairs_cosine: scores ONLY new-batch × corpus
    pairs, never corpus × corpus.

    Grid: A hashes into nb_a blocks, B into nb_b; each (i, j) grid group
    holds one A block + one B block (bounded task memory) and scores them
    with one BLAS matmul. Replication is ASYMMETRIC: each A row ships to
    nb_b groups and each B row to nb_a groups — so the big side's shuffle
    volume scales with the SMALL side's block count. A daily batch of
    10⁵ vectors against a 10⁸ corpus replicates the corpus ~⌈10⁵/2048⌉ ≈
    49×... still heavy; at that scale probe the persisted IVF index for
    candidates first and exact-verify — this operator is the
    oracle-verifiable truth and the right tool while nb_a stays small.

    Output: (ida, idb, sim) with ida from A, idb from B.

    n_a / n_b: caller-supplied cardinalities for the grid sizing (same
    contract as all_pairs_cosine's n_rows — an over-estimate only makes
    blocks smaller); when the caller can derive both from one aggregate
    or footer stats it skips the two scalar count() driver jobs (r16)."""
    import pandas as pd

    na = n_a if n_a is not None else a.count()
    nb_rows = n_b if n_b is not None else b.count()
    nb_a = max(1, -(-na // block_rows))
    nb_b = max(1, -(-nb_rows // block_rows))

    def tagged(df: DataFrame, n_own: int, side: int) -> DataFrame:
        return df.select(
            F.col(id_col).alias("_id"),
            as_double(vec_col).alias("_v"),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_own)).cast("int").alias("_blk"),
            F.lit(side).alias("_side"),
        )

    a_rows = tagged(a, nb_a, 0).select(
        "_id", "_v", "_side",
        F.col("_blk").alias("_p1"),
        F.explode(F.array(*[F.lit(x) for x in range(nb_b)])).alias("_p2"),
    )
    b_rows = tagged(b, nb_b, 1).select(
        "_id", "_v", "_side",
        F.explode(F.array(*[F.lit(y) for y in range(nb_a)])).alias("_p1"),
        F.col("_blk").alias("_p2"),
    )

    def score(key, pdf):
        empty = pd.DataFrame({"ida": [], "idb": [], "sim": []}).astype(
            {"ida": "int64", "idb": "int64", "sim": "float64"}
        )
        a_pdf = pdf[pdf["_side"] == 0]
        b_pdf = pdf[pdf["_side"] == 1]
        if not len(a_pdf) or not len(b_pdf):
            return empty
        ids_a = a_pdf["_id"].to_numpy()
        ids_b = b_pdf["_id"].to_numpy()

        def norm_rows(p):
            M = np.stack([np.asarray(x, dtype=np.float64) for x in p["_v"]])
            return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)

        S = norm_rows(a_pdf) @ norm_rows(b_pdf).T
        r, c = np.nonzero(S >= threshold)
        return pd.DataFrame(
            {"ida": ids_a[r], "idb": ids_b[c], "sim": S[r, c]}
        ).astype({"ida": "int64", "idb": "int64", "sim": "float64"})

    return a_rows.unionByName(b_rows).groupBy("_p1", "_p2").applyInPandas(
        score, "ida long, idb long, sim double"
    )


def q_embedding_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental embedding dedup — the semantic mirror of
    dedup_incremental: cosine ≥ 0.45 near-dup report for the ~10% NEW
    batch of vectors (md5(vec_id) >= 'e6', the standard split) against
    the ~90% corpus, plus within-batch pairs; corpus × corpus is never
    scored (those pairs were resolved when earlier snapshots merged).

    Plan: batch × corpus via cross_pairs_cosine (asymmetric block grid —
    the corpus's replication factor is the BATCH's block count) unioned
    with all_pairs_cosine over the batch alone. Output orientation:
    cross pairs as (da=corpus, db=batch); within-batch da < db. Exact
    oracle restricted to pairs touching the batch."""
    from tez_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    h = F.md5(F.encode(F.col("vec_id").cast("string"), "UTF-8"))
    corpus = emb.filter(F.substring(h, 1, 2) < "e6")
    batch = emb.filter(F.substring(h, 1, 2) >= "e6")
    # ONE aggregate job supplies all three grid cardinalities (r16): the
    # two cross_pairs counts and the within count previously ran three
    # serialized scalar count() driver jobs per build.
    split_counts = {
        r["_split"]: r["n"]
        for r in emb.groupBy(
            (F.substring(h, 1, 2) >= "e6").alias("_split")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_batch = int(split_counts.get(True, 0))
    n_corpus = int(split_counts.get(False, 0))
    cross = cross_pairs_cosine(
        batch, corpus, threshold=0.45, n_a=n_batch, n_b=n_corpus
    ).select(F.col("idb").alias("da"), F.col("ida").alias("db"), "sim")
    within = all_pairs_cosine(batch, threshold=0.45, n_rows=n_batch).select(
        F.col("va").alias("da"), F.col("vb").alias("db"), "sim"
    )
    return bounded_sort(cross.unionByName(within), "da", "db")


def dedup_embedding_lsh(
    df: DataFrame,
    threshold: float,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs via LSH candidates + exact re-rank — the
    sublinear 100TB path (probabilistic recall; the exact truth is
    all_pairs_cosine above).

    Candidate generation and exact scoring are fused per bucket: the
    signature pass carries each vector to its LSH_TABLES (table, sig)
    buckets (one groupBy shuffle of tables×corpus rows), and each bucket
    group scores its members with one BLAS matmul, emitting only
    above-threshold (va < vb) pairs. A pair found by several tables is
    deduped by the final (va, vb) agg — of already-thresholded survivors,
    not raw candidates.

    The self-join formulation this replaces materialized every
    within-bucket candidate pair (~1M rows for 2k vectors at sf0.1) and
    then shipped BOTH 64-dim vectors per pair through two joins before
    rescoring — O(candidates·dim) shuffle vs this plan's
    O(tables·corpus·dim). Bucket population is ~uniform (sign-pattern
    keys); per-bucket memory is bounded by the bucket size, and at
    extreme corpus sizes the planes-per-table knob shrinks buckets
    geometrically. No driver collect, no broadcast of the corpus."""
    import pandas as pd

    planes = _planes(dim)
    P = planes.reshape(LSH_TABLES * LSH_PLANES, dim)
    weights = (2 ** np.arange(LSH_PLANES)).astype(np.int64)
    bcast = df.sparkSession.sparkContext.broadcast(P)

    def sign_with_vec(batches):
        P_ = bcast.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
            bits = (V @ P_.T) > 0
            bits = bits.reshape(len(V), LSH_TABLES, LSH_PLANES)
            sigs = (bits * weights).sum(axis=2)
            yield pd.DataFrame(
                {
                    "_id": np.repeat(pdf["_id"].to_numpy(), LSH_TABLES),
                    "table": np.tile(np.arange(LSH_TABLES), len(V)),
                    "sig": sigs.reshape(-1),
                    "_v": [v for v in pdf["_v"] for _ in range(LSH_TABLES)],
                }
            ).astype({"_id": "int64", "table": "int32", "sig": "int64"})

    from tez_spark.operators.core import fan_out

    base = fan_out(df.select(F.col(id_col).alias("_id"), as_double(vec_col).alias("_v")))
    sig = base.mapInPandas(
        sign_with_vec, "_id long, table int, sig long, _v array<double>"
    )

    def score_bucket(pdf):
        ids = pdf["_id"].to_numpy()
        M = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
        S = Mn @ Mn.T
        mask = (S >= threshold) & (ids[:, None] < ids[None, :])
        r, c = np.nonzero(mask)
        return pd.DataFrame(
            {"va": ids[r], "vb": ids[c], "sim": S[r, c]}
        ).astype({"va": "int64", "vb": "int64", "sim": "float64"})

    pairs = sig.groupBy("table", "sig").applyInPandas(
        score_bucket, "va long, vb long, sim double"
    )
    # max = dedupe: every table that finds a pair computes the identical
    # cosine, so max(sim) just collapses multi-table hits to one row.
    return pairs.groupBy("va", "vb").agg(F.max("sim").alias("sim"))


def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-LSH near-dup with an IN-QUERY recall contract (VERDICT
    r8 item 5, second promotion): ONE row (n_exact, lsh_subset_ok,
    recall_ok) where n_exact is the exact all-pairs count at cosine >=
    0.45 (the DuckDB-verifiable truth, shared with dedup_embedding),
    lsh_subset_ok asserts every LSH-found pair is in the exact set
    (precision 1: the bucket stage re-scores with the same cosine —
    but the exact side's block-pair matmul and the bucket matmul are
    different BLAS reductions, so a pair within ~1 ulp of 0.45 could
    be admitted by one kernel and rejected by the other; ADVICE r9).
    An LSH-only pair therefore only counts as a subset violation when
    its similarity clears the threshold by more than _THRESH_EPS —
    threshold-straddling disagreements are kernel noise, not missed
    precision. recall_ok asserts the LSH path found at least half the
    exact pairs. Pair rows stay available via dedup_embedding_lsh (the
    operator) — they can't be the oracled surface because DuckDB
    cannot reproduce the seeded hyperplanes.

    Bound choice: measured recall across sf0.001/0.01/0.1 is
    0.71/1.00/0.95 (r10, at LSH_TABLES=12) on uniform-random
    embeddings (LSH's worst case — near-dups at barely-above-threshold
    cosine), so >= 0.5 holds everywhere with >= 1.4x margin, and
    tests/test_similarity.py evaluates the real booleans at sf0.001,
    sf0.01 AND sf0.1 (the cms_heavyhitters guard pattern).

    Scale: the exact side is the AUDIT — at 100TB drop it and keep the
    LSH path (O(tables·corpus·dim) shuffle); at fixture/bench SFs the
    exact side is the same distributed block-pair matmul
    dedup_embedding already runs in ~0 s."""
    from tez_spark.sources.catalog import table_row_count

    emb = load_table(spark, sf_dir, "embeddings")
    exact = all_pairs_cosine(
        emb, threshold=0.45, n_rows=table_row_count(sf_dir, "embeddings")
    ).select("va", "vb")
    lsh = dedup_embedding_lsh(emb, threshold=0.45, dim=64).select(
        "va", "vb", "sim"
    )
    both = exact.withColumn("ex", F.lit(1)).join(
        lsh.withColumn("lh", F.lit(1)), ["va", "vb"], "full_outer"
    )
    # coalesce every aggregate: with an empty exact set the full_outer
    # join has ZERO rows, SUM returns NULL and NULL>=NULL*0.5 is NULL —
    # diverging from the oracle's literal 0/TRUE (r9 review finding)
    n_exact = F.coalesce(F.sum("ex"), F.lit(0))
    n_both = F.coalesce(
        F.sum(
            F.coalesce(F.col("ex"), F.lit(0)) * F.coalesce(F.col("lh"), F.lit(0))
        ),
        F.lit(0),
    )
    # LSH-only rows within _THRESH_EPS of the threshold are kernel noise
    # (block-pair vs bucket matmul, different reduction orders), not
    # subset violations — see docstring (ADVICE r9)
    violation = F.col("ex").isNull() & (
        F.col("sim") - F.lit(0.45) > F.lit(_THRESH_EPS)
    )
    return both.agg(
        n_exact.cast("long").alias("n_exact"),
        (F.count(F.when(violation, 1)) == 0).alias("lsh_subset_ok"),
        (n_both >= n_exact * 0.5).alias("recall_ok"),
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
    # ann_ivf / ann_lsh: full oracles via the in-query recall contract.
    # k_returned is deterministically K (probed cells / matched buckets
    # hold far more than K vectors at every fixture SF); recall_ok is
    # the verified >= 1-of-exact-top-K bound (see q_ann_ivf / q_ann_lsh;
    # real booleans evaluated at sf0.001/0.01/0.1 in
    # tests/test_similarity.py::test_recall_contracts_hold_at_driver_sfs).
    "ann_ivf": f"""
        SELECT vec_id AS q_id,
               CAST({K} AS BIGINT) AS k_returned,
               TRUE AS recall_ok
        FROM embeddings WHERE vec_id < {N_QUERIES}
        ORDER BY q_id
    """,
    "ann_lsh": f"""
        SELECT vec_id AS q_id,
               CAST({K} AS BIGINT) AS k_returned,
               TRUE AS recall_ok
        FROM embeddings WHERE vec_id < {N_QUERIES}
        ORDER BY q_id
    """,
    # ann_incremental: promoted from rows-only via the same contract
    # (VERDICT r10 item 8). One row per NEW-batch vector (the md5 split
    # embedding_incremental's oracle already reproduces); k_returned is
    # deterministically 5 (probed cells hold far more than 5 corpus
    # vectors at every fixture SF) and recall_ok is the verified
    # >= 1-of-exact-top-5 bound (measured min overlap 2/2/2 across SFs
    # at nprobe=ANN_INCR_NPROBE; real booleans evaluated in
    # test_recall_contracts_hold_at_driver_sfs).
    "ann_incremental": """
        SELECT vec_id AS q_id,
               CAST(5 AS BIGINT) AS k_returned,
               TRUE AS recall_ok
        FROM embeddings
        WHERE substring(md5(CAST(vec_id AS VARCHAR)), 1, 2) >= 'e6'
        ORDER BY q_id
    """,
    # dedup_embedding_lsh: n_exact is the DuckDB-computable all-pairs
    # truth at cosine >= 0.45 (same CTE family as dedup_embedding);
    # the booleans are the verified precision/recall bounds (see
    # q_dedup_embedding_lsh for margins + the driver-SF guard test).
    "dedup_embedding_lsh": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
               TRUE AS lsh_subset_ok,
               TRUE AS recall_ok
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
              (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
               sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.45
    """,
    "embedding_incremental": """
        WITH parts AS (
            SELECT vec_id,
                   substring(md5(CAST(vec_id AS VARCHAR)), 1, 2) < 'e6' AS is_corpus
            FROM embeddings
        ), pairs AS (
            SELECT a.vec_id AS ia, b.vec_id AS ib,
                   list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                   (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                    sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS sim
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                  (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                   sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.45
        )
        SELECT CASE WHEN pb.is_corpus THEN p.ib ELSE p.ia END AS da,
               CASE WHEN pb.is_corpus THEN p.ia ELSE p.ib END AS db,
               sim
        FROM pairs p
        JOIN parts pa ON p.ia = pa.vec_id
        JOIN parts pb ON p.ib = pb.vec_id
        WHERE NOT (pa.is_corpus AND pb.is_corpus)
        ORDER BY da, db
    """,
}

# ---------------------------------------------------------------------------
# Persisted IVF index: build once, probe many times
# ---------------------------------------------------------------------------

def write_ivf_index(
    emb: DataFrame,
    path: str,
    n_cells: int = IVF_CELLS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index as a DATA LAYOUT: centroids (tiny
    parquet) + the assignment table written partitionBy(cell). Probing a
    query then reads only its probed cells via directory/partition
    pruning — the index "lookup" is the same footer/partition machinery
    every scan uses, so it works unchanged on a 1000-executor cluster
    (cells are directories; no index server, no driver state).

    Build cost: one corpus scan (map-side assign matmul) + one
    partitioned write; rebuildable deterministically (TakeOrdered
    centroid sample)."""
    spark = emb.sparkSession
    assigned, Cn = ivf_assign(emb, n_cells=n_cells, id_col=id_col, vec_col=vec_col)
    spark.createDataFrame(
        [(int(i), [float(x) for x in Cn[i]]) for i in range(Cn.shape[0])],
        "cell int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(path + "/centroids")
    (
        assigned.select("cell", F.col("_id").alias(id_col), F.col("_v").alias("v"))
        .repartition("cell")  # few files per cell directory at any scale
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path + "/vectors")
    )


def _probe_chunk_scored(
    spark: SparkSession,
    vectors: DataFrame,
    q_ids: "np.ndarray",
    Qn: "np.ndarray",
    k: int,
    nprobe: int,
    id_col: str,
    Cn: "np.ndarray",
) -> DataFrame:
    """Scored candidate rows for one bounded, already-normalized query
    block: rank cells on the driver, scan only the probed cell
    partitions of `vectors` (a cell-partitioned (cell, id, v) table —
    the isin filter prunes partition directories at planning time),
    exact cosine per candidate, trimmed MAP-SIDE to per-(Arrow batch,
    query) top-k before anything is shuffled (r16): a global top-k row
    is by definition in its own batch's top-k, so the trim is lossless
    while bounding the exchange at k x |queries| x n_batches rows
    instead of every scored candidate — the partial-agg discipline the
    exact path's _local_topk_scored already applies."""
    import pandas as pd

    cell_to_qrows: dict[int, list[int]] = {}
    for j in range(len(q_ids)):
        for c in np.argsort(-(Qn[j] @ Cn.T))[:nprobe]:
            cell_to_qrows.setdefault(int(c), []).append(j)
    probed = sorted(cell_to_qrows)

    vec = vectors.filter(F.col("cell").isin(probed))
    bc = spark.sparkContext.broadcast((cell_to_qrows, q_ids, Qn))

    def score(batches):
        c2q, q_ids_, Qn_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
            ids = pdf[id_col].to_numpy()
            cells = pdf["cell"].to_numpy()
            rows_c, rows_q = [], []
            for r in range(len(V)):
                for j in c2q.get(int(cells[r]), ()):
                    if q_ids_[j] != ids[r]:
                        rows_c.append(r)
                        rows_q.append(j)
            if not rows_c:
                continue
            rq = np.asarray(rows_q)
            rc = np.asarray(rows_c)
            sims = np.einsum("ij,ij->i", Vn[rc], Qn_[rq])
            # per-batch per-query top-k: order by (q, -sim, id), keep
            # the first k rows of each query's run
            order = np.lexsort((ids[rc], -sims, rq))
            rq, rc, sims = rq[order], rc[order], sims[order]
            pos = np.arange(len(rq))
            first = np.r_[0, 1 + np.nonzero(np.diff(rq))[0]]
            rank = pos - np.repeat(first, np.diff(np.r_[first, len(rq)]))
            keep = rank < k
            yield pd.DataFrame(
                {
                    "q_id": q_ids_[rq[keep]],
                    "vec_id": ids[rc[keep]],
                    "sim": sims[keep],
                }
            ).astype({"q_id": "int64", "vec_id": "int64", "sim": "float64"})

    return vec.mapInPandas(score, "q_id long, vec_id long, sim double")


def _probe_index_chunk(
    spark: SparkSession,
    vectors: DataFrame,
    q_ids: "np.ndarray",
    Qn: "np.ndarray",
    k: int,
    nprobe: int,
    id_col: str,
    Cn: "np.ndarray",
) -> DataFrame:
    """One probe job over a bounded query block: _probe_chunk_scored's
    candidate rows re-ranked to exact per-query top-k."""
    scored = _probe_chunk_scored(
        spark, vectors, q_ids, Qn, k, nprobe, id_col, Cn
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
    )


def ann_ivf_probe_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = K,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_chunk_rows: int | None = None,
    vectors: DataFrame | None = None,
) -> DataFrame:
    """Probe a persisted IVF index: per query, rank cells against the
    (tiny, collected) centroid table, scan ONLY the probed cell
    partitions (PartitionFilters prune the rest at planning time), exact
    cosine re-rank to top-k. The probe never touches unprobed cells'
    bytes — at 100TB that is the difference between reading nprobe/cells
    of the corpus and all of it.

    Driver memory is bounded by `probe_chunk_rows`: the query set streams
    to the driver via toLocalIterator in chunks of that many vectors, and
    each chunk runs its own probe job (the index is stateless, so probe
    jobs compose — per-query top-k is independent across chunks and the
    results union losslessly). None collects the whole query set at once
    (fine for a bounded daily batch; a 100× batch sets a chunk size and
    pays one extra job per chunk, never more driver memory)."""
    Cn = _load_centroids(spark, path)
    nprobe = min(nprobe, Cn.shape[0])
    # `vectors` override: probe a GROWN store (seed index + streamed
    # appends, maintain_ann) instead of the path's own vectors table
    vec = (
        vectors
        if vectors is not None
        # published index paths are immutable (see _load_centroids);
        # the fingerprint-keyed relation cache skips the ~70-250 ms
        # footer read + analysis on every probe build (r16)
        else read_parquet_cached(spark, path + "/vectors")
    )

    q_sel = queries.select(F.col(id_col).alias("q_id"), as_double(vec_col).alias("v"))

    def block(rows) -> DataFrame:
        q_ids = np.array([r.q_id for r in rows], dtype=np.int64)
        Q = np.array([list(r.v) for r in rows], dtype=np.float64)
        Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)
        return _probe_index_chunk(spark, vec, q_ids, Qn, k, nprobe, id_col, Cn)

    if probe_chunk_rows is None:
        out = block(q_sel.collect())
    else:
        parts: list[DataFrame] = []
        buf: list = []
        for row in q_sel.toLocalIterator():
            buf.append(row)
            if len(buf) >= probe_chunk_rows:
                parts.append(block(buf))
                buf = []
        if buf:
            parts.append(block(buf))
        if not parts:
            return spark.createDataFrame([], "q_id long, vec_id long, sim double, rn long")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
    return bounded_sort(out, "q_id", "rn")


def _incremental_split(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The daily-ingest fixture split: ~90% corpus / ~10% new batch by
    md5(vec_id) prefix — the same split embedding_incremental's oracle
    reproduces in DuckDB."""
    emb = load_table(spark, sf_dir, "embeddings")
    h = F.md5(F.encode(F.col("vec_id").cast("string"), "UTF-8"))
    corpus = emb.filter(F.substring(h, 1, 2) < "e6")
    batch = emb.filter(F.substring(h, 1, 2) >= "e6")
    return corpus, batch


def ann_incremental_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest ANN neighbor rows: the new ~10% batch of vectors
    (md5(vec_id) >= 'e6') top-5-probed against a PERSISTED IVF index
    built over the ~90% corpus — the sublinear scale twin of
    embedding_incremental (which scores the batch × corpus product
    exactly). The index is built once per fixture fingerprint (an
    on-disk memo under the system temp dir: the cell-partitioned layout
    IS the index, rebuilt only when the fixture regenerates) and probes
    read only the probed cell partitions via partition pruning.

    Neighbor rows are engine-specific (cell layout / probe order), so
    the ORACLED surface is q_ann_incremental's recall contract; recall
    vs the exact batch×corpus truth is also asserted directly in
    tests/test_similarity.py. The probe streams to the driver in
    bounded chunks (probe_chunk_rows — the index is stateless, probe
    jobs compose), so a 100× batch costs extra probe jobs, not driver
    memory. Probes at ANN_INCR_NPROBE — the SAME depth as the oracled
    contract surface (q_ann_incremental): the contract only speaks for
    this surface if both probe identically (the ann_lsh shared-kernel
    rule)."""
    corpus, batch = _incremental_split(spark, sf_dir)
    idx = ensure_ivf_index(corpus, sf_dir)
    return ann_ivf_probe_index(
        spark, idx, batch, k=5, nprobe=ANN_INCR_NPROBE,
        probe_chunk_rows=10_000,
    )


def q_ann_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ann_incremental's ORACLED surface (VERDICT r10 item 8 — the
    q_ann_ivf/q_ann_lsh recall-contract promotion applied to the
    incremental probe): per new-batch vector, (q_id, k_returned,
    recall_ok) where recall_ok asserts the persisted-index probe found
    at least one of the EXACT batch×corpus cosine top-5, so the driver
    hash-verifies the recall bound end-to-end instead of the weaker
    rows-only contact. Neighbor rows stay available via
    ann_incremental_neighbors.

    Bound choice: deterministic on a fixture (TakeOrdered centroid
    sample, tie-broken ranking). The contract probe runs at
    nprobe=ANN_INCR_NPROBE (40): the batch is 212 queries at sf0.1 —
    a min-over-draws ~20x harsher than ann_ivf's 10-query set — and on
    the uniform-random fixtures (IVF's worst case: neighbors at cosine
    ~0.3-0.5 spread across many cells) nprobe=20 measured a ZERO-overlap
    query at sf0.01. Measured min exact-top-5 overlap at nprobe=40 is
    2/2/2 across sf0.001/0.01/0.1 (2x margin over the >= 1 bound, the
    ann_ivf precedent), and tests/test_similarity.py::
    test_recall_contracts_hold_at_driver_sfs evaluates the real
    booleans at all three SFs. Real clustered corpora prune deeper at
    far smaller nprobe — tune it down there. The exact side here is
    the AUDIT path (corpus passes against driver-bounded query chunks,
    so neither side ever collects unbounded rows); at 100TB drop the
    audit and serve ann_incremental_neighbors — the probe itself reads
    only probed cell partitions.

    Single-action shape (r16, VERDICT r15 item 3): both sides are built
    from ONE driver pass over the batch (_probe_exact_scored) into one
    lazy union, and the per-path ranking happens once inside
    _recall_contract — replacing the former two toLocalIterator sweeps
    + per-chunk exact collects + separate probe rank. Measured at
    sf0.1: 17 serialized driver jobs -> 7, value-identical contract
    rows (PERF.md r16)."""
    corpus, batch = _incremental_split(spark, sf_dir)
    idx = ensure_ivf_index(corpus, sf_dir)
    both = _probe_exact_scored(
        spark, idx, corpus, batch, k=5, nprobe=ANN_INCR_NPROBE,
        chunk_rows=10_000,
    )
    return _recall_contract(both, "ivf", k=5)


def _probe_exact_scored(
    spark: SparkSession,
    path: str,
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    nprobe: int,
    chunk_rows: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One driver pass over the query set building BOTH recall-contract
    sides as a single lazy plan: per driver-bounded chunk, the IVF
    probe's scored candidates (path='ivf', probed-cell partition scan)
    and the exact audit's per-partition top-k candidates
    (path='exact', one corpus pass) — each k-trimmed map-side, globally
    ranked once by _recall_contract's window. No intermediate action:
    the chunks compose losslessly because queries partition across
    them. Driver memory stays chunk-bounded in Python (one chunk of
    vectors buffered at a time); per-chunk broadcasts accumulate until
    the final action exactly as in ann_ivf_probe_index's chunked mode."""
    Cn = _load_centroids(spark, path)
    nprobe = min(nprobe, Cn.shape[0])
    vec = read_parquet_cached(spark, path + "/vectors")  # immutable index path (r16)
    q_sel = queries.select(
        F.col(id_col).alias("q_id"), as_double(vec_col).alias("v")
    )

    def block(rows) -> DataFrame:
        q_ids = np.array([r.q_id for r in rows], dtype=np.int64)
        Q = np.array([list(r.v) for r in rows], dtype=np.float64)
        Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)
        ivf = _probe_chunk_scored(
            spark, vec, q_ids, Qn, k, nprobe, id_col, Cn
        ).select(F.lit("ivf").alias("path"), "q_id", "vec_id", "sim")
        exact = _local_topk_scored(
            corpus, q_ids, Qn, k, id_col, vec_col
        ).select(
            F.lit("exact").alias("path"),
            "q_id",
            F.col(id_col).alias("vec_id"),
            "sim",
        )
        return ivf.unionByName(exact)

    parts: list[DataFrame] = []
    buf: list = []
    for row in q_sel.toLocalIterator():
        buf.append(row)
        if len(buf) >= chunk_rows:
            parts.append(block(buf))
            buf = []
    if buf:
        parts.append(block(buf))
    if not parts:
        return spark.createDataFrame(
            [], "path string, q_id long, vec_id long, sim double"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_CENTROID_MEMO: dict[tuple, "np.ndarray"] = {}


def _load_centroids(spark: SparkSession, path: str) -> "np.ndarray":
    """Session-process memo of an index's dense centroid matrix, keyed
    by absolute index path PLUS the centroid files' fingerprint
    (ADVICE r16: ensure_ivf_index's published paths are immutable, but
    maintain_ann reads the FIXED path store_dir/index — an in-process
    rebuild at that path would otherwise silently serve stale centroids
    while the fingerprint-keyed vectors read refreshed, splitting probe
    and append across two index generations). The fingerprint stat walk
    is ~µs against the collect job it saves; a changed fingerprint
    evicts the superseded entry. The memo is a few hundred KB per
    index; nothing reads centroids before the _COMPLETE gate, so a
    partial build can never populate it."""
    import os as _os

    from tez_spark.sources.catalog import path_fingerprint

    abspath = _os.path.abspath(path)
    key = (abspath, path_fingerprint(_os.path.join(abspath, "centroids")))
    Cn = _CENTROID_MEMO.get(key)
    if Cn is None:
        cent = spark.read.parquet(path + "/centroids").collect()
        Cn = np.zeros((len(cent), len(cent[0].centroid)))
        for r in cent:
            Cn[r.cell] = r.centroid
        for old in [k for k in _CENTROID_MEMO if k[0] == abspath]:
            del _CENTROID_MEMO[old]
        _CENTROID_MEMO[key] = Cn
    return Cn


def publish_build_dir(scratch: str, idx: str, max_attempts: int = 5) -> None:
    """Atomically publish a completed, _COMPLETE-stamped build dir to
    its shared path. Terminal outcomes: OUR build renamed in, or a
    COMPLETE build from a concurrent builder adopted (scratch
    discarded — both builds are deterministic over the same inputs).
    r6 advice: a single retry had a TOCTOU window between rmtree and
    the second rename, hence the loop; r7 advice: the unbounded loop
    could spin forever on a PERSISTENT non-target-exists failure
    (permissions, cross-device scratch), hence errno discrimination +
    the attempt bound — rename(2) reports an occupied target as
    ENOTEMPTY/EEXIST (or EISDIR); anything else re-raises immediately."""
    import errno
    import os
    import shutil

    last: OSError | None = None
    for _ in range(max_attempts):
        try:
            os.rename(scratch, idx)
            return
        except OSError as e:
            if e.errno not in (errno.EEXIST, errno.ENOTEMPTY, errno.EISDIR):
                raise
            last = e
            # target occupied: a concurrent builder won (use theirs if
            # complete) or a pre-fix partial build squats the path
            # (clear it and retry)
            if os.path.exists(os.path.join(idx, "_COMPLETE")):
                shutil.rmtree(scratch, ignore_errors=True)
                return
            shutil.rmtree(idx, ignore_errors=True)
    raise OSError(
        f"could not publish {scratch} -> {idx} after {max_attempts} "
        f"attempts (target kept reappearing without _COMPLETE)"
    ) from last


def ensure_ivf_index(corpus: DataFrame, sf_dir: str) -> str:
    """On-disk memo of the corpus IVF index, built ATOMICALLY: the index
    is written into a unique scratch dir, stamped with a _COMPLETE
    marker, and os.rename'd into the fingerprint-keyed location — so a
    crash (or a concurrent builder) can never leave a complete-LOOKING
    index with partial vectors at the shared path (r5 advice: the old
    exists-check gated on centroids/, which write_ivf_index writes FIRST).
    Readers gate on the marker; losers of the rename race discard their
    build and use the winner's (both builds are deterministic over the
    same fingerprint). Returns the index path."""
    import hashlib
    import os
    import tempfile
    import uuid

    from tez_spark.sources.catalog import path_fingerprint

    fp = path_fingerprint(os.path.join(sf_dir, "embeddings.parquet"))
    tag = hashlib.md5(
        repr((os.path.abspath(sf_dir), fp)).encode()
    ).hexdigest()[:16]
    idx = os.path.join(tempfile.gettempdir(), f"tez_spark_ivf_idx_{tag}")
    if os.path.exists(os.path.join(idx, "_COMPLETE")):
        return idx
    scratch = f"{idx}.build-{uuid.uuid4().hex[:12]}"
    write_ivf_index(corpus, scratch)
    with open(os.path.join(scratch, "_COMPLETE"), "w") as f:
        f.write("ok\n")
    publish_build_dir(scratch, idx)
    return idx


QUERIES = {
    "ann_topk": q_ann_topk,
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
    "ann_incremental": q_ann_incremental,
    "dedup_embedding_lsh": q_dedup_embedding_lsh,
    "embedding_incremental": q_embedding_incremental,
}
