"""Byte-pair-encoding tokenizer training + application over a corpus.

The missing piece between whitespace token counting (functions/text.py)
and a real training pipeline's subword vocabulary (Sennrich et al.,
"Neural Machine Translation of Rare Words with Subword Units", ACL 2016).

Scale design — the two-phase split every production tokenizer trainer
uses (HuggingFace tokenizers, SentencePiece):

1. **Word histogram: distributed.** One wordcount-shaped explode +
   groupBy over the corpus — the only phase that touches corpus-sized
   data, linear and embarrassingly parallel at 100TB.
2. **Merge learning: driver-side over the histogram.** BPE iterations
   operate on the word-frequency DICT, whose size is the distinct
   vocabulary (≤ ~10M words for web-scale corpora, ~100MB), not the
   corpus. The collect is BOUNDED and guarded: more distinct words than
   max_vocab_words raises a loud error telling the user to pre-filter
   (min_freq) rather than silently truncating — the same
   bounded-driver-state contract as the IVF centroid sample
   (operators/similarity.py).
3. **Application: distributed again.** The learned merge table is tiny
   (n_merges rows); segmentation broadcasts it and maps each partition
   with an Arrow-batched pandas iterator — no shuffle at all.

Determinism: merge ties (equal pair counts) break lexicographically, so
the merge sequence is a pure function of the histogram — stable across
runs, partitionings, and cluster sizes (asserted in tests against an
independent pure-Python reference).

Reference parity note: Tez has no tokenizer surface at all; this is a
capability extension in the SURVEY.md §2.6 training-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tez_spark.functions.text import tokens
from tez_spark.sources.catalog import load_table

END = "</w>"  # end-of-word marker: merges never cross word boundaries


def word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the distributed phase."""
    return (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def learn_merges(
    histogram: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str, int]]:
    """Classic BPE over a word-frequency dict: repeatedly merge the most
    frequent adjacent symbol pair (ties lexicographic). Returns
    [(left, right, pair_freq_at_merge_time)]. Pure Python on the
    histogram — corpus-size independent."""
    words: list[tuple[list[str], int]] = [
        (list(w) + [END], f) for w, f in histogram if w
    ]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in words:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        # max by (freq, then REVERSED lexicographic) == prefer the
        # lexicographically SMALLEST pair on ties
        (left, right), best = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best < 2:
            break  # nothing repeats; further merges are noise
        merges.append((left, right, best))
        merged = left + right
        new_words = []
        for syms, f in words:
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words.append((out, f))
        words = new_words
    return merges


def segment_word(word: str, merge_ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word greedily by merge rank (the
    standard BPE inference: always the lowest-rank applicable merge)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = merge_ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 40,
    max_vocab_words: int = 1_000_000,
) -> list[tuple[str, str, int]]:
    """Distributed histogram → driver-side merge learning. Raises on an
    unexpectedly huge vocabulary instead of silently truncating."""
    # ONE corpus pass: limit(bound+1) keeps the guard without a separate
    # count() job — the collect is capped at bound+1 rows either way.
    rows = word_histogram(docs, text_col).limit(max_vocab_words + 1).collect()
    if len(rows) > max_vocab_words:
        raise ValueError(
            f"bpe_train: distinct words exceed the {max_vocab_words} "
            f"driver-side histogram bound; pre-filter the corpus "
            f"(e.g. min_freq) or raise max_vocab_words"
        )
    histogram = [(r.w, r.freq) for r in rows]
    histogram.sort()  # collect order is partition-dependent; learning is not
    return learn_merges(histogram, n_merges)


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge table corpus-wide: (id, n_words,
    n_subwords) per document. Arrow-batched mapInPandas, merge table
    broadcast by closure — no shuffle; the map phase of a tokenization
    job at any scale."""
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    fields = docs.select(id_col, text_col).schema

    def run(batches):
        import pandas as pd

        # per-worker memo over DISTINCT words: segmentation is a pure
        # function of the word, and corpora are Zipf-distributed, so
        # caching turns the per-occurrence greedy loop into a
        # vocabulary-bounded one (r12: 2.33 s -> measured below at
        # sf0.1; at 100TB this is the standard trainer trick — segment
        # the vocabulary, not the corpus)
        memo: dict = {}

        def seg_len(w: str) -> int:
            n = memo.get(w)
            if n is None:
                n = len(segment_word(w, ranks))
                memo[w] = n
            return n

        for pdf in batches:
            ids, n_words, n_sub = [], [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                ws = [w for w in (text or "").split(" ") if w]
                ids.append(i)
                n_words.append(len(ws))
                n_sub.append(sum(seg_len(w) for w in ws))
            yield pd.DataFrame(
                {id_col: ids, "n_words": n_words, "n_subwords": n_sub}
            )

    out_schema = f"{id_col} {fields[id_col].dataType.simpleString()}, n_words long, n_subwords long"
    return docs.select(id_col, text_col).mapInPandas(run, out_schema)


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query: the learned merge table (rank, left, right,
    pair_freq) over documents. PROMOTED from rows-only in r12 (the
    ann_incremental precedent, VERDICT r11 item 5): the 40
    data-dependent iterations ARE SQL-expressible as an unrolled
    40-stage CTE chain (_bpe_oracle_sql) — DuckDB re-learns the merge
    table independently and the driver hash-compares the two. The
    pure-Python reference-equality test in tests/test_bpe.py stays as a
    third independent implementation."""
    merges = bpe_train(load_table(spark, sf_dir, "documents"))
    return spark.createDataFrame(
        [(i, l, r, f) for i, (l, r, f) in enumerate(merges)],
        "rank long, left string, right string, pair_freq long",
    ).orderBy("rank")


def _bpe_oracle_sql(n_merges: int = 40) -> str:
    """DuckDB oracle that LEARNS the merge table itself: one unrolled
    CTE stage pair per BPE iteration over (word, freq, pos, sym) rows.

    Per stage i: b{i} picks the argmax adjacent pair by
    (freq desc, pair lexicographic) with the same `freq >= 2` stop rule
    as learn_merges (an empty b{i} leaves the symbol state unchanged, so
    the stop is self-perpetuating and ranks stay a dense prefix); s{i}
    applies the merge LEFT-TO-RIGHT NON-OVERLAPPING via run-parity —
    candidate positions grouped into consecutive runs (pos minus the
    running candidate count is constant within a run), keeping alternate
    members from each run's start, then dropping the absorbed right
    neighbors. MATERIALIZED is load-bearing: inlined CTEs re-expand the
    whole prefix chain per reference (the unmaterialized form exhausted
    file handles re-reading the scan). Cost is vocabulary-bounded —
    the symbol table is |vocab| * (max_word_len + 1) rows at every
    corpus scale (~280 rows on the fixtures), so the ~2 s observed at
    sf0.001/0.01/0.1 alike is DuckDB planning the 80-CTE chain, not
    data."""
    parts = _bpe_learning_ctes(n_merges)
    union = " UNION ALL ".join(
        f'SELECT {i-1} AS "rank", l AS "left", r AS "right", cnt AS pair_freq'
        f" FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return (
        "WITH " + ",\n".join(parts)
        + f'\nSELECT * FROM ({union}) ORDER BY "rank"'
    )


def _bpe_learning_ctes(n_merges: int) -> list:
    """The unrolled learning chain as CTE fragments s0, (b1, s1) ..
    (b{n}, s{n}) — the shared prefix of _bpe_oracle_sql (merge table
    from the b{i}) and _bpe_segment_sql (segmentations from s{n})."""
    parts = ["""s0 AS MATERIALIZED (
  SELECT w, freq, pos,
         CASE WHEN pos <= length(w) THEN substr(w, pos, 1) ELSE '</w>' END AS sym
  FROM (
    SELECT w, freq, unnest(generate_series(1, length(w) + 1)) AS pos FROM (
      SELECT w, count(*)::BIGINT AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
      ) WHERE w != '' GROUP BY w
    )
  )
)"""]
    for i in range(1, n_merges + 1):
        parts.append(f"""b{i} AS MATERIALIZED (
  SELECT sym AS l, nxt AS r, sum(freq)::BIGINT AS cnt FROM (
    SELECT freq, sym, lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
    FROM s{i-1}
  ) WHERE nxt IS NOT NULL GROUP BY 1, 2
  HAVING sum(freq) >= 2 ORDER BY cnt DESC, l, r LIMIT 1
),
s{i} AS MATERIALIZED (
  SELECT w, freq, row_number() OVER (PARTITION BY w ORDER BY pos) AS pos,
         CASE WHEN keep THEN sym || nxt ELSE sym END AS sym
  FROM (
    SELECT w, freq, pos, sym, nxt, keep,
           lag(keep) OVER (PARTITION BY w ORDER BY pos) AS prev_keep
    FROM (
      SELECT w, freq, pos, sym, nxt,
             c AND (pos - min(pos) OVER (PARTITION BY w, grp)) % 2 = 0 AS keep
      FROM (
        SELECT w, freq, pos, sym, nxt, c,
               CASE WHEN c THEN pos - sum(CASE WHEN c THEN 1 ELSE 0 END)
                    OVER (PARTITION BY w ORDER BY pos) END AS grp
        FROM (
          SELECT p.w, p.freq, p.pos, p.sym, p.nxt,
                 coalesce(p.sym = b.l AND p.nxt = b.r, FALSE) AS c
          FROM (
            SELECT w, freq, pos, sym,
                   lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
            FROM s{i-1}
          ) p LEFT JOIN b{i} b ON TRUE
        )
      )
    )
  ) WHERE NOT coalesce(prev_keep, FALSE)
)""")
    return parts


def q_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION at corpus scale (r12, completing the
    train→apply pair): learn the 40-merge table, then segment every
    document — (doc_id, n_words, n_subwords) per doc via the
    broadcast-merge-table Arrow mapInPandas (zero shuffle; the map
    phase of any real tokenization job at 100TB).

    Oracle: the SAME unrolled learning chain, whose FINAL symbol state
    s{n} is each vocabulary word's training-time segmentation; greedy
    lowest-rank-first inference (segment_word) reproduces exactly that
    state for in-vocabulary words — the canonical BPE train/infer
    equivalence (Sennrich et al. 2016) — so DuckDB recomputes per-doc
    subword counts by joining each document's words against the learned
    symbol table. Per-doc output keeps the parallel range sort."""
    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs)
    return bpe_segment(docs, merges).orderBy("doc_id")


def _bpe_segment_sql(n_merges: int = 40) -> str:
    """DuckDB oracle for q_bpe_segment: the learning-chain prefix
    (shared generator — any drift between the two oracles is a bug),
    then per-word symbol counts from the final state s{n}, joined back
    to each document's token stream. LEFT JOIN from documents keeps
    zero-token docs as (0, 0) rows, matching the engine's total
    mapInPandas accounting."""
    parts = _bpe_learning_ctes(n_merges)
    return (
        "WITH " + ",\n".join(parts) + f""",
seg AS MATERIALIZED (
  SELECT w, count(*)::BIGINT AS n_sub FROM s{n_merges} GROUP BY w
),
doc_words AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE w != ''
),
per_doc AS (
  SELECT doc_id, count(*)::BIGINT AS n_words, sum(n_sub)::BIGINT AS n_subwords
  FROM doc_words JOIN seg USING (w) GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(p.n_words, 0)::BIGINT AS n_words,
       coalesce(p.n_subwords, 0)::BIGINT AS n_subwords
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id"""
    )


QUERIES = {"bpe_train": q_bpe_train, "bpe_segment": q_bpe_segment}
ORACLE = {
    "bpe_train": _bpe_oracle_sql(),
    "bpe_segment": _bpe_segment_sql(),
}
