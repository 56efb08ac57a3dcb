"""BPE trainer: engine merges equal an INDEPENDENT pure-Python
reference computed from the raw fixture text; training is
partitioning-invariant; segmentation is consistent with the merge
table; the driver-side histogram bound fails loud."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def _reference_merges(texts: list[str], n_merges: int):
    """Independent BPE implementation (no shared code with the engine's
    learn_merges beyond the published algorithm)."""
    from collections import Counter

    hist = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                hist[w] += 1
    words = {w: (tuple(w) + ("</w>",)) for w in hist}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in words.items():
            f = hist[w]
            for pair in zip(syms, syms[1:]):
                pairs[pair] += f
        if not pairs:
            break
        pair, best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best < 2:
            break
        merges.append((pair[0], pair[1], best))
        a, b = pair
        new_words = {}
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[w] = tuple(out)
        words = new_words
    return merges


def test_bpe_train_matches_reference(spark):
    from tez_spark.operators.bpe import bpe_train
    from tez_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    texts = [r.text for r in docs.select("text").collect()]
    got = bpe_train(docs, n_merges=25)
    assert got == _reference_merges(texts, 25)
    assert len(got) > 0


def test_bpe_train_partitioning_invariant(spark):
    from tez_spark.operators.bpe import bpe_train
    from tez_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    m1 = bpe_train(docs.repartition(1), n_merges=10)
    m7 = bpe_train(docs.repartition(7), n_merges=10)
    assert m1 == m7


def test_bpe_segment_consistent_with_merges(spark):
    from tez_spark.operators.bpe import bpe_segment, bpe_train, segment_word
    from tez_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    merges = bpe_train(docs, n_merges=25)
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    seg = {r.doc_id: (r.n_words, r.n_subwords) for r in bpe_segment(docs, merges).collect()}
    raw = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    assert set(seg) == set(raw)
    for doc_id, text in raw.items():
        ws = [w for w in text.split(" ") if w]
        expect_sub = sum(len(segment_word(w, ranks)) for w in ws)
        assert seg[doc_id] == (len(ws), expect_sub)
        # merges only ever reduce symbol count below the unmerged bound
        assert expect_sub <= sum(len(w) + 1 for w in ws)


def test_bpe_vocab_bound_fails_loud(spark):
    from tez_spark.operators.bpe import bpe_train
    from tez_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError, match="histogram bound"):
        bpe_train(docs, max_vocab_words=2)


def test_bpe_segment_oracle_on_adversarial_corpus(spark, tmp_path):
    """Cross-engine edge sweep for the r12 segmentation oracle: the
    fixture corpus has no degenerate documents, so this constructs them
    — empty text, whitespace-only, single token, a unique-vocabulary
    doc, repeated single-char words, and a literal '</w>' token — and
    runs the ENGINE and the DuckDB oracle side by side on the tmp
    parquet. Pins the LEFT-JOIN (0, 0) accounting for token-less docs
    and the train/infer equivalence outside the fixture distribution."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tez_spark.operators.bpe import _bpe_segment_sql, q_bpe_segment

    texts = [
        "",                        # zero tokens -> (0, 0)
        "   ",                     # whitespace-only -> (0, 0)
        "solo",                    # single unique token
        "aa aa aa bb bb aab",      # merge-rich tiny vocab
        "x y z q r s t u v w",     # all unique, merges can't fire on it
        "</w> </w> literal",       # the end-marker as a LITERAL word
        "aaaa aaaa aa",            # overlap parity inside one word
    ]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "source": pa.array(["t"] * len(texts)),
            "text": pa.array(texts),
        }),
        str(tmp_path / "documents.parquet"),
    )
    got = [tuple(r) for r in q_bpe_segment(spark, str(tmp_path)).collect()]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.execute(_bpe_segment_sql()).fetchall()
    assert got == want, (got, want)
    assert got[0][1:] == (0, 0) and got[1][1:] == (0, 0)
