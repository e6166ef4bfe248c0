"""Property tests for the round-8 operators: Zipf/Heaps corpus-law fits,
lexical diversity, temperature mixture, epoch plan, systematic sampling,
trigram paths, interval-overlap concurrency, bounded k-core, cosine
histogram, and the PPJoin positional filter. Each checks an invariant the
DuckDB oracle can't express (cross-run determinism, mathematical bounds,
brute-force ground truth on a small slice)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from brooklin_spark import registry

registry.load_all()


def test_zipf_slope_is_negative_and_bounded(spark, sf_correct):
    """A natural-ish corpus has a decreasing rank-frequency curve: slope
    strictly negative, and |slope| in a sane (0, 3) band."""
    row = registry.QUERIES["text_zipf_slope"](spark, sf_correct).collect()[0]
    # synthetic corpus: small vocab (tens of terms), shallow but still
    # decreasing rank-frequency curve
    assert row.n_terms > 10
    assert -3.0 < row.zipf_slope < 0.0, row


def test_heaps_curve_monotone_and_consistent(spark, sf_correct):
    """Cumulative tokens and vocabulary must both be strictly increasing,
    and the final cumulative vocab must equal the corpus distinct-term
    count (the first-occurrence decomposition loses nothing)."""
    rows = registry.QUERIES["text_heaps_law_curve"](spark, sf_correct).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    toks = [r.cum_tokens for r in rows]
    vocab = [r.cum_vocab for r in rows]
    assert all(a < b for a, b in zip(toks, toks[1:]))
    assert all(a <= b for a, b in zip(vocab, vocab[1:]))
    from brooklin_spark.io import table
    from brooklin_spark.functions import text as X

    docs = table(spark, sf_correct, "documents")
    n_terms = (
        docs.select(F.explode(X.tokens()).alias("t")).distinct().count()
    )
    assert vocab[-1] == n_terms
    n_tokens = docs.select(F.sum(F.size(X.tokens())).alias("n")).collect()[0].n
    assert toks[-1] == n_tokens


def test_ttr_bounds(spark, sf_correct):
    """0 <= hapax <= types <= tokens per source, ratios in sane ranges
    (the synthetic corpus draws from a tiny vocab, so hapax can be 0)."""
    rows = registry.QUERIES["text_ttr_per_source"](spark, sf_correct).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_hapax <= r.n_types <= r.n_tokens
        assert 0 < r.ttr <= 1.0
        assert 0 <= r.hapax_ratio <= 1.0


def test_temperature_mixture_boosts_tail(spark, sf_correct):
    """Alpha < 1 must compress shares toward uniform: every language below
    its raw share gains, every language above loses; shares sum to ~1."""
    rows = registry.QUERIES["corpus_temperature_mixture"](
        spark, sf_correct
    ).collect()
    assert abs(sum(r.temp_share for r in rows) - 1.0) < 1e-4
    mean_raw = 1.0 / len(rows)
    for r in rows:
        if r.raw_share < mean_raw:
            assert r.temp_share > r.raw_share, r
        if r.raw_share > mean_raw:
            assert r.temp_share < r.raw_share, r


def test_epoch_plan_caps_and_conserves(spark, sf_correct):
    """Allocation never exceeds the 4-epoch cap or the fair share; capped
    rows are exactly those whose 4-epoch ceiling is below fair share."""
    rows = registry.QUERIES["corpus_epoch_plan"](spark, sf_correct).collect()
    assert rows
    for r in rows:
        assert r.alloc_chars <= 4 * r.chars_s
        assert r.alloc_chars <= r.fair_share
        assert r.capped == (4 * r.chars_s < r.fair_share)
        assert 0 < r.epochs <= 4.0


def test_systematic_sample_stride_and_determinism(spark, sf_correct):
    """Ranks must be exactly {1, 1+k, 1+2k, ...} and two runs must pick
    the identical doc set (hash order, no RNG)."""
    q = registry.QUERIES["corpus_systematic_sample"]
    a = q(spark, sf_correct).collect()
    ranks = sorted(r.rk for r in a)
    assert ranks == list(range(1, ranks[-1] + 1, 50))
    b = q(spark, sf_correct).collect()
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)


def test_trigram_paths_consistent_with_bigrams(spark, sf_correct):
    """Every returned trigram's count must be <= the count of its leading
    bigram in the transition matrix (a trigram instance contains its
    prefix bigram instance)."""
    tri = registry.QUERIES["events_trigram_paths"](spark, sf_correct).collect()
    bi = {
        (r.from_type, r.to_type): r.n_transitions
        for r in registry.QUERIES["events_transition_matrix"](
            spark, sf_correct
        ).collect()
    }
    assert tri
    for r in tri:
        assert r.n_paths <= bi[(r.e1, r.e2)], r


def test_concurrency_overlap_total_sessions(spark, sf_correct):
    """The histogram must account for EVERY session (zero-overlap rows
    included): sum(n_sessions) == sessionizer's total session count."""
    hist = registry.QUERIES["sessions_concurrency_overlap"](
        spark, sf_correct
    ).collect()
    total = sum(r.n_sessions for r in hist)
    sess = registry.QUERIES["sessionize_events"](spark, sf_correct).agg(
        F.sum("n_sessions").alias("n")
    ).collect()[0].n
    assert total == sess


def test_kcore_monotone_and_fixpoint(spark, sf_correct):
    """Peeling can only shrink the graph, and a surviving graph where no
    round-over-round change happened must be a true fixpoint (every node
    degree >= k)."""
    rows = sorted(
        registry.QUERIES["graph_kcore_bounded"](spark, sf_correct).collect(),
        key=lambda r: r.round,
    )
    for a, b in zip(rows, rows[1:]):
        assert b.n_nodes <= a.n_nodes and b.n_edges <= a.n_edges
    last, prev = rows[-1], rows[-2]
    if last.n_edges == prev.n_edges and last.n_edges > 0:
        # verify the fixpoint claim against the raw graph
        from brooklin_spark.queries.dedup import _graph_pairs

        e = _graph_pairs(spark, sf_correct).select(
            F.col("c_node").alias("c"), F.col("s_node").alias("s")
        )
        # recompute the final core by running the same peel in python
        edges = {(r.c, r.s) for r in e.collect()}
        k = rows[0].k
        while True:
            deg: dict = {}
            for c, s in edges:
                deg[c] = deg.get(c, 0) + 1
                deg[s] = deg.get(s, 0) + 1
            alive = {n for n, d in deg.items() if d >= k}
            ne = {(c, s) for c, s in edges if c in alive and s in alive}
            if ne == edges:
                break
            edges = ne
        # bounded 3-round peel can only be a SUPERSET of the true core
        assert last.n_edges >= len(edges)
        if last.n_edges == len(edges):
            nodes = {n for cs in edges for n in cs}
            assert last.n_nodes == len(nodes)


def test_cosine_histogram_matches_numpy(spark, sf_correct):
    """Bin counts must equal a numpy brute-force over the same sample."""
    from brooklin_spark.io import table

    emb = (
        table(spark, sf_correct, "embeddings")
        .filter(F.col("vec_id") < 200)
        .orderBy("vec_id")
        .collect()
    )
    M = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in emb])
    M = M / np.linalg.norm(M, axis=1)[:, None]
    sims = np.round((M @ M.T)[np.triu_indices(len(M), k=1)], 6)
    bins = np.clip(np.floor((sims + 1.0) / 0.1), 0, 19).astype(int)
    expected = {int(b): int(c) for b, c in zip(*np.unique(bins, return_counts=True))}
    got = {
        r.bin: r.n_pairs
        for r in registry.QUERIES["embedding_cosine_histogram"](
            spark, sf_correct
        ).collect()
    }
    assert got == expected
    n = len(M)
    assert sum(got.values()) == n * (n - 1) // 2


def test_prefix_filter_positional_still_exact(spark, sf_correct):
    """The positional filter must not lose pairs: PPJoin output ==
    the capped ngram-jaccard pipeline's output on the same corpus (both
    at threshold 0.7, same shingle width)."""
    pp = {
        (r.doc_a, r.doc_b)
        for r in registry.QUERIES["dedup_prefix_filter_jaccard"](
            spark, sf_correct
        ).collect()
    }
    ng = {
        (r.doc_a, r.doc_b)
        for r in registry.QUERIES["dedup_ngram_jaccard"](
            spark, sf_correct
        ).collect()
    }
    # ngram pipeline is capped (may MISS pairs); PPJoin is exact — every
    # capped-pipeline pair must appear in the PPJoin output
    assert ng <= pp
