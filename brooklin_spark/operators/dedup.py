"""Document deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash.

The reference has no record-level dedup (SURVEY.md §2.7 — at-least-once
only); these are the north-star LLM-pipeline operators, built Spark-first:

- every hash is md5 (identical across engines → oracle-checkable);
- MinHash signatures are column-wise ``min()`` aggregates over exploded
  shingles (map-side partial min, one shuffle per doc set);
- LSH banding turns the O(n²) pair space into per-band equi-joins —
  the 100 TB path: candidates per band bucket, verify only candidates;
- SimHash is a per-word parity vote, one groupBy, then banded or
  all-pairs hamming verification.

Scale notes: the only all-pairs product here is candidate verification;
at 100 TB you keep band rows small (tune bands × rows_per_band to the
target jaccard threshold) so each band bucket stays tiny, and the
verify join is candidates ⋈ shingles (semi-join pushdown), never a full
cross join.
"""

from __future__ import annotations

import functools
import hashlib
import operator as pyop

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens_col(text_col: str = "text") -> Column:
    """Whitespace tokens with empties dropped (parity: list_filter(string_split))."""
    return F.filter(F.split(F.col(text_col), " "), lambda x: x != "")


def shingle_arrays(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Per-document DISTINCT word n-gram shingle array: (id, shingles).

    Entirely map-side (split → shifted-slice zip_with → array_distinct):
    no shuffle beyond the initial repartition that spreads a small-file
    corpus across cores. Keeping shingles as an array per doc means
    dedup stages that only need per-doc views (signatures, set sizes,
    intersection verify) never pay an explode+groupBy round trip.
    """
    # Shifted-slice zip_with: gram_i = toks[i] + ' ' + toks[i+1] + ... built
    # by zipping n shifted views of the token array. Constant number of
    # split() evaluations per row — element_at(toks, i) inside a transform
    # would re-evaluate the split per index (O(tokens²) per doc).
    toks = tokens_col(text_col)
    cnt = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.slice(toks, 1, cnt)
    for j in range(1, n):
        shifted = F.slice(toks, 1 + j, cnt)
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return df.repartition(F.col(id_col)).select(
        F.col(id_col).alias("id"), F.array_distinct(grams).alias("shingles")
    )


def shingle_arrays_pandas(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document DISTINCT word n-gram shingle array via an Arrow-batched
    pandas UDF: (id, *extra_cols, shingles). ``extra_cols`` ride through
    untouched so downstream per-doc projections (e.g. the video near-dup
    boilerplate hashes keyed on lang) need no join back to the corpus.

    Same output as shingle_arrays (first-occurrence order, empty array for
    docs shorter than n tokens), ~3x faster measured at sf0.1: Spark's
    array higher-order functions are interpreted per element (see the r1
    perf lesson — HOFs are NOT codegen'd), while this is one vectorized
    Python call per Arrow batch. Map-side and partition-preserving, so the
    scale story is unchanged: no shuffle, work is O(tokens) per row.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _sh(texts: pd.Series) -> pd.Series:
        out = []
        for txt in texts:
            toks = [w for w in (txt or "").split(" ") if w]
            m = len(toks)
            if m < n:
                out.append([])
                continue
            out.append(
                list(dict.fromkeys(" ".join(toks[i : i + n]) for i in range(m - n + 1)))
            )
        return pd.Series(out)

    # explicit partition count: the Python kernel's cost is CPU per token,
    # not bytes, and AQE's byte-based coalescing would shrink a bare
    # repartition() to a handful of tasks (measured 6-8 on local[32] —
    # 4-5x the runtime). A numbered repartition is exempt from coalescing,
    # so the UDF keeps full-cluster parallelism; on a real cluster
    # defaultParallelism scales with executors.
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n_parts, F.col(id_col)).select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in extra_cols],
        _sh(F.col(text_col)).alias("shingles"),
    )


def shingle_rows_pandas(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Exploded distinct word n-gram shingles via ONE mapInPandas kernel:
    (id, n, shingle) rows with the per-doc set size carried on every row.

    The shingle_arrays_pandas + size() + explode() composition evaluates
    the pandas UDF TWICE per consumer (the optimizer routes the dual
    shingles reference into two ArrowEvalPython nodes — observed in the
    executed sf1 plan), and a self-join consumer doubles that again.
    Emitting the exploded rows directly from the kernel makes one Python
    pass per consumption, and the explode never materializes the array
    column in the JVM at all. Same distinctness/order semantics.
    """
    n_parts = df.sparkSession.sparkContext.defaultParallelism

    def op(batches):
        for pdf in batches:
            ids: list = []
            ns: list = []
            shs: list = []
            for doc_id, txt in zip(pdf[id_col], pdf[text_col]):
                toks = [w for w in (txt or "").split(" ") if w]
                m = len(toks)
                if m < n:
                    continue
                sh = list(
                    dict.fromkeys(" ".join(toks[i : i + n]) for i in range(m - n + 1))
                )
                ids.extend([doc_id] * len(sh))
                ns.extend([len(sh)] * len(sh))
                shs.extend(sh)
            yield pd.DataFrame({"id": ids, "n": ns, "shingle": shs})

    return df.repartition(n_parts, F.col(id_col)).mapInPandas(
        op, schema="id bigint, n int, shingle string"
    )


def word_shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle) rows.

    Distinctness comes from the per-doc array_distinct — no global
    distinct shuffle (the old plan's costliest stage).
    """
    return shingle_arrays(df, id_col, text_col, n).select(
        "id", F.explode("shingles").alias("shingle")
    )


#: default posting-list cap: a shingle shared by more docs than this is
#: treated as stopword-like and dropped from pair generation (precision
#: trade documented in the functions below). 1024² pair expansions per
#: shingle is the worst case a single task ever sees.
MAX_POSTING = 1024


def pair_common_counts(shingles: DataFrame, max_posting: int = MAX_POSTING) -> DataFrame:
    """(id, shingle) rows -> (id_a, id_b, common): co-occurrence counts for
    every doc pair sharing >=1 shingle, id_a < id_b.

    Shape: posting-count map-side aggregate → broadcast anti-join dropping
    hot shingles → equi-self-join on shingle → pair groupBy. All codegen
    (measured ~2x the grouped HOF pair expansion at sf0.1 — array HOFs are
    interpreted); the shingle exchange is shared between the count and the
    join sides.

    The ``max_posting`` cap is ENFORCED here (VERDICT r1 'what's wrong'
    #1): a stopword-like shingle at web scale otherwise expands one task
    quadratically (collect/join blowup → OOM). Dropping those postings is
    the standard precision trade — a pair sharing ONLY ultra-common
    shingles is not a near-duplicate; every pair sharing any discriminative
    shingle is unaffected.
    """
    hot = (
        shingles.groupBy("shingle")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > max_posting)
        .select("shingle")
    )
    capped = shingles.join(F.broadcast(hot), "shingle", "left_anti")
    a = capped.alias("a")
    b = capped.alias("b")
    return (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )


def pair_common_counts_grouped(
    shingles: DataFrame, max_posting: int = MAX_POSTING
) -> DataFrame:
    """Grouped-posting-list variant of pair_common_counts: one
    groupBy(shingle) collecting the posting list, in-group upper-triangle
    pair expansion, one groupBy(pair). Same capped semantics. Prefer when
    the extra self-join shuffle dominates (very wide clusters); the HOF
    expansion is interpreted, so the default self-join path wins locally.
    """
    grouped = (
        shingles.groupBy("shingle")
        .agg(F.array_sort(F.collect_list("id")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_posting))
    )
    pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + F.lit(2), F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        grouped.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )


def jaccard_pairs_selfjoin(
    shingles: DataFrame, threshold: float, max_posting: int = MAX_POSTING
) -> DataFrame:
    """Exact Jaccard for every doc pair sharing >=1 shingle, in one
    self-join pass: ``shingles`` is (id, n, shingle) with the per-doc set
    size CARRIED on every shingle row, so the pair groupBy aggregates
    (id_a, id_b, na, nb) together and the two size-lookup joins of the
    classic shape disappear entirely — plan: [hot-shingle cap] →
    self-join on shingle → one groupBy → filter. Carrying n costs 8
    bytes/row in the shuffle; each removed join was a full shuffle or a
    broadcast barrier.

    The ``max_posting`` cap is enforced as a COUNT WINDOW over the same
    shingle-keyed exchange the join consumes: both join sides canonicalize
    to the identical windowed subtree, so ReuseExchange shuffles the
    shingle rows ONCE, the posting count is read off that exchange for
    free, and the upstream pandas shingler runs a single time without any
    checkpoint (measured ~1s faster than a separate count+anti-join pass
    at sf0.1). Same skew-safety semantics as pair_common_counts.
    Returns (doc_a, doc_b, jaccard), doc_a < doc_b.
    """
    from pyspark.sql import Window as W

    capped = (
        shingles.withColumn(
            "c", F.count("*").over(W.partitionBy("shingle"))
        )
        .filter(F.col("c") <= max_posting)
        .drop("c")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(F.count("*").alias("common"))
    )
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    return common.select(
        "doc_a", "doc_b", jac.alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def jaccard_pairs_grouped_numpy(
    shingles: DataFrame, threshold: float, max_posting: int = MAX_POSTING
) -> DataFrame:
    """Exact all-pairs Jaccard via grouped posting blocks + vectorized
    numpy pair expansion — the single-consumption rewrite of
    jaccard_pairs_selfjoin (VERDICT r2 next-round #3).

    Why: the self-join shape consumes the shingle table TWICE, and Spark
    cannot reuse an exchange across pandas-UDF subtrees (python UDF nodes
    never canonicalize equal), so the upstream shingler ran once per join
    side — and with the size+explode dual reference, twice per side. This
    shape touches the shingle stream ONCE:

      shingles (id, n, shingle)
        → ONE exchange keyed on shingle
        → count window (cap: drop c>max_posting hot shingles AND c<2
          singletons — most rows die here, before any array exists)
        → collect_list posting blocks on the SAME partitioning (no second
          exchange)
        → mapInPandas: all posting lists in an Arrow batch expand to
          (id_a, id_b) pairs in ONE numpy triangular-index computation
          (no per-group Python call), locally combined with np.unique
        → final groupBy((id_a, id_b)) sums partial counts → jaccard.

    Skew safety matches the window-cap self-join: the cap filter runs on
    the count window, so a stopword shingle's rows are dropped BEFORE
    collect_list materializes any array. Pair work is inherently O(Σc²)
    — that is what exact all-pairs means; LSH is the sub-quadratic path.
    Returns (doc_a, doc_b, jaccard), doc_a < doc_b.
    """
    from pyspark.sql import Window as W

    posting = (
        shingles.withColumn("c", F.count("*").over(W.partitionBy("shingle")))
        .filter((F.col("c") >= 2) & (F.col("c") <= max_posting))
        .groupBy("shingle")
        .agg(
            F.collect_list(F.struct(F.col("id"), F.col("n"))).alias("docs")
        )
        .select("docs")
    )

    def expand(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            lists = pdf["docs"].tolist()
            lens = np.fromiter((len(g) for g in lists), dtype=np.int64)
            flat_id = np.fromiter(
                (d["id"] for g in lists for d in g), dtype=np.int64
            )
            flat_n = np.fromiter(
                (d["n"] for g in lists for d in g), dtype=np.int64
            )
            cnt = lens * (lens - 1) // 2
            total = int(cnt.sum())
            if total == 0:
                continue
            grp = np.repeat(np.arange(len(lens)), cnt)
            starts = np.concatenate(([0], np.cumsum(cnt)[:-1]))
            r = np.arange(total) - np.repeat(starts, cnt)
            L = lens[grp]
            # invert the row-major upper-triangle rank: first index i is
            # the largest i with C(i) = i(2L-1-i)/2 <= r; float sqrt then
            # integer correction (exact for L <= max_posting)
            i = ((2 * L - 1) - np.sqrt((2 * L - 1) ** 2 - 8 * r)) // 2
            i = i.astype(np.int64)
            ci = i * (2 * L - 1 - i) // 2
            over = ci > r
            i -= over
            ci[over] = i[over] * (2 * L[over] - 1 - i[over]) // 2
            j = r - ci + i + 1
            off = np.repeat(np.concatenate(([0], np.cumsum(lens)[:-1])), cnt)
            a_idx, b_idx = off + i, off + j
            ia, ib = flat_id[a_idx], flat_id[b_idx]
            na, nb = flat_n[a_idx], flat_n[b_idx]
            swap = ia > ib
            ia2 = np.where(swap, ib, ia)
            ib2 = np.where(swap, ia, ib)
            na2 = np.where(swap, nb, na)
            nb2 = np.where(swap, na, nb)
            # local combine: one sort-based unique over the pair keys cuts
            # the shuffled rows by each pair's in-partition multiplicity
            order = np.lexsort((ib2, ia2))
            ia2, ib2, na2, nb2 = ia2[order], ib2[order], na2[order], nb2[order]
            new = np.empty(total, dtype=bool)
            new[0] = True
            new[1:] = (ia2[1:] != ia2[:-1]) | (ib2[1:] != ib2[:-1])
            idx = np.nonzero(new)[0]
            common = np.diff(np.concatenate((idx, [total])))
            yield pd.DataFrame(
                {
                    "id_a": ia2[idx],
                    "id_b": ib2[idx],
                    "na": na2[idx],
                    "nb": nb2[idx],
                    "common": common,
                }
            )

    partial = posting.mapInPandas(
        expand, schema="id_a bigint, id_b bigint, na bigint, nb bigint, common bigint"
    )
    agg = partial.groupBy("id_a", "id_b", "na", "nb").agg(
        F.sum("common").alias("common")
    )
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    return agg.select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        jac.alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def jaccard_verify(
    arrays: DataFrame, candidates: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard for candidate pairs via per-row array intersection.

    candidates(id_a, id_b) ⋈ arrays ⋈ arrays, then
    |A∩B| / (|A|+|B|-|A∩B|) computed JVM-side per pair — no explode, no
    per-pair aggregation. This is the scale-path verify kernel: work is
    O(candidates), each row touching only its two shingle sets.
    """
    a = arrays.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = arrays.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    common = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = common / (F.size("sh_a") + F.size("sh_b") - common)
    return (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_pairs(
    shingles: DataFrame,
    threshold: float,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard similarity for document pairs sharing >=1 shingle.

    ``candidates`` (id_a, id_b) restricts the pair space (the LSH path);
    without it the pair space is the shingle self-join (only sane at small
    scale — at 100 TB always pass candidates).
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    sizes = shingles.groupBy("id").agg(F.count("*").alias("n_sh"))
    if candidates is not None:
        # candidates-first: only candidate pairs ever reach the shingle
        # intersection — the whole point of LSH at scale. Two equi-joins
        # keyed on doc id, then count matching shingles per pair.
        cand = candidates.select(
            F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
        ).distinct()
        sa_sh = shingles.select(F.col("id").alias("doc_a"), F.col("shingle").alias("sh"))
        sb_sh = shingles.select(F.col("id").alias("doc_b"), F.col("shingle").alias("sh"))
        common = (
            cand.join(sa_sh, "doc_a")
            .join(sb_sh, ["doc_b", "sh"])  # equi-join on (doc, shingle)
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("common"))
        )
    else:
        a = shingles.alias("a")
        b = shingles.alias("b")
        common = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .groupBy(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
            .agg(F.count("*").alias("common"))
        )
    sa = sizes.select(F.col("id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("id").alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signature_arrays(arrays: DataFrame, num_hashes: int = 16) -> DataFrame:
    """MinHash signature computed map-side from per-doc shingle arrays:
    h_k = array_min(transform(shingles, s -> md5(k || ':' || s))).

    Zero shuffles — the signature exists before any exchange, so at scale
    the only shuffled data is (id, 16 hashes), never the shingle rows.
    Lexicographic min over lowercase hex == uniform min-hash.
    """
    cols = [
        F.array_min(
            F.transform(
                F.col("shingles"),
                lambda s: F.md5(F.concat(F.lit(f"{k}:"), s)),
            )
        ).alias(f"h{k}")
        for k in range(num_hashes)
    ]
    return arrays.select("id", *cols)


def minhash_signature_km(shingles: DataFrame, num_hashes: int = 16) -> DataFrame:
    """MinHash via Kirsch-Mitzenmacher double hashing: ONE md5 per shingle
    yields two 32-bit ints (a, b); hash family h_k = (a + k·b) mod 2^32.
    Same uniformity guarantees for minhash, 1/16th the hashing cost of the
    per-k md5 family. Numeric mins, integer band keys.
    """
    h = F.md5(F.col("shingle"))
    base = shingles.select(
        "id",
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint").alias("h1"),
        F.conv(F.substring(h, 9, 8), 16, 10).cast("bigint").alias("h2"),
    )
    aggs = [
        F.min((F.col("h1") + k * F.col("h2")) % F.lit(4294967296)).alias(f"h{k}")
        for k in range(num_hashes)
    ]
    return base.groupBy("id").agg(*aggs)


def minhash_signature_pandas(
    arrays: DataFrame, num_hashes: int = 16, extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """MinHash signature computed map-side from per-doc shingle arrays via
    an Arrow-batched pandas UDF — Kirsch-Mitzenmacher double hashing, SAME
    hash family as minhash_signature_km (one md5 per shingle → two
    big-endian 32-bit ints a,b; h_k = (a + k·b) mod 2^32), verified
    bit-identical, so the cross-engine oracle is unchanged.

    Zero shuffles: the signature exists before any exchange (the groupBy
    shuffle of the _km variant disappears), and the per-batch numpy min is
    vectorized instead of per-row aggregate buffers. At scale the only
    shuffled data downstream is (id, 16 ints).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<bigint>")
    def _mh(shingles: pd.Series) -> pd.Series:
        ks = np.arange(num_hashes, dtype=np.uint64)
        out = []
        for s_arr in shingles:
            if len(s_arr) == 0:
                out.append([0] * num_hashes)
                continue
            dig = np.frombuffer(
                b"".join(hashlib.md5(s.encode()).digest()[:8] for s in s_arr),
                dtype=">u4",
            ).reshape(len(s_arr), 2)
            h1 = dig[:, 0].astype(np.uint64)
            h2 = dig[:, 1].astype(np.uint64)
            hk = (h1[:, None] + ks[None, :] * h2[:, None]) & 0xFFFFFFFF
            out.append(hk.min(axis=0).astype(np.int64).tolist())
        return pd.Series(out)

    extras = [F.col(c) for c in extra_cols]
    sig = arrays.select("id", *extras, _mh(F.col("shingles")).alias("mh"))
    return sig.select(
        "id", *extras, *[F.col("mh")[k].alias(f"h{k}") for k in range(num_hashes)]
    )


def minhash_signature(shingles: DataFrame, num_hashes: int = 16) -> DataFrame:
    """MinHash signature: h_k = min(md5(k || ':' || shingle)) per doc.

    Lexicographic min over lowercase hex == uniform min-hash; one groupBy
    with ``num_hashes`` partial-aggregating min() columns (map-side combine,
    single shuffle keyed by doc id).
    """
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{k}:"), F.col("shingle")))).alias(f"h{k}")
        for k in range(num_hashes)
    ]
    return shingles.groupBy("id").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int,
    rows_per_band: int,
    max_bucket: int | None = None,
) -> DataFrame:
    """Band the signature and emit candidate pairs sharing any band bucket.

    The band key is the raw tuple of its ``rows_per_band`` hash ints —
    pairs come from a per-(band_id, k0..k{r-1}) multi-column equi-self-join
    (all codegen; a hashed band key like md5(concat) selects the SAME
    candidate set — equal key iff equal tuple — while paying per-row
    hashing, so the tuple join is strictly better; the DuckDB oracle keeps
    md5 band keys and matches because the candidate sets coincide). The
    shuffle is keyed on the band tuple; minhash uniformity spreads
    DISTINCT documents, but a giant exact/near-dup cluster (the 100k-copy
    boilerplate page every web crawl carries) shares whole signatures and
    lands in ONE bucket — quadratic pairs. ``max_bucket`` is the posting
    cap for that case: buckets larger than it are dropped (members stay
    discoverable through their other bands unless those are equally hot;
    the standard LSH recall trade). The cap is enforced as a map-side-
    combined bucket count reduced to the (normally EMPTY) over-cap hot
    set, anti-joined back: the banded table itself never shuffles for the
    cap — a count WINDOW here would force Exchange+Sort of every band row
    even when the cap never binds (measured 1.3-1.6x on the sf0.1 bench,
    where AQE broadcasts the candidate join and the window's exchange was
    the only shuffle). The hot set is bounded by total_rows/cap; no
    broadcast hint — AQE broadcasts it when it is as tiny as it almost
    always is. Returns distinct (id_a, id_b), id_a < id_b.
    """
    band_cols = []
    for j in range(bands):
        rows = [
            F.col(f"h{j * rows_per_band + r}").alias(f"k{r}")
            for r in range(rows_per_band)
        ]
        band_cols.append(F.struct(F.lit(j).alias("band_id"), *rows))
    banded = signatures.select("id", F.explode(F.array(*band_cols)).alias("b")).select(
        "id", "b.*"
    )
    if max_bucket is not None:
        keys = ["band_id"] + [f"k{r}" for r in range(rows_per_band)]
        hot = (
            banded.groupBy(*keys)
            .agg(F.count("*").alias("__c"))
            .filter(F.col("__c") > max_bucket)
            .drop("__c")
        )
        banded = banded.join(hot, keys, "left_anti")
    x = banded.alias("x")
    y = banded.alias("y")
    key_eq = functools.reduce(
        pyop.and_,
        [F.col(f"x.k{r}") == F.col(f"y.k{r}") for r in range(rows_per_band)],
        F.col("x.band_id") == F.col("y.band_id"),
    )
    return (
        x.join(y, key_eq & (F.col("x.id") < F.col("y.id")))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )


def simhash_signature_arrays(arrays: DataFrame, bits: int = 32) -> DataFrame:
    """SimHash computed map-side from per-doc shingle arrays: md5 each
    shingle once, then per-bit parity votes via array aggregates — zero
    shuffles (the ``hs`` projection stays a separate plan node, so the 32
    bit-aggregates share one md5 pass; CollapseProject keeps multi-use
    non-cheap aliases un-inlined)."""
    hashed = arrays.select(
        "id", F.transform(F.col("shingles"), lambda s: F.md5(s)).alias("hs")
    )
    bit_cols = []
    for b in range(1, bits + 1):
        vote = F.aggregate(
            F.col("hs"),
            F.lit(0),
            lambda acc, h: acc + (2 * (F.ascii(F.substring(h, b, 1)) % 2) - 1),
        )
        bit_cols.append(F.when(vote >= 0, F.lit("1")).otherwise(F.lit("0")))
    return hashed.select("id", F.concat(*bit_cols).alias("sig"))


def simhash_signature(shingles: DataFrame, bits: int = 32) -> DataFrame:
    """SimHash over shingle features: bit b set iff the majority of the
    doc's (distinct) shingles has odd ascii(md5(shingle)[b]).

    Shingle features (vs raw words) keep signatures discriminative even on
    a small shared vocabulary — the Manku et al. web-dedup setup. One
    groupBy with ``bits`` sum columns; the signature is a '0'/'1' string so
    downstream hamming is pure substring comparison (engine-portable).
    """
    h = F.md5(F.col("shingle"))
    sums = [
        F.sum(2 * (F.ascii(F.substring(h, b, 1)) % 2) - 1).alias(f"s{b}")
        for b in range(1, bits + 1)
    ]
    agg = shingles.groupBy("id").agg(*sums)
    sig = F.concat(
        *[
            F.when(F.col(f"s{b}") >= 0, F.lit("1")).otherwise(F.lit("0"))
            for b in range(1, bits + 1)
        ]
    )
    return agg.select("id", sig.alias("sig"))


def connected_components(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b", max_iter: int = 20
) -> DataFrame:
    """Connected components over near-duplicate pairs -> (id, component)
    where component = min id reachable (the canonical doc of the cluster).

    Min-label propagation: each iteration joins current labels across the
    (symmetrized) edge list and takes the min neighbor label; converges in
    O(cluster diameter) iterations — near-dup clusters are shallow (dup
    pairs chain through shared content), so a handful of rounds suffice.
    Each round is two shuffles (join + groupBy); labels are checkpointed
    per round to keep lineage flat. For web-scale graphs with deep
    components swap in large-star/small-star (same API).

    Convergence check (r9-opt): labels can only DECREASE
    (new = least(old, min neighbor)), so SUM(comp) strictly decreases iff
    ANY label changed — an exact-decimal scalar aggregate replaces the
    old per-round labels-x-labels equality join, and evaluating it on the
    round's lazy localCheckpoint makes ONE job both materialize the new
    labels and test convergence (was: a checkpoint job + a join-count
    job per round — 2 jobs and one node-scale join more, every round).
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("comp"))
        .localCheckpoint(eager=False)
    )
    # decimal(38,0): exact for any sum of <= 2^63-scale ids over any
    # realistic node count — float would break the equality test
    _sig = F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
    prev_sig = labels.agg(_sig).first()[0]
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("comp").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))).alias(
                    "comp"
                ),
            )
            .localCheckpoint(eager=False)
        )
        sig = new_labels.agg(_sig).first()[0]  # materializes the checkpoint
        labels = new_labels
        if sig == prev_sig:
            break
        prev_sig = sig
    return labels


def simhash_signature_int_pandas(arrays: DataFrame, bits: int = 32) -> DataFrame:
    """SimHash BIGINT signature computed map-side from per-doc shingle
    arrays via an Arrow-batched pandas UDF — bit-identical to
    simhash_signature_int (bit b, MSB-first, set iff the majority of the
    doc's shingles votes odd on md5 hex digit b), verified equal, so the
    cross-engine oracle is unchanged.

    Collapses shingle-explode + md5/conv parse + the ``bits``-column
    groupBy into ONE zero-shuffle vectorized pass (measured 3.3s → 0.5s at
    sf0.1; the groupBy with 32 aggregate buffers was the local cost the
    r1 verdict flagged). The nibble-parity extraction is numpy over the
    raw digest bytes: hex digit 2i is the high nibble of byte i, 2i+1 the
    low nibble; digit parity = nibble LSB.
    """
    if bits != 32:
        raise ValueError("pandas simhash kernel packs 32-bit signatures")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def _sim(shingles: pd.Series) -> pd.Series:
        out = np.empty(len(shingles), dtype=np.int64)
        weights = (1 << np.arange(31, -1, -1)).astype(np.int64)
        for i, s_arr in enumerate(shingles):
            if len(s_arr) == 0:
                out[i] = 0
                continue
            dig = np.frombuffer(
                b"".join(hashlib.md5(s.encode()).digest() for s in s_arr),
                dtype=np.uint8,
            ).reshape(len(s_arr), 16)
            nib = np.empty((len(s_arr), 32), dtype=np.uint8)
            nib[:, 0::2] = dig >> 4
            nib[:, 1::2] = dig & 15
            votes = (nib & 1).astype(np.int32).sum(axis=0) * 2 - len(s_arr)
            out[i] = int(((votes >= 0) * weights).sum())
        return pd.Series(out)

    return arrays.select("id", _sim(F.col("shingles")).alias("sig"))


def simhash_pairs_onepass(
    signatures: DataFrame,
    bits: int,
    bands: int,
    max_distance: int,
    max_bucket: int | None = None,
) -> DataFrame:
    """EXACT hamming-<=d pairs over BIGINT signatures in ONE join pass:
    the signature rides along with its band rows, so hamming verification
    (bit_count(xor)) happens inline in the band equi-join — no re-join
    against the signature table, no checkpoint needed (single consumer).
    Manku pigeonhole exactness as in banded_hamming_pairs_int (d < bands ⇒
    a qualifying pair agrees on a full band).

    Scale: the shuffle key is (band_id, band_key); carrying the 8-byte sig
    per band row is 4×8 bytes/doc — negligible against re-shuffling the
    signature table twice for the verify joins it replaces. Bucket size is
    corpus/2^(bits/bands) in expectation, so bits/bands must be sized to
    log2(corpus) at scale; ``max_bucket`` drops buckets above the cap
    (map-side-combined bucket count -> over-cap hot set -> anti-join, the
    same shape as lsh_candidate_pairs: the band rows never shuffle for
    the cap and there is no per-row sort), trading recall inside over-cap
    buckets for a hard per-bucket pair bound, same discipline as the
    LSH/posting caps.
    """
    if max_distance >= bands:
        raise ValueError("exactness requires max_distance < bands")
    width = bits // bands
    mask = (1 << width) - 1
    band_structs = [
        F.struct(
            F.lit(j).alias("band_id"),
            F.shiftright(F.col("sig"), (bands - 1 - j) * width)
            .bitwiseAND(F.lit(mask))
            .alias("band_key"),
        )
        for j in range(bands)
    ]
    banded = signatures.select(
        "id", "sig", F.explode(F.array(*band_structs)).alias("b")
    ).select("id", "sig", "b.band_id", "b.band_key")
    if max_bucket is not None:
        hot = (
            banded.groupBy("band_id", "band_key")
            .agg(F.count("*").alias("__c"))
            .filter(F.col("__c") > max_bucket)
            .drop("__c")
        )
        banded = banded.join(hot, ["band_id", "band_key"], "left_anti")
    x = banded.alias("x")
    y = banded.alias("y")
    dist = F.bit_count(F.col("x.sig").bitwiseXOR(F.col("y.sig"))).cast("int")
    return (
        x.join(
            y,
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("doc_a"),
            F.col("y.id").alias("doc_b"),
            dist.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_distance)
        .distinct()
    )


def connected_components_star(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b", max_iter: int = 50
) -> DataFrame:
    """Connected components via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) -> (id, comp) with comp = min id of the component. Same API
    and output as connected_components (min-label propagation); swap in
    for graphs with DEEP components: convergence is O(log² n) rounds in
    the worst case instead of O(diameter), and each round's shuffle is
    keyed on node id with per-node fan-in (no frontier growth).

    large-star: every neighbor v > u re-links to min(Γ(u) ∪ {u});
    small-star: every neighbor v <= u re-links to that minimum. The edge
    set converges to stars centered at component minima.
    """
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        edges.select(F.col("u").alias("id"))
        .union(edges.select(F.col("v").alias("id")))
        .distinct()
        .localCheckpoint()
    )

    def fingerprint(e: DataFrame) -> tuple[int, int]:
        row = e.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).first()
        return row.n, row.h

    def canon(e: DataFrame) -> DataFrame:
        # unordered pair -> (u, v) with u > v, no self loops, distinct
        return (
            e.select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    edges = canon(edges).localCheckpoint()
    prev_fp = fingerprint(edges)
    for _ in range(max_iter):
        sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        # large-star
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("u", "mv").alias("m"))
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        kept = sym.filter(F.col("v") <= F.col("u"))
        edges = canon(large.union(kept)).localCheckpoint()
        # small-star
        sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        smallnb = sym.filter(F.col("v") <= F.col("u"))
        mins2 = smallnb.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            smallnb.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins2.select(F.col("u").alias("u"), F.col("m").alias("v")))
        )
        kept2 = sym.filter(F.col("v") > F.col("u")).select(
            F.col("v").alias("u"), F.col("u").alias("v")
        )
        edges = canon(small.union(kept2)).localCheckpoint()
        fp = fingerprint(edges)
        if fp == prev_fp:
            break
        prev_fp = fp
    # converged stars: every non-center node u links to its center v=min
    centers = edges.groupBy("u").agg(F.min("v").alias("comp")).select(
        F.col("u").alias("id"), "comp"
    )
    return (
        nodes.join(centers, "id", "left")
        .select("id", F.coalesce(F.col("comp"), F.col("id")).alias("comp"))
    )


def simhash_signature_int(shingles: DataFrame, bits: int = 32) -> DataFrame:
    """SimHash as a BIGINT signature: bit b (MSB-first) set iff the majority
    of the doc's shingles votes odd on md5 hex digit b. Integer signatures
    make banding a shift+mask and hamming a single bit_count(xor) — no
    string slicing anywhere in the verify path.

    Vote extraction parses the md5 hex into 8-digit ints once, then reads
    each digit's parity as the LSB of its nibble (shift+and) — integer ops
    instead of per-digit substring/ascii."""
    h = F.md5(F.col("shingle"))
    n_words = (bits + 7) // 8
    base = shingles.select(
        "id",
        *[
            F.conv(F.substring(h, 8 * g + 1, 8), 16, 10).cast("bigint").alias(f"w{g}")
            for g in range(n_words)
        ],
    )
    sums = []
    for b in range(1, bits + 1):
        g = (b - 1) // 8
        off = 4 * (7 - ((b - 1) % 8))  # nibble offset inside the 32-bit word
        parity = F.shiftright(F.col(f"w{g}"), off).bitwiseAND(F.lit(1))
        sums.append(F.sum(2 * parity - 1).alias(f"s{b}"))
    agg = base.groupBy("id").agg(*sums)
    sig = functools.reduce(
        pyop.add,
        [
            F.when(F.col(f"s{b}") >= 0, F.lit(1 << (bits - b))).otherwise(F.lit(0))
            for b in range(1, bits + 1)
        ],
    )
    return agg.select("id", sig.cast("bigint").alias("sig"))


def banded_hamming_pairs_int(
    signatures: DataFrame, bits: int, bands: int, max_distance: int
) -> DataFrame:
    """EXACT hamming-<=d pairs over BIGINT signatures (Manku pigeonhole:
    d < bands ⇒ a qualifying pair agrees on a full band). Band keys are
    shift+mask; verify is bit_count(sig_a XOR sig_b) — all integer ops,
    fully codegen'd."""
    if max_distance >= bands:
        raise ValueError("exactness requires max_distance < bands")
    width = bits // bands
    mask = (1 << width) - 1
    band_structs = [
        F.struct(
            F.lit(j).alias("band_id"),
            F.shiftright(F.col("sig"), (bands - 1 - j) * width).bitwiseAND(
                F.lit(mask)
            ).alias("band_key"),
        )
        for j in range(bands)
    ]
    banded = signatures.select(
        "id", F.explode(F.array(*band_structs)).alias("b")
    ).select("id", "b.band_id", "b.band_key")
    x = banded.alias("x")
    y = banded.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    sa = signatures.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = signatures.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    dist = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int")
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            dist.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_distance)
    )


def _hamming_expr(bits: int) -> "F.Column":
    return functools.reduce(
        pyop.add,
        [
            (
                F.substring(F.col("a.sig"), p, 1) != F.substring(F.col("b.sig"), p, 1)
            ).cast("int")
            for p in range(1, bits + 1)
        ],
    )


def hamming_pairs(signatures: DataFrame, bits: int, max_distance: int) -> DataFrame:
    """All-pairs hamming distance over bit-string signatures (small-corpus
    verification kernel; prefer banded_hamming_pairs at scale)."""
    a = signatures.alias("a")
    b = signatures.alias("b")
    dist = _hamming_expr(bits)
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            dist.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_distance)
    )


def banded_hamming_pairs(
    signatures: DataFrame, bits: int, bands: int, max_distance: int
) -> DataFrame:
    """EXACT hamming-<=d pairs via signature banding (Manku et al.):
    with d < bands, pigeonhole guarantees every qualifying pair agrees on
    at least one full band, so candidates = per-band equi-joins and the
    cross join never happens. The verify step recomputes true hamming.

    This is the 100 TB simhash path: the shuffle is keyed on (band, key).
    """
    if max_distance >= bands:
        raise ValueError("exactness requires max_distance < bands")
    width = bits // bands
    band_structs = [
        F.struct(
            F.lit(j).alias("band_id"),
            F.substring(F.col("sig"), j * width + 1, width).alias("band_key"),
        )
        for j in range(bands)
    ]
    banded = signatures.select(
        "id", F.explode(F.array(*band_structs)).alias("b")
    ).select("id", "b.band_id", "b.band_key")
    x = banded.alias("x")
    y = banded.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    sa = signatures.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = signatures.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    dist = functools.reduce(
        pyop.add,
        [
            (F.substring(F.col("sig_a"), p, 1) != F.substring(F.col("sig_b"), p, 1)).cast(
                "int"
            )
            for p in range(1, bits + 1)
        ],
    )
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            dist.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_distance)
    )


def band_rows(signatures: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """Explode a minhash signature table into band rows (id, band_id,
    k0..k{r-1}) — the shared banding step of lsh_candidate_pairs, exposed
    for probe-vs-base joins (incremental dedup: band the NEW batch and the
    BASE corpus separately, then equi-join on the band tuple instead of a
    self-join). Map-side only; the shuffle happens at whatever join
    consumes the band rows, keyed on the band tuple."""
    band_cols = []
    for j in range(bands):
        rows = [
            F.col(f"h{j * rows_per_band + r}").alias(f"k{r}")
            for r in range(rows_per_band)
        ]
        band_cols.append(F.struct(F.lit(j).alias("band_id"), *rows))
    return signatures.select(
        "id", F.explode(F.array(*band_cols)).alias("b")
    ).select("id", "b.*")


def lsh_candidates_against(
    probe_banded: DataFrame, base_banded: DataFrame, rows_per_band: int
) -> DataFrame:
    """Distinct candidate pairs (id_a from probe, id_b from base) sharing
    any band bucket — the bipartite form of lsh_candidate_pairs. Both
    inputs come from band_rows(); the join is a plain equi-join on
    (band_id, k0..k{r-1}), so at scale it shuffles band tuples, never
    signatures or documents, and the probe side is typically the small
    daily increment (broadcastable when it fits)."""
    x = probe_banded.alias("x")
    y = base_banded.alias("y")
    key_eq = functools.reduce(
        pyop.and_,
        [F.col(f"x.k{r}") == F.col(f"y.k{r}") for r in range(rows_per_band)],
        F.col("x.band_id") == F.col("y.band_id"),
    )
    return (
        x.join(y, key_eq)
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )


def span_rows_pandas(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 8
) -> DataFrame:
    """Exploded positional n-token spans via ONE mapInPandas kernel:
    (id, n_tok, pos, h) rows — pos is the 1-based token position, h the
    md5 hex of the space-joined span, n_tok the doc's token count
    carried on every row (so consumers never re-scan the text).

    Exists because the JVM composition (transform over sequence + slice
    + array_join + md5 + explode) is interpreted PER ELEMENT — measured
    16.4 s at sf1 vs 2.4 s for this kernel; same r1 lesson as the
    shingle kernels above. Map-side, partition-preserving, no shuffle.
    """
    import hashlib as _hl

    n_parts = df.sparkSession.sparkContext.defaultParallelism

    def op(batches):
        for pdf in batches:
            ids: list = []
            nt: list = []
            ps: list = []
            hs: list = []
            for doc_id, txt in zip(pdf[id_col], pdf[text_col]):
                toks = [w for w in (txt or "").split(" ") if w]
                m = len(toks)
                if m < n:
                    continue
                for i in range(m - n + 1):
                    hs.append(
                        _hl.md5(" ".join(toks[i : i + n]).encode()).hexdigest()
                    )
                ids.extend([doc_id] * (m - n + 1))
                nt.extend([m] * (m - n + 1))
                ps.extend(range(1, m - n + 2))
            yield pd.DataFrame({"id": ids, "n_tok": nt, "pos": ps, "h": hs})

    return df.repartition(n_parts, F.col(id_col)).mapInPandas(
        op, schema="id bigint, n_tok int, pos int, h string"
    )
