"""Corpus-curation operators for the training-data pipeline surface:
benchmark decontamination, PII redaction, repetition (Gopher-style)
signals, TF-IDF term ranking, and deterministic hash-based sampling.

All JVM-native column expressions / built-in joins and windows — no
Python UDFs anywhere. Every operator's hashing is md5-derived and its
arithmetic either integer or single-division double, so each has an
exact DuckDB-SQL oracle (see plans/queries_llm2.py).

100 TB design notes are inline per operator: the shapes here are
broadcast-dim joins, map-side-combinable aggregations, and narrow
projections — no all-pairs joins, no driver-side collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import shingles, tokens
from ._parallel import fan_out_scan

# --- PII patterns (shared with the SQL oracles; RE2/Java-portable:
# no backreferences, no lookaround) --------------------------------------
PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\b\d{3}-\d{4}\b"
# Redaction order matters and is part of the contract: emails first
# (their domain could otherwise be nibbled by the IP pattern), then
# IPs (dotted quads), then bare phone fragments.
PII_RULES: tuple[tuple[str, str], ...] = (
    (PII_EMAIL_RE, "[EMAIL]"),
    (PII_IP_RE, "[IP]"),
    (PII_PHONE_RE, "[PHONE]"),
)


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Match counts per PII class (before redaction)."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        "n_email": F.regexp_count(c, F.lit(PII_EMAIL_RE)),
        "n_ip": F.regexp_count(c, F.lit(PII_IP_RE)),
        "n_phone": F.regexp_count(c, F.lit(PII_PHONE_RE)),
    }


def redact_pii(text: Column | str) -> Column:
    """Replace each PII class with its placeholder token, in the
    PII_RULES order. Pure regexp_replace chain — narrow, codegen'd,
    zero shuffle; at 100 TB this is a free rider on whatever scan
    already touches the text column."""
    c = F.col(text) if isinstance(text, str) else text
    for pat, repl in PII_RULES:
        c = F.regexp_replace(c, pat, repl)
    return c


def repetition_stats(
    df: DataFrame, text_col: str, id_col: str, n: int = 2
) -> DataFrame:
    """Gopher-style repetition signals per document: n-gram count,
    distinct n-gram count, the most-frequent n-gram's count, and the
    derived duplicate-gram / top-gram fractions (null when the doc has
    fewer than n tokens).

    Scale: explode → two groupBys keyed by (doc, gram) then (doc).
    Both aggregations are algebraic (count / max / sum) so map-side
    partial aggregation bounds shuffle volume by the number of DISTINCT
    (doc, gram) pairs per map task, not row count. The final left join
    back to the doc list is on the id — same key as the agg output, so
    AQE plans it shuffle-free on the agg side.
    """
    grams = df.select(
        F.col(id_col), shingles(text_col, n).alias("__grams")
    )
    per_gram = (
        grams.select(id_col, F.explode("__grams").alias("__g"))
        .groupBy(id_col, "__g")
        .agg(F.count("*").alias("__cnt"))
    )
    per_doc = per_gram.groupBy(id_col).agg(
        F.sum("__cnt").alias("n_grams"),
        F.count("*").alias("n_distinct_grams"),
        F.max("__cnt").alias("top_gram_count"),
    )
    out = grams.select(id_col).join(per_doc, id_col, "left")
    n_grams = F.coalesce(F.col("n_grams"), F.lit(0)).cast("long")
    n_dist = F.coalesce(F.col("n_distinct_grams"), F.lit(0)).cast("long")
    top = F.coalesce(F.col("top_gram_count"), F.lit(0)).cast("long")
    return out.select(
        F.col(id_col),
        n_grams.alias("n_grams"),
        n_dist.alias("n_distinct_grams"),
        top.alias("top_gram_count"),
        F.when(n_grams > 0, (n_grams - n_dist).cast("double") / n_grams).alias(
            "dup_gram_frac"
        ),
        F.when(n_grams > 0, top.cast("double") / n_grams).alias(
            "top_gram_frac"
        ),
    )


def decontaminate_ngrams(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 4,
) -> DataFrame:
    """Benchmark decontamination: per training doc, how many of its
    DISTINCT word n-grams appear anywhere in the benchmark corpus
    (the standard 13-gram-overlap check, with n parameterized for the
    small fixture docs).

    Scale: the benchmark n-gram set is the small side (eval suites are
    MBs against a 100 TB train corpus) — distinct'd and broadcast, so
    the probe is a broadcast hash semi-join on the exploded train
    grams: no shuffle of the corpus. The per-doc count then groups on
    the id with map-side combine. If a benchmark ever outgrew
    broadcast, the same plan degrades gracefully to a shuffle join on
    the gram hash.
    """
    bench_grams = (
        benchmark.select(
            F.explode(F.array_distinct(shingles(text_col, n))).alias("__g")
        )
        .distinct()
    )
    # single pass over train: the doc's gram count rides the explode
    # (explode_outer keeps gram-less docs), the broadcast left join
    # marks benchmark grams, one groupBy re-assembles per-doc counts.
    # No self-reference of the shingle pipeline -- it runs ONCE
    # (materialize-once lesson; the previous tr-join-hits shape
    # computed it twice).
    ex = fan_out_scan(train.select(id_col, text_col)).select(
        F.col(id_col),
        F.array_distinct(shingles(text_col, n)).alias("__grams"),
    ).select(
        id_col,
        F.size("__grams").alias("__n"),
        F.explode_outer("__grams").alias("__g"),
    )
    probe = ex.join(
        F.broadcast(bench_grams.withColumn("__hit", F.lit(1))), "__g", "left"
    )
    n_cont = F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long")
    return probe.groupBy(id_col).agg(
        F.max("__n").cast("long").alias("n_shingles"),
        n_cont.alias("n_contaminated"),
        (n_cont > 0).alias("contaminated"),
    )


def tfidf_topk_terms(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Top-k terms per document by TF-IDF.

    The idf is the INTEGER milli-idf `floor(N * 1000 / df)` rather than
    a float log: monotone in N/df (so rankings are log-equivalent at
    fixed N), and — the reason it's integer — bit-portable to the SQL
    oracle with no libm involvement. score = tf * idf_milli (bigint).
    Ties break on the term string ascending, so top-k is fully
    deterministic.

    Scale: tf = groupBy(doc, term) with map-side combine; df =
    groupBy(term) over the already-aggregated tf rows (one row per
    doc-term, far smaller than token count); N joins in as a broadcast
    1-row aggregate, NOT a driver-side .count() — the whole plan stays
    lazy/distributed. The final window partitions by doc — same key as
    tf's shuffle, so no extra exchange.
    """
    # NOT fan_out_scan'd (A/B'd 0.74x in the r10 optimization round):
    # the token explode feeds a groupBy whose shuffle already spreads
    # the aggregation; the extra exchange cost more than it saved
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "idf_milli",
            F.floor(F.col("n_docs") * 1000 / F.col("df")).cast("long"),
        )
        .withColumn("score", (F.col("tf") * F.col("idf_milli")).cast("long"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", "score", F.col("rk").cast("int").alias("rk"))
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic hash-Bernoulli sampling with a per-stratum rate:
    keep a row iff u32(md5(salt:id)) < rate * 2^32. Reproducible
    across engines, runs, and partitionings — unlike df.sample(),
    which is seed-AND-partitioning dependent and so can't be
    oracle-checked or replayed.

    Scale: a narrow filter — no shuffle, no state; the decision is a
    pure function of the row. Exactly what you want for carving
    training mixes out of 100 TB: each executor decides locally, and
    re-running with the same salt reproduces the same sample even
    after repartitioning or file reordering. Thresholds are
    precomputed integer literals, so the comparison is integer-only.
    """
    u32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    thresholds = {s: int(r * 2**32) for s, r in rates.items()}
    thr = F.lit(int(default_rate * 2**32))
    for s, t in sorted(thresholds.items()):
        thr = F.when(F.col(stratum_col) == s, F.lit(t)).otherwise(thr)
    return df.filter(u32 < thr)


def _gram_hash_pair(col: Column):
    """A gram's 128-bit identity as two JVM xxhash64 columns (distinct
    seeds via a salt literal). Everything downstream of the shingle
    scan — bloom build, bloom probe, confirm join — operates on this
    pair, so gram STRINGS never leave the scan stage: the persisted
    train projection, the Arrow transfer to the probe kernel, and the
    join keys are all fixed-width int64."""
    return F.xxhash64(col), F.xxhash64(F.lit("km-b"), col)


def _bloom_positions(ha, hb, num_bits: int, k_hashes: int):
    """(n,) int64 hash pairs -> (n, k) bit positions. Pure numpy,
    uint64 wraparound arithmetic (Kirsch-Mitzenmacher h1 + i*h2 with
    h1 = ha >> 4, h2 = hb | 1); build and probe both route through
    THIS function, so consistency is by construction."""
    import numpy as np

    h1 = ha.astype(np.uint64) >> np.uint64(4)
    h2 = hb.astype(np.uint64) | np.uint64(1)
    i = np.arange(k_hashes, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(num_bits)).astype(
        np.int64
    )


def _bloom_build(has, hbs, num_bits: int, k_hashes: int):
    """Build a bitarray Bloom filter from pre-hashed (ha, hb) int64
    arrays, fully vectorized. Driver-side: the benchmark gram set is
    the SMALL side by contract (eval suites are MBs against a 100 TB
    corpus)."""
    import numpy as np

    bits = np.zeros((num_bits + 7) // 8, dtype=np.uint8)
    p = _bloom_positions(
        np.asarray(has, dtype=np.int64),
        np.asarray(hbs, dtype=np.int64),
        num_bits,
        k_hashes,
    )
    np.bitwise_or.at(bits, p >> 3, (np.uint8(1) << (p & 7).astype(np.uint8)))
    return bits


def bloom_decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 4,
    num_bits: int = 1 << 20,
    k_hashes: int = 5,
) -> DataFrame:
    """Benchmark decontamination with a Bloom-filter PREFILTER and a
    confirm join on the gram's 128-bit xxhash64 pair — same output as
    decontaminate_ngrams (bloom false positives are eliminated by the
    confirm join; two DIFFERENT grams colliding on all 128 bits is the
    only divergence, ~(n_train_grams * n_bench_grams)/2^128, i.e.
    never even at 10^12 x 10^8 grams), so the exact-SQL oracle still
    applies.

    Why a bloom when the broadcast semi-join already works: the
    broadcast side is the full gram set (~GBs for a large eval suite);
    the bloom is `num_bits/8` bytes regardless (128 KiB at the
    default) and the prefilter drops the overwhelmingly-clean corpus
    grams BEFORE the join, so the shuffle/probe volume collapses from
    |train grams| to |bloom hits| ~= |true hits| + fp_rate*|grams|.

    Everything after the shingle scans is integer-only (see
    _gram_hash_pair): the train projection holds array<struct<a,b>>
    hash pairs (fixed-width, several times smaller than gram strings),
    the membership test is an Arrow-batched pandas_udf receiving two
    int64 columns (vectorized numpy bit probes, no Python hashing, no
    strings in Python at all), and the confirm side joins on the same
    pair.

    The train text is tokenized/hashed ONCE per run: the exploded
    (id, ha, hb) int rows go through one tracked persist and serve
    both consumers (bloom-probe branch + per-doc totals). An earlier
    revision cached the pre-explode nested struct-array column, which
    cost more to materialize than it saved; flat int64 rows cache
    cheaply, and on a real cluster the single text scan is the point
    (the scan dominates at TB scale).
    """
    import numpy as np

    from .._dist import ensure_workers_can_import

    ensure_workers_can_import(train.sparkSession)

    from ._cache import track_persist

    spark = train.sparkSession
    bha, bhb = _gram_hash_pair(F.col("__g"))
    bench_gram_hashes = (
        benchmark.select(tokens(text_col).alias("__t"))
        .select(
            F.explode(
                F.array_distinct(shingles(text_col, n, toks=F.col("__t")))
            ).alias("__g")
        )
        .select(bha.alias("__ha"), bhb.alias("__hb"))
    )
    # bloom-build job: per-doc-distinct hashes, no global dedup shuffle
    # (setting a bloom bit twice is a no-op; numpy dedups below).
    hash_rows = bench_gram_hashes.collect()  # small side by contract
    pair_arr = np.unique(
        np.array(
            [(r["__ha"], r["__hb"]) for r in hash_rows], dtype=np.int64
        ).reshape(-1, 2),
        axis=0,
    )
    bits = _bloom_build(pair_arr[:, 0], pair_arr[:, 1], num_bits, k_hashes)
    bc = spark.sparkContext.broadcast(bits)
    nb, kh = int(num_bits), int(k_hashes)
    # confirm build side: Arrow createDataFrame of the already-collected
    # distinct pairs -> a LocalRelation, so the broadcast hash table is
    # built driver-side with NO extra Spark job (the in-plan
    # scan+distinct alternative costs two more jobs per run; at cluster
    # scale with an eval suite too big to collect, swap this for the
    # in-plan distinct + shuffle confirm join).
    import pandas as pd

    bench_pairs = spark.createDataFrame(
        pd.DataFrame({"__ha": pair_arr[:, 0], "__hb": pair_arr[:, 1]})
    )

    @F.pandas_udf("boolean")
    def _might_contain(ha, hb):  # type: ignore[no-untyped-def]
        import pandas as pd

        arr = bc.value
        p = _bloom_positions(
            ha.to_numpy(dtype=np.int64), hb.to_numpy(dtype=np.int64), nb, kh
        )
        hit = ((arr[p >> 3] >> (p & 7).astype(np.uint8)) & 1).all(axis=1)
        return pd.Series(hit)

    def _pair_struct(g):
        ga, gb = _gram_hash_pair(g)
        return F.struct(ga.alias("a"), gb.alias("b"))

    tr = fan_out_scan(train.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), tokens(text_col).alias("__t")
    ).select(
        F.col(id_col),
        F.transform(
            F.array_distinct(shingles(text_col, n, toks=F.col("__t"))),
            _pair_struct,
        ).alias("__gh"),
    )
    # Explode FIRST, persist the slim (id, ha, hb) int rows, and serve
    # BOTH branches (bloom-probe path + per-doc totals) from that one
    # cache: the text is tokenized/hashed exactly once per run. This is
    # what an earlier persist of the nested array column attempted, where
    # the cache materialization cost more than the recompute; flat
    # int64 rows columnar-cache at ~3 words/gram and made the single
    # scan a win (measured at sf0.1). explode_outer keeps
    # zero-shingle docs (ha NULL) so the totals branch sees every doc.
    ex = track_persist(
        tr.select(id_col, F.explode_outer("__gh").alias("__e")).select(
            id_col, F.col("__e.a").alias("__ha"), F.col("__e.b").alias("__hb")
        )
    )
    pre = ex.filter(
        F.col("__ha").isNotNull()
        & _might_contain(F.col("__ha"), F.col("__hb"))
    )
    hits = (
        # confirm: kills bloom FPs exactly (up to 128-bit collision)
        pre.join(F.broadcast(bench_pairs), ["__ha", "__hb"])
        .groupBy(id_col)
        .agg(F.count("*").alias("__hits"))
    )
    totals = ex.groupBy(id_col).agg(
        F.count("__ha").cast("long").alias("n_shingles")
    )
    n_cont = F.coalesce(F.col("__hits"), F.lit(0)).cast("long")
    # no broadcast hint on hits: usually tiny (contaminated docs) but
    # unbounded at scale -- let AQE pick broadcast when it measures small
    return totals.join(hits, id_col, "left").select(
        F.col(id_col),
        "n_shingles",
        n_cont.alias("n_contaminated"),
        (n_cont > 0).alias("contaminated"),
    )


def bloom_decontaminate_incremental(
    train: DataFrame,
    bench_base: DataFrame,
    bench_delta: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 4,
    num_bits: int = 1 << 20,
    k_hashes: int = 5,
) -> DataFrame:
    """Incremental decontamination refresh (VERDICT r8 #6): the
    benchmark suite arrives in batches, and re-screening the corpus
    against a NEW batch must cost O(|delta suite| + |base-clean
    corpus|), never a from-scratch rebuild.

    Mechanics: per-batch Bloom filters over the gram hash pairs are
    MERGEABLE (bitwise OR == the bloom of the union set, by
    construction of _bloom_build -- pinned in tests/test_r9_properties.py), so
    the standing corpus-screen artifact is `bloom_base | bloom_delta`
    while the incremental pass itself probes ONLY bloom_delta and ONLY
    the docs that cleared the base screen: a doc already quarantined
    by the base suite never needs re-reading, and the delta bloom
    (128 KiB) prefilters the clean corpus's grams before the (tiny)
    exact confirm join against the delta gram pairs.

    Output: one row per train doc -- (id, status, n_hits) with status
    'base' (hit the base suite), 'delta' (cleared base, hit the new
    batch -- the rows the refresh exists to find), or 'clean'. Same
    exactness argument as bloom_decontaminate: the confirm join kills
    bloom false positives, so the SQL twin is the plain two-batch
    intersection with CASE priority base > delta.

    100 TB shape: one corpus text scan (the exploded int64 gram rows
    are persisted and serve the base probe, the delta probe, and the
    per-doc spine); both confirm joins broadcast collected benchmark
    pairs (eval suites are MBs by contract); the delta probe's input
    is the base-clean subset via a broadcast-able anti-join on doc id.
    """
    import numpy as np
    import pandas as pd

    from .._dist import ensure_workers_can_import

    ensure_workers_can_import(train.sparkSession)

    from ._cache import track_persist

    spark = train.sparkSession

    def _pairs(bench: DataFrame) -> np.ndarray:
        ha, hb = _gram_hash_pair(F.col("__g"))
        rows = (
            bench.select(tokens(text_col).alias("__t"))
            .select(
                F.explode(
                    F.array_distinct(shingles(text_col, n, toks=F.col("__t")))
                ).alias("__g")
            )
            .select(ha.alias("__ha"), hb.alias("__hb"))
            .collect()  # small side by contract (eval suites are MBs)
        )
        if not rows:
            return np.empty((0, 2), dtype=np.int64)
        return np.unique(
            np.array([(r["__ha"], r["__hb"]) for r in rows], dtype=np.int64
                     ).reshape(-1, 2),
            axis=0,
        )

    base_arr, delta_arr = _pairs(bench_base), _pairs(bench_delta)
    bloom_base = _bloom_build(base_arr[:, 0], base_arr[:, 1], num_bits, k_hashes)
    bloom_delta = _bloom_build(
        delta_arr[:, 0], delta_arr[:, 1], num_bits, k_hashes
    )
    bc_base = spark.sparkContext.broadcast(bloom_base)
    bc_delta = spark.sparkContext.broadcast(bloom_delta)
    nb, kh = int(num_bits), int(k_hashes)

    def _probe_udf(bc):
        @F.pandas_udf("boolean")
        def _might_contain(ha, hb):  # type: ignore[no-untyped-def]
            arr = bc.value
            p = _bloom_positions(
                ha.to_numpy(dtype=np.int64), hb.to_numpy(dtype=np.int64), nb, kh
            )
            hit = ((arr[p >> 3] >> (p & 7).astype(np.uint8)) & 1).all(axis=1)
            return pd.Series(hit)

        return _might_contain

    probe_base, probe_delta = _probe_udf(bc_base), _probe_udf(bc_delta)

    def _pair_struct(g):
        ga, gb = _gram_hash_pair(g)
        return F.struct(ga.alias("a"), gb.alias("b"))

    tr = fan_out_scan(train.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), tokens(text_col).alias("__t")
    ).select(
        F.col(id_col),
        F.transform(
            F.array_distinct(shingles(text_col, n, toks=F.col("__t"))),
            _pair_struct,
        ).alias("__gh"),
    )
    # one text scan: flat (id, ha, hb) int rows serve all three
    # consumers (base probe, delta probe, per-doc spine)
    ex = track_persist(
        tr.select(id_col, F.explode_outer("__gh").alias("__e")).select(
            id_col, F.col("__e.a").alias("__ha"), F.col("__e.b").alias("__hb")
        )
    )

    def _confirmed_hits(probe, pair_arr: np.ndarray, src: DataFrame) -> DataFrame:
        pairs = spark.createDataFrame(
            pd.DataFrame(
                {"__ha": pair_arr[:, 0], "__hb": pair_arr[:, 1]}
            ),
            schema="__ha long, __hb long",
        )
        pre = src.filter(
            F.col("__ha").isNotNull() & probe(F.col("__ha"), F.col("__hb"))
        )
        return (
            pre.join(F.broadcast(pairs), ["__ha", "__hb"])
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("__hits"))
        )

    base_hits = track_persist(_confirmed_hits(probe_base, base_arr, ex))
    # the incremental pass: only base-CLEAN docs' grams probe the delta
    # bloom (left_anti on the quarantined doc ids, broadcast-able: the
    # anti side is the contaminated id set, small in practice; at
    # cluster scale AQE measures it)
    clean_ex = ex.join(F.broadcast(base_hits.select(id_col)), id_col, "left_anti")
    delta_hits = _confirmed_hits(probe_delta, delta_arr, clean_ex)

    spine = ex.groupBy(id_col).agg(
        F.count("__ha").cast("long").alias("__n_shingles")
    )
    bh = F.coalesce(F.col("__bh"), F.lit(0)).cast("long")
    dh = F.coalesce(F.col("__dh"), F.lit(0)).cast("long")
    return (
        spine.join(base_hits.withColumnRenamed("__hits", "__bh"), id_col, "left")
        .join(delta_hits.withColumnRenamed("__hits", "__dh"), id_col, "left")
        .select(
            F.col(id_col),
            F.when(bh > 0, F.lit("base"))
            .when(dh > 0, F.lit("delta"))
            .otherwise(F.lit("clean"))
            .alias("status"),
            F.when(bh > 0, bh).when(dh > 0, dh).otherwise(F.lit(0))
            .cast("long")
            .alias("n_hits"),
        )
    )


def domain_cap(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    cap: int,
    salt: str = "cap",
) -> DataFrame:
    """Per-domain document cap: deterministically rank each domain's
    docs by (md5(salt:id), id) and flag rank <= cap. The md5 orders
    docs pseudo-randomly WITHIN a domain, so the cap keeps an unbiased
    sample rather than the lowest ids; the id tiebreak makes it total.

    The workhorse of domain balancing (a handful of template-heavy
    hosts otherwise dominate a web corpus). One hash-partitioned
    window per domain; skew note: a pathological mega-domain serializes
    its own rank() — cap it upstream with a cheap groupBy count filter
    if a single domain exceeds task-memory row counts.
    """
    rk = F.row_number().over(
        Window.partitionBy(domain_col).orderBy(
            F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
            F.col(id_col),
        )
    )
    return df.select(
        F.col(id_col),
        F.col(domain_col),
        rk.cast("long").alias("cap_rank"),
        (rk <= cap).alias("kept"),
    )


def collocation_pmi(
    docs: DataFrame, text_col: str, min_count: int = 5, k: int = 100
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information over
    the whole corpus: which adjacent word pairs co-occur far more
    often than their unigram frequencies predict (the classic
    collocation-extraction signal; PMI = log N·c(xy)/(c(x)·c(y))).

    Bit-portability: the score is the INTEGER ppm-scaled lift
    ``c_xy * N * 1e6 div (c_x * c_y)`` computed in DECIMAL(20,0)
    arithmetic -- monotone in PMI (log is monotone), exact in both
    engines (the DuckDB twin uses HUGEINT ``//``), and overflow-safe
    to beyond 10^13 corpus tokens (~100 TB of text), verified against
    Python big-int floor division. Ties break on (w1, w2), which is
    unique after the group-by, so the top-k is a total order.

    Scale shape: two map-side-combinable aggregates (unigram counts =
    the vocabulary table, bigram counts via a transform/explode that
    never materializes more than the token stream), the 1-row corpus
    total broadcast, and two vocab joins the optimizer is free to
    broadcast when the vocabulary is small (it grows with content,
    not corpus size, so it is NOT hand-broadcast). The min-count
    filter runs BEFORE the vocab joins, so the scored set is the rare
    tail's complement, and the global top-k is Spark's
    TakeOrderedAndProject -- per-partition top-k, k-row merge, no
    full sort.
    """
    from ._cache import track_persist

    toks = track_persist(docs.select(tokens(text_col).alias("__toks")))
    uni = track_persist(
        toks.select(F.explode("__toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    n_tok = uni.agg(F.sum("c").cast("long").alias("n_tok"))
    bi = (
        toks.filter(F.size("__toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__toks) - 1),"
                    " i -> struct(__toks[i-1] AS w1, __toks[i] AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    big = (
        bi.groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c_xy"))
        .filter(F.col("c_xy") >= min_count)
    )
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c_w1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c_w2"))
    scored = (
        big.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n_tok))
        .withColumn(
            "pmi_ratio_ppm",
            F.expr(
                "CAST(CAST(c_xy AS DECIMAL(20,0)) * n_tok * 1000000"
                " div (CAST(c_w1 AS DECIMAL(20,0)) * c_w2) AS BIGINT)"
            ),
        )
    )
    top = scored.orderBy(F.desc("pmi_ratio_ppm"), "w1", "w2").limit(k)
    w = Window.orderBy(F.desc("pmi_ratio_ppm"), "w1", "w2")
    return top.select(
        "w1",
        "w2",
        "c_xy",
        "c_w1",
        "c_w2",
        "pmi_ratio_ppm",
        F.row_number().over(w).cast("int").alias("rk"),
    )
