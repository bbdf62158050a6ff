"""Deduplication operators.

Reference parity: keep-first dedup on a key (module-global caches at
building-inspector.js:92, :204 -- first occurrence in file order wins).
Spark's dropDuplicates keeps an *arbitrary* row, so keep_first() uses an
explicit order column + row_number window for deterministic semantics.

Extensions (training-data pipeline, 100 TB design notes inline):
exact hash dedup, MinHash+LSH near-dup, SimHash, n-gram Jaccard.
All hash functions are md5-derived so every operator has an exact
DuckDB-SQL oracle (engine-portable hashing, no F.hash/xxhash64 which
differ across engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint, shingles, tokens
from ._cache import track_persist
from ._parallel import fan_out_scan


def keep_first(df: DataFrame, keys: list[str], order_by: list[str]) -> DataFrame:
    """First row per key under an explicit deterministic order
    (reference D1/D2 semantics: building-inspector.js:97-100, :211-214).

    Scale: one hash shuffle on `keys`; the window is computed per
    partition after the shuffle (no second exchange since partitionBy
    matches the shuffle keys). Skewed keys are handled by AQE skew-join
    ... not applicable to windows -- if a single key dominates at 100 TB,
    pre-aggregate with min_by on the order columns instead (same
    semantics, map-side partial aggregation):
    df.groupBy(keys).agg(F.min_by(F.struct('*'), F.struct(order_by))).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact near-identical text dedup: group by md5(normalized text),
    keep the lowest id. groupBy gets map-side partial aggregation for
    free (min is algebraic), so the shuffle carries one row per
    fingerprint per map task -- the scalable shape for 100 TB."""
    return (
        df.withColumn("fp", fingerprint(text_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").alias("dup_count"),
        )
    )


def minhash_signature(
    df: DataFrame, text_col: str, k: int = 8, shingle_n: int = 3,
    fanout: bool = True,
) -> DataFrame:
    """Append minhash_0..minhash_{k-1} columns: minhash_i = min over
    shingles of the i-th 8-hex-char chunk of sha256(shingle).
    Engine-portable (DuckDB: substr(sha256(x), i*8+1, 8)); NULL when
    the document has no shingles. k <= 8 (sha256 = 64 hex chars).

    Plan shape (both measured at sf0.1):
      * ONE hash call per shingle -- the k hash functions are disjoint
        chunks of a single sha256 (independent uniform bits), not k
        salted md5s (8x less hashing than the naive scheme);
      * the hash array is materialized in its own projection, then ONE
        aggregate() fold keeps all k running chunk-mins. Naive k
        independent array_min(transform(...)) columns re-derive
        tokenize+shingle k times -- 6.7x slower.
    Fully narrow: no shuffle, scales linearly.
    """
    if k > 8:
        raise ValueError("k <= 8: sha256 yields 8 disjoint 8-hex chunks")
    # one sha256 per shingle via interpreted HOFs is the dominant CPU
    # of every minhash consumer; spread the scan's 1-2 splits across
    # the session's cores first (guide 2.5 -- see operators/_parallel).
    # `fanout=False` for micro-batch callers (streaming index refresh):
    # a few hundred rows per batch make the exchange pure overhead
    # (A/B'd 0.92x in the r10 optimization round).
    if fanout:
        df = fan_out_scan(df)
    sh_col = "__mh_shingles"
    h_col = "__mh_hashes"
    staged = df.withColumn(sh_col, shingles(text_col, shingle_n))
    staged = staged.withColumn(
        h_col, F.transform(F.col(sh_col), lambda s: F.sha2(s, 256))
    )
    # init: 'g'*8 sorts after every hex chunk, acting as +inf.
    init = F.array(*[F.lit("g" * 8) for _ in range(k)])

    def step(acc: Column, h: Column) -> Column:
        chunks = F.array(*[F.substring(h, i * 8 + 1, 8) for i in range(k)])
        return F.zip_with(acc, chunks, lambda a, c: F.least(a, c))

    sig = F.when(
        F.size(F.col(h_col)) > 0, F.aggregate(F.col(h_col), init, step)
    )  # otherwise NULL, matching list_min([]) in the oracle
    staged = staged.withColumn("__sig", sig)
    return staged.select(
        *df.columns,
        *[F.col("__sig").getItem(i).alias(f"minhash_{i}") for i in range(k)],
    )


def minhash_lsh_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    sig: DataFrame | None = None,
    fanout: bool = True,
) -> DataFrame:
    """(id, band, key) band-bucket assignments — the LSH blocking
    table minhash_lsh_pairs self-joins, exposed so diagnostics (the
    cap-loss report in plans/queries_llm16.py) can aggregate bucket
    WIDTHS from the exact same construction. `sig` as in
    minhash_lsh_pairs."""
    rows_per_band = k // bands
    if sig is None:
        sig = minhash_signature(
            df.select(id_col, text_col), text_col, k, shingle_n, fanout=fanout
        )
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    "|", *[f"minhash_{b * rows_per_band + r}" for r in range(rows_per_band)]
                )
            ).alias("key"),
        )
        for b in range(bands)
    ]
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket_width: int | None = None,
    sig: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH.

    `sig`, when given, is a precomputed frame holding `id_col` and
    minhash_0..minhash_{k-1} (the minhash_signature output): callers
    that also need the signatures for their own estimates (the
    calibration evals) compute them ONCE and share, instead of this
    function re-deriving the whole tokenize+shingle+sha256 lineage.

    Plan shape (the 100 TB path):
      1. signature: narrow, no shuffle.
      2. band keys: explode k/bands-row concatenated hashes -> (band,
         key, id). One row per doc per band.
      3. self-equi-join on (band, key) with id_a < id_b: a shuffle
         hash join on the band key -- candidates only ever co-locate
         within a bucket, so the join never goes quadratic unless a
         bucket is hot (identical boilerplate docs).
      4. distinct pairs.

    `max_bucket_width` bounds step 3's quadratic worst case: buckets
    wider than the cap are dropped before the self-join (one
    count-aggregate + left-semi join, both map-side-combinable). A hot
    bucket of w boilerplate docs otherwise yields w^2/2 rows; with the
    cap the per-bucket cost is <= cap^2/2. Dropping over-wide buckets
    is also the semantically right boilerplate filter -- exact-identical
    docs belong to exact_dedup, not near-dup pairing.
    """
    buckets = minhash_lsh_buckets(
        df, text_col, id_col, k=k, bands=bands, shingle_n=shingle_n, sig=sig
    )
    # self-join would otherwise recompute the whole signature pipeline
    # for each side; persist so it runs once (tracked: see
    # _cache.release_persisted). At cluster scale this is a small
    # (id, band, key) projection -- memory-cheap.
    buckets = track_persist(buckets)
    if max_bucket_width is not None:
        keep = (
            buckets.groupBy("band", "key")
            .count()
            .filter(F.col("count") <= max_bucket_width)
            .select("band", "key")
        )
        buckets = buckets.join(keep, ["band", "key"], "left_semi")
    a = buckets.alias("a")
    b = buckets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    return pairs


def simhash(df: DataFrame, text_col: str, bits: int = 16) -> DataFrame:
    """Append a `simhash` BIGINT column (bits <= 32).

    Each token votes +1/-1 per bit position, bit = sign of the sum.
    Token hash = first 8 hex chars of md5 (32 bits), engine-portable.
    Closed-form columns: explode-free -- the per-bit sums are computed
    with aggregate() over the token array, so this is narrow/no-shuffle.
    """
    # Stage 1: one md5 per token (materialized array column) -- first 8
    # hex chars of md5 -> unsigned 32-bit int via conv(), JVM-native and
    # engine-portable (DuckDB twin: cast('0x'||substr(md5,1,8))).
    h_col = "__sh_hashes"
    # md5-per-token + the bits-wide interpreted vote fold dominate;
    # fan the 1-2 scan splits out across cores first (guide 2.5)
    df = fan_out_scan(df)
    staged = df.withColumn(
        h_col,
        F.transform(
            tokens(text_col),
            lambda tok: F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long"),
        ),
    )
    # Stage 2: one aggregate() pass accumulating all per-bit votes
    # (state = array of `bits` running sums) instead of `bits`
    # independent folds that would each re-tokenize and re-hash.
    init = F.array(*[F.lit(0).cast("long") for _ in range(bits)])

    def step(acc: Column, h: Column) -> Column:
        votes = F.array(
            *[
                F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1))
                .otherwise(F.lit(-1))
                .cast("long")
                for b in range(bits)
            ]
        )
        return F.zip_with(acc, votes, lambda a, v: a + v)

    votes = F.aggregate(F.col(h_col), init, step)
    staged = staged.withColumn("__votes", votes)
    total = None
    for b in range(bits):
        bit = F.when(
            F.col("__votes").getItem(b) > 0, F.lit(2**b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        total = bit if total is None else total + bit
    return staged.withColumn("simhash", total).select(*df.columns, "simhash")


def simhash_hamming_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket_width: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance with banded
    blocking: (id_a, id_b, hamming) for all pairs with
    popcount(simhash_a XOR simhash_b) <= max_hamming.

    Unlike MinHash LSH this blocking is EXACT, not approximate: by
    pigeonhole, two hashes differing in <= bands-1 bits agree on at
    least one of `bands` disjoint bit-slices, so every qualifying pair
    (max_hamming <= bands-1) lands in some shared bucket. The
    bucket-join recall proof is `assert max_hamming < bands`.

    Plan shape mirrors minhash_lsh_pairs: narrow signature, explode to
    one (band, slice) row per doc per band, shuffle equi-join on the
    slice key, exact popcount filter after. At 100 TB use bits=64 with
    16-bit slices (4 bands) so buckets stay selective; the
    max_bucket_width cap bounds the identical-boilerplate worst case
    the same way (those belong to exact_dedup anyway).
    """
    assert max_hamming < bands, "banding is only lossless for hamming < bands"
    band_bits = bits // bands
    sh = simhash(df.select(id_col, text_col), text_col, bits=bits).select(
        id_col, "simhash"
    )
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), b * band_bits)
            .bitwiseAND(F.lit((1 << band_bits) - 1))
            .alias("key"),
        )
        for b in range(bands)
    ]
    buckets = sh.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*band_cols)).alias("bk")
    ).select(
        id_col, "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    buckets = track_persist(buckets)
    if max_bucket_width is not None:
        keep = (
            buckets.groupBy("band", "key")
            .count()
            .filter(F.col("count") <= max_bucket_width)
            .select("band", "key")
        )
        buckets = buckets.join(keep, ["band", "key"], "left_semi")
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs that share at
    least one shingle.

    Plan: explode distinct shingles -> self-join on shingle (shuffle
    co-locates docs sharing a shingle) -> count shared shingles per
    pair -> |A∩B| / (|A|+|B|-|A∩B|). At 100 TB the shared-shingle join
    is the bottleneck on stop-shingle hot keys: one shingle shared by w
    docs yields w^2/2 join rows.

    `max_doc_freq` drops shingles whose document frequency exceeds the
    cap BEFORE everything else (sizes included), bounding the join at
    cap^2/2 per shingle. Semantics become "Jaccard over the
    non-boilerplate shingle set" -- stop-shingles carry no similarity
    signal, so this is the stop-word filter of classic IR, applied
    consistently to intersection AND union (both sides of the ratio).
    """
    sh = (
        # shingle explode + md5 per shingle from a 1-2 split scan:
        # fan out across cores first (guide 2.5, operators/_parallel)
        fan_out_scan(df.select(id_col, text_col))
        .select(id_col, F.explode(F.array_distinct(shingles(text_col, shingle_n))).alias("sh"))
    )
    if max_doc_freq is not None:
        rare = (
            sh.groupBy("sh")
            .count()
            .filter(F.col("count") <= max_doc_freq)
            .select("sh")
        )
        sh = sh.join(rare, "sh", "left_semi")
    # shuffle on 8-byte md5-derived keys instead of multi-word shingle
    # strings: measured 2x on the self-join at sf0.1, and shuffle WIDTH
    # is the real 100 TB cost. 60-bit keys make collisions (merged
    # shingles) negligible at fixture scale and a standard
    # hashing-trick approximation at corpus scale; the oracle applies
    # the IDENTICAL hash, so results stay bit-equal.
    sh = sh.select(
        id_col,
        F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10)
        .cast("long")
        .alias("sh"),
    )
    # referenced 3x (sizes + both join sides): compute once (tracked
    # persist, released by _cache.release_persisted between queries)
    sh = track_persist(sh)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        # unrounded: int/int division is bit-identical across engines;
        # round() is not portable at half-boundaries.
        .withColumn(
            "jaccard",
            F.col("n_shared").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over an undirected pair graph by min-label
    propagation: every node's label converges to the smallest node id
    reachable from it. Returns (node, component).

    This is the dedup-clustering step that turns near-dup PAIRS (from
    MinHash-LSH / Jaccard / embedding-LSH) into groups: keep
    min(component), drop the rest.

    Scale: each round is one shuffle join (symmetrized edges against
    current labels) plus an algebraic min-aggregate — the classic
    iterative-CC shape (Hash-to-Min, Vassilvitskii et al.); rounds
    needed = graph diameter, and near-dup graphs are shallow (clusters
    are cliques-ish, diameter 2-3). localCheckpoint() per round cuts
    the lineage so plan size stays O(1) in rounds instead of
    exponential; convergence is detected with a count of changed
    labels — a scalar aggregate per round, the one legitimate
    driver-side action in an iterative algorithm.
    """
    from ._cache import (
        free_local_checkpoint,
        track_local_checkpoint,
        track_local_checkpoint_lazy,
    )

    # symmetrize in ONE pass over `edges` (explode of a 2-struct
    # array), not a self-union: the union form evaluated the whole
    # upstream pair pipeline TWICE when `sym` first materializes --
    # for the CC consumers that upstream is the full minhash
    # signature + banded self-join build, the dominant cost of the
    # query (r11 optimization round, guide 2.4: don't compute things
    # twice). Same multiset of (s, d) rows, order-insensitive
    # consumers (distinct, equi-joins, min-aggregates).
    sym = edges.select(
        F.explode(
            F.array(
                F.struct(F.col(src).alias("s"), F.col(dst).alias("d")),
                F.struct(F.col(dst).alias("s"), F.col(src).alias("d")),
            )
        ).alias("__e")
    ).select(F.col("__e.s").alias("s"), F.col("__e.d").alias("d"))
    sym = track_persist(sym)
    checkpointed = track_local_checkpoint(
        sym.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    labels = checkpointed
    # NOTE (r10 optimization round, measured and REVERTED): hinting the
    # node-sized sides broadcast per round (the checkpointed labels
    # carry no stats, so the planner can't choose it) A/B'd 0.82-0.97x
    # -- the per-round broadcast build + the node-count job cost more
    # than the AQE-coalesced tiny shuffles they replaced. The shuffle
    # plan stays.
    for _ in range(max_iter):
        neigh_min = (
            sym.join(labels, sym["d"] == labels["node"])
            .groupBy("s")
            .agg(F.min("comp").alias("nmin"))
        )
        # LAZY checkpoint + the convergence count as its materializing
        # action: one Spark job per round instead of two (VERDICT r10
        # #3 -- the count is a full scan, so every partition is
        # computed and cached before the previous round is freed).
        updated = track_local_checkpoint_lazy(
            labels.join(neigh_min, labels["node"] == neigh_min["s"], "left")
            .select(
                "node",
                "comp",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))
                ).alias("new_comp"),
            )
        )
        changed = updated.filter(F.col("new_comp") != F.col("comp")).count()
        # `updated` is now fully materialized; the previous round's
        # blocks are dead weight -- free them so an iterative run
        # holds at most 2 rounds of state, not O(rounds) (which
        # evicted live caches in long sessions).
        free_local_checkpoint(checkpointed)
        checkpointed = updated
        labels = updated.select("node", F.col("new_comp").alias("comp"))
        if changed == 0:
            break
    # the final round's checkpoint stays tracked: release_persisted()
    # frees it after the caller materializes the result.
    return labels.select(F.col("node"), F.col("comp").alias("component"))


def connected_components_alternating(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14). Same (node, component=min reachable id) contract as
    connected_components(); different scale profile.

    Why a second algorithm: min-label propagation needs rounds ~ graph
    DIAMETER and re-shuffles the FULL edge set every round — fine for
    shallow near-dup cliques, wrong for long chains (transitive dup
    paths) or high-degree hubs. Large-star/small-star converges in
    O(log n) rounds regardless of diameter, and each round REWRITES
    the edge set toward stars, so the shuffled volume shrinks as it
    converges instead of staying constant.

    Per round, two pure groupBy+join passes over the current edges:
      large-star: every neighbor v > u links to min(N(u) ∪ {u})
      small-star: every neighbor v ≤ u links to min(N⁻(u) ∪ {u})
    Both are map-side-combinable min-aggregates keyed by node — no
    driver-side state beyond the scalar convergence count.
    """
    from ._cache import (
        free_local_checkpoint,
        track_local_checkpoint,
        track_local_checkpoint_lazy,
    )

    # checkpoint the edge input ONCE: both the node set and the
    # canonical edge set below otherwise re-evaluate the whole
    # upstream pair pipeline (for the CC consumers that is the full
    # minhash signature + banded self-join build -- guide 2.4: don't
    # compute things twice)
    ein = track_local_checkpoint(
        edges.select(
            F.col(src).cast("long").alias("u"),
            F.col(dst).cast("long").alias("v"),
        )
    )
    nodes = track_local_checkpoint(
        ein.select(F.explode(F.array("u", "v")).alias("node")).distinct()
    )
    e0 = ein.filter(F.col("u") != F.col("v"))
    # canonical orientation (hi, lo): dedups the undirected edge set
    cur = track_local_checkpoint(
        e0.select(
            F.greatest("u", "v").alias("hi"), F.least("u", "v").alias("lo")
        ).distinct()
    )
    free_local_checkpoint(ein)  # nodes + cur hold everything needed
    cur_count = None  # carried scalar: saves a recount job per round
    for _ in range(max_iter):
        sym = cur.select(F.col("hi").alias("u"), F.col("lo").alias("v")).unionByName(
            cur.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        # large-star: m(u) = min over N(u) ∪ {u}; attach every LARGER
        # neighbor to it. Keeps hub fan-out bounded: a degree-k node
        # emits k edges total, never k² candidate pairs.
        lmin = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", "u").alias("m"))
        )
        large = (
            sym.join(lmin, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .filter(F.col("hi") != F.col("lo"))
        )
        # small-star over the large-star output: m(hi) = min smaller
        # neighbor; re-link every smaller neighbor AND hi itself to m.
        smin = large.groupBy("hi").agg(F.min("lo").alias("m"))
        small = (
            large.join(smin, "hi")
            .select(F.col("lo").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .unionByName(
                smin.select(F.col("hi").alias("a"), F.col("m").alias("b"))
            )
            .select(
                F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo")
            )
            .distinct()
        )
        # LAZY checkpoint: the cardinality count below is the
        # materializing action (one job instead of a dedicated
        # checkpoint job + a count job). The previous round's count is
        # carried as a scalar, saving its recount job; the exceptAll
        # probe only runs when the cardinalities tie (i.e. near
        # convergence). VERDICT r10 #3.
        nxt = track_local_checkpoint_lazy(small)
        nxt_count = nxt.count()
        if cur_count is None:
            cur_count = cur.count()
        # converged iff the (distinct, canonical) edge sets are equal:
        # same cardinality and nothing new.
        changed = (
            nxt_count != cur_count
            or nxt.exceptAll(cur).limit(1).count() > 0
        )
        free_local_checkpoint(cur)
        cur = nxt
        cur_count = nxt_count
        if not changed:
            break
    # converged: `cur` is a forest of stars (hi -> component min).
    # Isolated original nodes (self-loop-only inputs) label themselves.
    out = (
        nodes.join(cur, nodes["node"] == cur["hi"], "left")
        .select(
            "node", F.coalesce(F.col("lo"), F.col("node")).alias("component")
        )
    )
    return out


def jaccard_prefix_filter_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    threshold_pct: int = 60,
) -> DataFrame:
    """COMPLETE set-similarity self-join via prefix filtering (AllPairs
    / SSJoin: Bayardo, Ma & Srikant, WWW'07; Chaudhuri, Ganti &
    Kaushik, ICDE'06) over distinct word-shingle sets.

    Unlike `ngram_jaccard_pairs` (whose doc-frequency cap trades
    completeness for a bounded join), prefix filtering is LOSSLESS for
    a fixed threshold t: order every doc's shingles by a corpus-wide
    total order (document frequency asc, shingle asc — rarest first),
    keep only the first  p = s - ceil(t*s) + 1  shingles as the doc's
    "prefix", and join docs on shared PREFIX shingles. Any pair with
    Jaccard >= t must share at least one prefix shingle (pigeonhole on
    the ordered sets), so candidate generation misses nothing; a size
    filter (t * s_max <= s_min is necessary for J >= t) prunes further
    before verification.

    100 TB shape: the candidate join touches only prefix shingles,
    which are each doc's RAREST — so hot boilerplate shingles never
    enter the join (the algorithm's own skew guard, replacing the df
    cap). Verification joins full shingle sets ONLY for surviving
    candidate pairs: cost |cand| x avg set size, shuffled on
    (id, shingle). All arithmetic is integer (threshold as a percent,
    cross-multiplied), so the DuckDB twin is bit-exact.
    """
    t = threshold_pct
    # hash shingles to 60-bit md5-derived BIGINTs BEFORE any shuffle
    # (same trick and same rationale as ngram_jaccard_pairs above:
    # 8-byte shuffle keys, not multi-word strings; the oracle applies
    # the identical hash so results stay bit-equal). The prefix
    # theorem needs only SOME corpus-wide total order on tokens —
    # (df asc, hash asc) is one — so ordering by the hash instead of
    # the string loses nothing.
    sh = fan_out_scan(df.select(id_col, text_col)).select(
        id_col, F.explode(F.array_distinct(shingles(text_col, shingle_n))).alias("sh0")
    ).select(
        id_col,
        F.conv(F.substring(F.md5("sh0"), 1, 15), 16, 10).cast("long").alias("sh"),
    )
    # referenced by df-counts, prefix ranking, and verification: one
    # tracked persist (released between queries by _cache)
    sh = track_persist(sh)
    dfreq = sh.groupBy("sh").agg(F.count("*").alias("df"))
    # rarest-first rank WITHIN each doc; set size from the SAME
    # per-doc exchange (count over the id partition — no sizes join)
    w = Window.partitionBy(id_col).orderBy(F.col("df").asc(), F.col("sh").asc())
    w_all = Window.partitionBy(id_col)
    ordered = (
        sh.join(dfreq, "sh")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("s", F.count("*").over(w_all).cast("long"))
    )
    # prefix length p = s - ceil(t*s/100) + 1, integer ceil for s > 0
    pref = ordered.filter(
        F.col("rn") <= F.col("s") - ((F.col("s") * t + 99) / 100).cast("long") + 1
    ).select(id_col, "sh", "s")
    a = pref.select(
        F.col(id_col).alias("id_a"), F.col("sh").alias("sh"), F.col("s").alias("s_a")
    )
    b = pref.select(
        F.col(id_col).alias("id_b"), F.col("sh").alias("sh"), F.col("s").alias("s_b")
    )
    cand = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        # size filter: J >= t  =>  100 * min(s) >= t * max(s)
        .filter(
            F.lit(100) * F.least("s_a", "s_b") >= F.lit(t) * F.greatest("s_a", "s_b")
        )
        .select("id_a", "id_b", "s_a", "s_b")
        .distinct()
    )
    # verification: exact |A ∩ B| for candidates only
    sh_a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh"))
    sh_b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh"))
    inter = (
        cand.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "sh"])
        .groupBy("id_a", "id_b", "s_a", "s_b")
        .agg(F.count("*").cast("long").alias("inter_sh"))
    )
    return (
        inter.withColumn("union_sh", F.col("s_a") + F.col("s_b") - F.col("inter_sh"))
        .filter(F.lit(100) * F.col("inter_sh") >= F.lit(t) * F.col("union_sh"))
        .select(
            "id_a",
            "id_b",
            "inter_sh",
            "union_sh",
            (F.col("inter_sh").cast("double") / F.col("union_sh")).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Standing MinHash band index: build / merge / probe (VERDICT r9 #5a).
# The near-dup twin of textops.bloom_decontaminate_incremental --
# corpora arrive in batches, and absorbing a batch into the standing
# index must cost O(|batch|), never a corpus re-shingle.
# ---------------------------------------------------------------------------


def minhash_band_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    fanout: bool = True,
) -> DataFrame:
    """The persisted artifact of an incremental near-dup pipeline:
    band buckets PRE-AGGREGATED to one row per (band, key) carrying
    mergeable summaries -- (n_index_docs, first_match_id) = (count,
    min doc id). Unlike the pair-enumeration path this never holds a
    doc list per bucket, so a hot boilerplate key stays one row and
    probe fanout is bounded by construction (the shape
    queries_llm6.dedup_incremental_minhash established; this factors
    it into a reusable build/merge/probe triple).

    100 TB shape: one shuffle on (band, key) with map-side partial
    aggregation; the result is exactly what a daily pipeline persists
    (bucketed by `key`) between runs.
    """
    buckets = minhash_lsh_buckets(
        df, text_col, id_col, k, bands, shingle_n, fanout=fanout
    )
    return buckets.groupBy("band", "key").agg(
        F.count("*").cast("long").alias("n_index_docs"),
        F.min(id_col).cast("long").alias("first_match_id"),
    )


def merge_minhash_band_indexes(*indexes: DataFrame) -> DataFrame:
    """REFRESH the standing index with one or more batch indexes:
    union + re-aggregate. count/min are commutative monoids, so
    merge(index(A), index(B)) == index(A ∪ B) exactly (pinned in
    tests/test_r10_properties.py) -- the refresh touches only the
    index rows, never the corpus text. At scale both sides are
    already hash-partitioned on (band, key) from their own builds, so
    AQE plans this as a co-partitioned merge; worst case it is one
    shuffle of |index| + |batch| SUMMARY rows (thousands of bytes per
    billion docs of text scanned -- the entire point of the refresh
    path)."""
    assert indexes, "need at least one index"
    merged = indexes[0]
    for nxt in indexes[1:]:
        merged = merged.unionByName(nxt)
    return merged.groupBy("band", "key").agg(
        F.sum("n_index_docs").cast("long").alias("n_index_docs"),
        F.min("first_match_id").cast("long").alias("first_match_id"),
    )


def probe_minhash_band_index(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Which NEW docs collide with the standing index, and where: one
    row per colliding doc -- (id, hit_bands, n_index_docs,
    first_match_id). The join output is <= bands x |new docs| rows
    regardless of index skew (the index side is one row per key), so
    no bucket cap is needed."""
    bandkeys = minhash_lsh_buckets(new_docs, text_col, id_col, k, bands, shingle_n)
    hits = bandkeys.join(index, ["band", "key"])
    return hits.groupBy(id_col).agg(
        F.count("*").cast("long").alias("hit_bands"),
        F.sum("n_index_docs").cast("long").alias("n_index_docs"),
        F.min("first_match_id").cast("long").alias("first_match_id"),
    )


def merge_components(
    base_assign: DataFrame,
    delta_edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """INCREMENTAL connected components: refresh a standing component
    assignment with a batch of new edges WITHOUT re-running CC over
    the full graph -- the clustering twin of
    merge_minhash_band_indexes (indexes arrive in batches; so do the
    near-dup edges they imply).

    `base_assign` is a prior connected_components() output
    (node, component) with min-id labels; `delta_edges` is the new
    pair batch (may touch base nodes, brand-new nodes, or bridge two
    existing components -- the r8 over-merge class this operator must
    get exactly right). Exactness argument: map each delta endpoint
    through the base assignment (identity for unseen nodes) and run
    CC on that REDUCED graph, whose nodes are base component labels
    and new node ids. Merged components of the full graph correspond
    1:1 to components of the reduced graph, and because a base label
    is the min id of its base component, the reduced min-label is the
    global min id -- so relabeling base rows through the reduced
    result reproduces connected_components(base ∪ delta) exactly
    (pinned in tests/test_r10b_properties.py, and at the query level
    dedup_cluster_incremental shares dedup_cluster_assign's
    recursive-CTE rebuild oracle: merge == rebuild).

    Scale: the reduced graph has <= |delta| edges over (touched
    components ∪ new nodes) -- a daily refresh costs CC on the DELTA,
    not the corpus. The relabel is one join keyed on component;
    untouched assignments stream through unchanged. The standing
    assignment is the persisted artifact between runs (bucket it by
    `node` and the probe/relabel joins co-locate).
    """
    m = base_assign.select("node", "component")
    e = delta_edges.select(F.col(src).alias("__u"), F.col(dst).alias("__v"))
    mu = m.select(F.col("node").alias("__u"), F.col("component").alias("__cu"))
    mv = m.select(F.col("node").alias("__v"), F.col("component").alias("__cv"))
    reduced = (
        e.join(mu, "__u", "left")
        .join(mv, "__v", "left")
        .select(
            F.coalesce("__cu", F.col("__u")).alias("s"),
            F.coalesce("__cv", F.col("__v")).alias("d"),
        )
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )
    cc2 = connected_components(reduced, "s", "d")
    lab = cc2.select(
        F.col("node").alias("__old"), F.col("component").alias("__new")
    )
    relabeled = (
        base_assign.join(lab, base_assign["component"] == lab["__old"], "left")
        .select(
            "node",
            F.coalesce("__new", F.col("component")).alias("component"),
        )
    )
    # reduced-graph nodes that are NOT base nodes are the genuinely
    # new ones (a base component LABEL is itself a base node, so the
    # anti-join keeps exactly the new ids)
    new_nodes = cc2.join(m.select("node"), "node", "left_anti").select(
        "node", "component"
    )
    return relabeled.unionByName(new_nodes)
