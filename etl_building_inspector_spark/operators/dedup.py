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


def _minhash_col(sh: Column, seed: int) -> Column:
    """One md5-based minhash: min over shingles of md5('{seed}:'||s).
    Engine-portable (DuckDB md5 is identical); NULL when no shingles."""
    return F.array_min(
        F.transform(sh, lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s)))
    )


def minhash_signature(
    df: DataFrame, text_col: str, k: int = 8, shingle_n: int = 3
) -> DataFrame:
    """Append minhash_0..minhash_{k-1} columns. All JVM-native
    (md5/transform/array_min fuse into one codegen stage); one pass,
    no shuffle."""
    sh = shingles(text_col, shingle_n)
    out = df
    for i in range(k):
        out = out.withColumn(f"minhash_{i}", _minhash_col(sh, i))
    return out


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH.

    Plan shape (the 100 TB path):
      1. signature: narrow, no shuffle.
      2. band keys: explode k/bands-row concatenated hashes -> (band,
         key, id). One row per doc per band.
      3. self-equi-join on (band, key) with id_a < id_b: a shuffle
         hash join on the band key -- candidates only ever co-locate
         within a bucket, so the join never goes quadratic unless a
         bucket is hot (identical boilerplate docs). At scale, cap
         bucket width by salting or dropping buckets with
         count > threshold (boilerplate filter), which is also what
         you want semantically.
      4. distinct pairs.
    """
    rows_per_band = k // bands
    sig = minhash_signature(df.select(id_col, text_col), text_col, k, shingle_n)
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
    buckets = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
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
    t = tokens(text_col)

    def _h(tok: Column) -> Column:
        # first 8 hex chars of md5 -> unsigned 32-bit int; conv() is
        # JVM-native and engine-portable (DuckDB: cast('0x'||hex)).
        return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")

    def _merge_for(b: int):
        # pyspark introspects lambda arity; aggregate's merge must take
        # exactly (acc, x), so bind b via closure factory.
        def merge(acc: Column, tok: Column) -> Column:
            bit_set = F.shiftright(_h(tok), b).bitwiseAND(F.lit(1)) == 1
            return acc + F.when(bit_set, 1).otherwise(-1)

        return merge

    bit_cols = []
    for b in range(bits):
        vote = F.aggregate(t, F.lit(0).cast("long"), _merge_for(b))
        bit_cols.append(
            F.when(vote > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    total = bit_cols[0]
    for c in bit_cols[1:]:
        total = total + c
    return df.withColumn("simhash", total)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs that share at
    least one shingle.

    Plan: explode distinct shingles -> self-join on shingle (shuffle
    co-locates docs sharing a shingle) -> count shared shingles per
    pair -> |A∩B| / (|A|+|B|-|A∩B|). At 100 TB the shared-shingle join
    is the bottleneck on stop-shingle hot keys; drop shingles with
    document-frequency > cap first (same boilerplate argument as LSH).
    """
    sh = (
        df.select(id_col, F.explode(F.array_distinct(shingles(text_col, shingle_n))).alias("sh"))
    )
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
