"""Sequence packing, domain caps, mixture resampling, bloom
decontamination: value-level properties beyond the DuckDB oracles
(which pin exact outputs at sf0.001/sf0.01 via tools/oracle_check)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_building_inspector_spark.operators.packing import (
    pack_concat_chunks,
    pack_greedy,
)
from etl_building_inspector_spark.operators.textops import (
    bloom_decontaminate,
    decontaminate_ngrams,
    domain_cap,
)
from etl_building_inspector_spark.sources.tables import load_table


def test_concat_chunks_matches_global_window(spark, sf_dir):
    """The sharded distributed prefix sum must equal the semantic
    single-window formulation for EVERY shard span (including spans
    that split mid-corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    from etl_building_inspector_spark.functions.text import token_count

    ref = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        token_count("text").cast("long").alias("n_tokens"),
    ).withColumn(
        "start_offset",
        F.coalesce(
            F.sum("n_tokens").over(
                Window.orderBy("doc_id").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("doc_id", "start_offset")
    for span in (7, 64, 10**6):
        got = pack_concat_chunks(docs, "text", "doc_id", 256, span).select(
            "doc_id", "start_offset"
        )
        assert got.exceptAll(ref).count() == 0
        assert ref.exceptAll(got).count() == 0


def test_concat_chunks_span_consistency(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = pack_concat_chunks(docs, "text", "doc_id", 100, 64)
    bad = out.filter(
        (F.col("chunk_first") != F.floor(F.col("start_offset") / 100))
        | (F.col("chunk_last") < F.col("chunk_first"))
        | (F.col("offset_in_chunk") != F.col("start_offset") % 100)
    )
    assert bad.count() == 0


def test_greedy_bins_respect_budget(spark, sf_dir):
    """No bin exceeds the budget unless it holds exactly one oversize
    doc; bin ids are dense per group."""
    docs = load_table(spark, sf_dir, "documents")
    out = pack_greedy(docs, "text", "doc_id", "source", budget=256)
    per_bin = out.groupBy("grp", "bin").agg(
        F.sum("n_tokens").alias("tot"), F.count("*").alias("n")
    )
    overfull_multi = per_bin.filter((F.col("tot") > 256) & (F.col("n") > 1))
    assert overfull_multi.count() == 0
    # dense bins: max(bin) + 1 == distinct bin count per group
    dense = out.groupBy("grp").agg(
        (F.max("bin") + 1).alias("want"),
        F.countDistinct("bin").alias("got"),
    )
    assert dense.filter(F.col("want") != F.col("got")).count() == 0
    # every doc packed exactly once
    assert out.count() == docs.count()


def test_bloom_equals_exact_decontamination(spark, sf_dir):
    """The bloom prefilter + confirm join must be invisible in the
    result: bit-for-bit equal to the pure broadcast-join operator."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    train = docs.filter(F.col("doc_id") % 17 != 0)
    a = decontaminate_ngrams(train, bench, "text", "doc_id", n=4)
    b = bloom_decontaminate(train, bench, "text", "doc_id", n=4)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_domain_cap_bounds(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = domain_cap(docs, "source", "doc_id", cap=10)
    kept_per = out.filter("kept").groupBy("source").count()
    assert kept_per.filter(F.col("count") > 10).count() == 0
    # cap keeps exactly min(cap, domain size)
    sizes = docs.groupBy("source").count().withColumnRenamed("count", "n")
    j = kept_per.withColumnRenamed("count", "k").join(sizes, "source")
    assert j.filter(
        F.col("k") != F.least(F.lit(10), F.col("n"))
    ).count() == 0


def test_mixture_resample_rates(spark):
    """The most underrepresented lang (vs target) keeps rate 1.0;
    rates are in (0, 1]; kept is a deterministic function of doc_id."""
    from etl_building_inspector_spark.plans.queries_llm3 import (
        mixture_resample,
    )

    out = mixture_resample(spark, "/root/testdata/sf0.001")
    rates = out.select("lang", "rate").distinct()
    mx = rates.agg(F.max("rate")).first()[0]
    assert mx == 1.0
    assert rates.filter((F.col("rate") <= 0) | (F.col("rate") > 1)).count() == 0
    a = {(r.doc_id, r.kept) for r in out.select("doc_id", "kept").collect()}
    b = {(r.doc_id, r.kept) for r in out.select("doc_id", "kept").collect()}
    assert a == b
