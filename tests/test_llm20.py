"""Property tests for the coverage/fertility/geometry batch
(queries_llm20) and the twelfth analytics batch (queries_surface12):
coverage bounds vs raw recounts, census conservation, fertility
bounds, histogram completeness vs the sampled pair set, shift-decay
identities, and MV base+delta conservation."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_ngram_coverage_bounds_and_recount(spark):
    """covered <= heldout; ppm arithmetic exact; covered equals a
    Python recount over the same md5 split."""
    import pyspark.sql.functions as F

    from etl_building_inspector_spark.functions.text import shingles
    from etl_building_inspector_spark.operators.sampling import (
        sample_hash_u32,
    )
    from etl_building_inspector_spark.plans.queries_llm20 import (
        text_ngram_coverage_vs_reference,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    r = text_ngram_coverage_vs_reference(spark, SF).collect()[0]
    assert 0 <= r.covered_ngrams <= r.heldout_ngrams
    assert r.coverage_ppm == r.covered_ngrams * 1_000_000 // r.heldout_ngrams
    docs = load_table(spark, SF, "documents").select(
        (sample_hash_u32("doc_id", "split") % 100 < 80).alias("is_train"),
        shingles("text", 3).alias("sh"),
    )
    tr, te = set(), set()
    for row in docs.collect():
        (tr if row.is_train else te).update(row.sh)
    assert r.heldout_ngrams == len(te)
    assert r.covered_ngrams == len(te & tr)


def test_group_size_census_conserves_docs(spark):
    """sum(n_docs) over the census equals the fixture's doc count;
    n_docs == group_size * n_groups on every row; the planted dups
    produce at least one size-2 row."""
    from etl_building_inspector_spark.plans.queries_llm import (
        _docs_with_dups,
    )
    from etl_building_inspector_spark.plans.queries_llm20 import (
        dedup_group_size_histogram,
    )

    rows = dedup_group_size_histogram(spark, SF).collect()
    assert sum(r.n_docs for r in rows) == _docs_with_dups(spark, SF).count()
    for r in rows:
        assert r.n_docs == r.group_size * r.n_groups
    assert any(r.group_size >= 2 for r in rows)


def test_fertility_bounds(spark):
    """Fertility is >= ~0.25e6 (a letter run shorter than 4 chars is
    still one token... 1 word >= 1 token once pieces exist) and the
    totals match text_bpe_token_estimate's per-doc sums."""
    import pyspark.sql.functions as F

    from etl_building_inspector_spark.plans.queries_llm3 import (
        text_bpe_token_estimate,
    )
    from etl_building_inspector_spark.plans.queries_llm20 import (
        text_tokenizer_fertility_by_lang,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    rows = text_tokenizer_fertility_by_lang(spark, SF).collect()
    per_doc = text_bpe_token_estimate(spark, SF)
    docs = load_table(spark, SF, "documents").select("doc_id", "lang")
    joined = per_doc.join(docs, "doc_id").groupBy("lang").agg(
        F.sum("bpe_tokens").alias("bpe"), F.sum("ws_tokens").alias("ws")
    )
    ref = {r.lang: (r.bpe, r.ws) for r in joined.collect()}
    assert {r.lang for r in rows} == set(ref)
    for r in rows:
        bpe, ws = ref[r.lang]
        assert (r.bpe_tokens, r.ws_words) == (bpe, ws)
        assert r.fertility_ppm == bpe * 1_000_000 // ws


def test_cosine_histogram_counts_sampled_pairs(spark):
    """Bucket counts total exactly the deterministic pair-sample size,
    and every bucket id is a legal floor(cos*10) clamp."""
    from etl_building_inspector_spark.plans.queries_llm20 import (
        COSINE_HIST_MOD,
        emb_cosine_histogram_sampled,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    rows = emb_cosine_histogram_sampled(spark, SF).collect()
    ids = [
        r.vec_id
        for r in load_table(spark, SF, "embeddings").select("vec_id").collect()
    ]
    expected_pairs = sum(
        1
        for a in ids
        if a % COSINE_HIST_MOD == 0
        for b in ids
        if a < b and (a + b) % COSINE_HIST_MOD == 0
    )
    assert sum(r.n_pairs for r in rows) == expected_pairs
    assert all(-10 <= r.bucket <= 9 for r in rows)


def test_decayed_value_identities(spark):
    """decayed <= raw always; an order on the as-of day contributes
    full value; recount a few customers in Python."""
    from etl_building_inspector_spark.plans.queries_surface12 import (
        customer_decayed_value_fixedpoint,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    orders = load_table(spark, SF, "orders").collect()
    today = max(r.o_orderdate.date() for r in orders)
    expect: dict = {}
    for r in orders:
        cents = int(round(r.o_totalprice * 100))
        age = (today - r.o_orderdate.date()).days
        halv = min(age // 30, 62)
        n, raw, dec = expect.get(r.o_custkey, (0, 0, 0))
        expect[r.o_custkey] = (n + 1, raw + cents, dec + (cents >> halv))
    rows = customer_decayed_value_fixedpoint(spark, SF).collect()
    assert len(rows) == len(expect)
    for r in rows:
        n, raw, dec = expect[r.custkey]
        assert (r.n_orders, r.raw_cents, r.decayed_cents) == (n, raw, dec)
        assert r.decayed_cents <= r.raw_cents


def test_mv_distinct_base_plus_delta(spark):
    """base + delta == total on every row, and the total matches a
    direct count-distinct per type."""
    import pyspark.sql.functions as F

    from etl_building_inspector_spark.plans.queries_surface12 import (
        mv_distinct_delta_maintenance,
    )
    from etl_building_inspector_spark.sources.tables import load_table

    rows = mv_distinct_delta_maintenance(spark, SF).collect()
    ev = load_table(spark, SF, "events")
    direct = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in rows:
        assert r.base_distinct_users + r.delta_new_users == r.mv_distinct_users
        assert r.mv_distinct_users == direct[r.event_type]
        assert r.delta_new_users >= 0


def test_s_curve_design_exact(spark):
    """The S-curve matches a Python recount of 1-(1-s^r)^b in exact
    rational arithmetic, and b4r2 dominates b2r4 at low similarity
    (the aggressive-vs-conservative design fact)."""
    from etl_building_inspector_spark.plans.queries_llm21 import (
        dedup_lsh_s_curve_design,
    )

    rows = sorted(
        dedup_lsh_s_curve_design(spark, SF).collect(),
        key=lambda r: r.s_tenths,
    )
    assert [r.s_tenths for r in rows] == list(range(1, 10))
    for r in rows:
        t = r.s_tenths
        assert r.band_match_ppm_b4r2 == t * t * 10000
        assert r.p_candidate_ppm_b4r2 == (10**8 - (100 - t * t) ** 4) // 100
        assert (
            r.p_candidate_ppm_b2r4
            == (10**8 - (10**4 - t**4) ** 2) // 100
        )
        assert r.p_candidate_ppm_b4r2 >= r.p_candidate_ppm_b2r4


def test_stopword_matrix_exposes_fixture_labels(spark):
    """The matrix is the measurement, and on THIS fixture it exposes
    that lang labels are decorative: the text is English-vocabulary
    for every label, so the 'en' stopset column dominates every row
    and all other columns are zero. Also: totals conserved across
    stopsets and the ppm arithmetic is exact."""
    from etl_building_inspector_spark.plans.queries_llm21 import (
        text_stopword_signal_matrix,
    )

    rows = text_stopword_signal_matrix(spark, SF).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_lang, {})[r.stopset_lang] = r
        assert r.hit_ppm == r.stop_hits * 1_000_000 // r.n_tokens
    assert set(by_doc) == {"en", "es", "de", "fr", "zh"}
    for lang, row in by_doc.items():
        assert len(row) == 5
        assert row["en"].hit_ppm == max(r.hit_ppm for r in row.values())
        assert row["en"].hit_ppm > 0
        assert all(
            r.hit_ppm == 0 for k, r in row.items() if k != "en"
        )
        toks = {r.n_tokens for r in row.values()}
        docs = {r.n_docs for r in row.values()}
        assert len(toks) == 1 and len(docs) == 1


def test_blocking_strategy_eval_story(spark):
    """The designed fact, measured: the transposition typo defeats
    exact-token and prefix2 blocking (recall 0) while the phonetic key
    recovers most planted pairs; workload arithmetic recounted."""
    from etl_building_inspector_spark.plans.queries_llm21 import (
        er_blocking_strategy_eval,
    )

    rows = {r.strategy: r for r in er_blocking_strategy_eval(spark, SF).collect()}
    assert set(rows) == {"exact_token", "phonetic", "prefix2"}
    truths = {r.n_truth for r in rows.values()}
    assert len(truths) == 1 and truths.pop() > 0
    assert rows["exact_token"].n_found == 0
    assert rows["prefix2"].n_found == 0
    ph = rows["phonetic"]
    assert ph.n_found * 2 > ph.n_truth  # majority recovered
    for r in rows.values():
        assert r.recall_ppm == r.n_found * 1_000_000 // r.n_truth
        assert r.n_candidate_pairs >= 0
