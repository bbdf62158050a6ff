"""Independent property tests for the reference-parity core queries
(round 7, beyond the VERDICT directives: extend the r6/r7 recompute
layer BACKWARDS to the r1/r2-era parity set, which until now was
pinned only by the DuckDB twin + driver hash rows).

Same discipline as tests/test_r6_properties.py: each test recomputes
the CLAIMED PROPERTY from the raw parquet with plain pandas/numpy/
hashlib -- no Spark expressions, no DuckDB SQL -- so a conceptual
mistake shared by both twins cannot hide. The Spark query under test
is executed once through the registry (the driver's path) and its
output compared against the recompute.

Covers SURVEY.md section 2 rows J1, J2, F4, D1, D2, P3-P8, P10, E1-E3,
F2 (reference spans cited per-test from building-inspector.js).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from etl_building_inspector_spark.plans.registry import QUERIES

from tests.recompute_util import SF  # env-overridable scale


def _run(spark, name):
    return QUERIES[name](spark, SF).toPandas()


def _read(table):
    return pd.read_parquet(f"{SF}/{table}.parquet")


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _frames_equal(got: pd.DataFrame, want: pd.DataFrame):
    """Order-free exact comparison: align columns by name, sort both
    frames by every column (NaN/None mapped to a sentinel so sorting
    and equality are well-defined), compare cell-by-cell."""
    assert sorted(got.columns) == sorted(want.columns), (
        f"columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    cols = sorted(got.columns)

    def norm(df):
        out = df[cols].copy()
        for c in cols:
            s = out[c]
            if s.dtype == object or str(s.dtype).startswith("datetime"):
                out[c] = s.astype(object).where(pd.notna(s), "\x00<NULL>")
                out[c] = out[c].astype(str)
            elif np.issubdtype(s.dtype, np.floating):
                # exact IEEE compare via repr; NaN -> sentinel
                out[c] = s.map(lambda v: "\x00<NULL>" if pd.isna(v) else repr(float(v)))
            else:
                out[c] = s.astype("int64")
        return out.sort_values(cols).reset_index(drop=True)

    g, w = norm(got), norm(want)
    for c in cols:
        eq = g[c].to_numpy() == w[c].to_numpy()
        assert eq.all(), (
            f"column {c} diverges at sorted-row {int(np.argmin(eq))}: "
            f"got={g[c][~eq].iloc[0]!r} want={w[c][~eq].iloc[0]!r}"
        )


# ---------------------------------------------------------------------------
# J1: inner broadcast lookup join (building-inspector.js:103-105)
# ---------------------------------------------------------------------------


def test_j1_broadcast_inner_join_matches_pandas_merges(spark):
    got = _run(spark, "j1_broadcast_inner_join")
    orders, cust, nation = _read("orders"), _read("customer"), _read("nation")
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey").merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    )
    want = pd.DataFrame(
        {
            "order_key": j["o_orderkey"].astype("int64"),
            "customer_name": j["c_name"],
            "nation_name": j["n_name"],
        }
    )
    _frames_equal(got, want)


def test_j1_integrity_anti_join_is_exact_set_complement(spark):
    """The anti-join's output keys are EXACTLY the orders whose custkey
    is absent from the rich-customer key set -- recomputed with a
    python set, plus the conservation law: kept + dropped == total."""
    got = _run(spark, "j1_integrity_anti_join")
    orders, cust = _read("orders"), _read("customer")
    rich = set(cust.loc[cust["c_acctbal"] > 1000, "c_custkey"])
    missing = orders[~orders["o_custkey"].isin(rich)]
    want = pd.DataFrame({"order_key": missing["o_orderkey"].astype("int64")})
    _frames_equal(got, want)
    assert len(got) + orders["o_custkey"].isin(rich).sum() == len(orders)


# ---------------------------------------------------------------------------
# J2 + F4: left join survives NULL enrich; one log line per miss
# (building-inspector.js:106, :129-136)
# ---------------------------------------------------------------------------


def test_j2_left_join_preserves_every_order_and_nulls_misses(spark):
    got = _run(spark, "j2_left_join_null")
    orders, cust = _read("orders"), _read("customer")
    dim = cust[cust["c_acctbal"] > 5000]
    j = orders.merge(
        dim, left_on="o_custkey", right_on="c_custkey", how="left"
    )
    want = pd.DataFrame(
        {
            "order_key": j["o_orderkey"].astype("int64"),
            "customer_name": j["c_name"],
            "segment": j["c_mktsegment"],
        }
    )
    _frames_equal(got, want)
    # left-join law: cardinality preserved (dim key is unique)
    assert len(got) == len(orders)


def test_f4_log_lines_are_exactly_the_join_misses(spark):
    got = _run(spark, "f4_missing_dim_log")
    orders, cust = _read("orders"), _read("customer")
    dim_keys = set(cust.loc[cust["c_acctbal"] > 5000, "c_custkey"])
    miss = orders[~orders["o_custkey"].isin(dim_keys)]
    want = pd.DataFrame(
        {
            "error": "Can't find customer for order "
            + miss["o_orderkey"].astype(str)
        }
    )
    _frames_equal(got, want)


# ---------------------------------------------------------------------------
# D1: keep-first dedup with deterministic order (building-inspector.js:
# 92, :97-100)
# ---------------------------------------------------------------------------


def test_d1_keep_first_keeps_lowest_copy_per_key(spark):
    got = _run(spark, "d1_keep_first_dedup")
    orders = _read("orders")
    first = orders[["o_orderkey", "o_totalprice"]].assign(copy=0)
    dups = orders.loc[orders["o_orderkey"] % 3 == 0, ["o_orderkey"]].assign(
        o_totalprice=orders.loc[orders["o_orderkey"] % 3 == 0, "o_totalprice"]
        * 2,
        copy=1,
    )
    stream = pd.concat([first, dups], ignore_index=True)
    kept = (
        stream.sort_values(["o_orderkey", "copy"], kind="mergesort")
        .groupby("o_orderkey", as_index=False)
        .first()
    )
    want = pd.DataFrame(
        {
            "order_key": kept["o_orderkey"].astype("int64"),
            "total_price": kept["o_totalprice"],
            "copy": kept["copy"].astype("int64"),
        }
    )
    _frames_equal(got, want)
    # keep-first law: with a copy-0 row for EVERY key, no copy-1 survives
    assert (got["copy"] == 0).all()
    assert len(got) == orders["o_orderkey"].nunique()


# ---------------------------------------------------------------------------
# D2: content-hash dedup (building-inspector.js:204-214)
# ---------------------------------------------------------------------------


def test_d2_content_hash_groups_match_python_md5(spark):
    got = _run(spark, "d2_content_hash_dedup")
    part = _read("part")
    key = (part["p_type"] + "," + part["p_brand"]).map(_md5)
    g = part.assign(content_key=key).groupby("content_key")
    want = pd.DataFrame(
        {
            "content_key": g.size().index,
            "part_key": g["p_partkey"].min().astype("int64").to_numpy(),
            "dup_count": g.size().astype("int64").to_numpy(),
        }
    )
    _frames_equal(got, want)
    # conservation: dup counts cover every part row exactly once
    assert got["dup_count"].sum() == len(part)


# ---------------------------------------------------------------------------
# P3-P6, P10: scalar transform battery (building-inspector.js:102-120,
# :144, :190)
# ---------------------------------------------------------------------------


def test_p_scalar_transforms_rebuilt_per_row_in_python(spark):
    got = _run(spark, "p_scalar_transforms")
    part = _read("part")

    rows = []
    for r in part.itertuples(index=False):
        brand_bits = r.p_brand.split("#")
        type_words = r.p_type.split(" ")
        rows.append(
            {
                "part_key": int(r.p_partkey),
                "brand_num": int(brand_bits[1]),
                "type_head": type_words[0],
                "type_tail": type_words[2] if len(type_words) >= 3 else None,
                "name_words": len(r.p_name.split(" ")),
                "synth_id": f"mapwarper/{r.p_partkey}",
                "pos_id": f"part-{r.p_partkey}-{r.p_size}",
                "size_flag": f"big:{r.p_brand}" if r.p_size > 25 else None,
                "content_md5": _md5(f"{r.p_name},{r.p_brand}"),
                "record_type": "st:Part",
            }
        )
    want = pd.DataFrame(rows)
    want["name_words"] = want["name_words"].astype("int64")
    _frames_equal(got, want)


# ---------------------------------------------------------------------------
# P8: array element extraction with NULL out-of-bounds
# (building-inspector.js:123, :162)
# ---------------------------------------------------------------------------


def test_p8_element_at_matches_numpy_indexing(spark):
    got = _run(spark, "p8_element_at").sort_values("vec_id")
    emb = _read("embeddings").sort_values("vec_id")
    vecs = [np.asarray(v, dtype="float64") for v in emb["embedding"]]
    dims = np.array([len(v) for v in vecs])
    assert (dims == 64).all(), "fixture contract: 64-dim embeddings"
    want = pd.DataFrame(
        {
            "vec_id": emb["vec_id"].astype("int64").to_numpy(),
            "first_dim": [float(v[0]) for v in vecs],
            "last_dim": [float(v[63]) for v in vecs],
            "oob_dim": [None] * len(vecs),  # index 99 > 64 -> NULL, no error
            "dim": dims.astype("int64"),
        }
    )
    want["oob_dim"] = want["oob_dim"].astype("float64")
    _frames_equal(got, want)
    assert got["oob_dim"].isna().all()


# ---------------------------------------------------------------------------
# E1 + J4: positional explode with cross-array alignment
# (building-inspector.js:143-162: address i <-> geometries[i+1])
# ---------------------------------------------------------------------------


def test_e1_posexplode_alignment_rebuilt_per_row(spark):
    got = _run(spark, "e1_posexplode_align")
    part = _read("part")
    rows = []
    for r in part.itertuples(index=False):
        words = r.p_name.split(" ")
        types = r.p_type.split(" ")
        for pos, word in enumerate(words):
            rows.append(
                {
                    "part_key": int(r.p_partkey),
                    "pos": pos,
                    "word": word,
                    "addr_id": f"{r.p_partkey}-{pos + 1}",
                    "aligned_type": types[pos] if pos < len(types) else None,
                }
            )
    want = pd.DataFrame(rows)
    want["pos"] = want["pos"].astype("int64")
    _frames_equal(got, want)
    # fan-out conservation: one output row per word
    assert len(got) == sum(len(r.p_name.split(" ")) for r in part.itertuples())


# ---------------------------------------------------------------------------
# E2: constant fan-out x2 (mapwarperRelations, building-inspector.js:
# 183-202)
# ---------------------------------------------------------------------------


def test_e2_relation_fanout_emits_exactly_two_rows_per_order(spark):
    got = _run(spark, "e2_relation_fanout")
    orders = _read("orders")
    a = pd.DataFrame(
        {
            "rel_from": "order/" + orders["o_orderkey"].astype(str),
            "rel_to": "mapwarper/" + orders["o_custkey"].astype(str),
            "rel_type": "st:in",
        }
    )
    b = pd.DataFrame(
        {
            "rel_from": "order/" + orders["o_orderkey"].astype(str),
            "rel_to": "mapwarper/layer-"
            + orders["o_orderdate"].dt.year.astype(str),
            "rel_type": "st:in",
        }
    )
    want = pd.concat([a, b], ignore_index=True)
    _frames_equal(got, want)
    assert len(got) == 2 * len(orders)
    assert (got.groupby("rel_from").size() >= 2).all()


# ---------------------------------------------------------------------------
# E3: heterogeneous record union with discriminator
# (building-inspector.js:315-318)
# ---------------------------------------------------------------------------


def test_e3_union_preserves_each_stream_verbatim(spark):
    got = _run(spark, "e3_union_records")
    cust, orders = _read("customer"), _read("orders")
    objects = pd.DataFrame(
        {
            "record_type": "object",
            "id": "customer/" + cust["c_custkey"].astype(str),
            "name": cust["c_name"],
            "rel_from": None,
            "rel_to": None,
            "error": None,
        }
    )
    relations = pd.DataFrame(
        {
            "record_type": "relation",
            "id": None,
            "name": None,
            "rel_from": "order/" + orders["o_orderkey"].astype(str),
            "rel_to": "customer/" + orders["o_custkey"].astype(str),
            "error": None,
        }
    )
    neg = cust[cust["c_acctbal"] < 0]
    logs = pd.DataFrame(
        {
            "record_type": "log",
            "id": None,
            "name": None,
            "rel_from": None,
            "rel_to": None,
            "error": "negative balance for customer "
            + neg["c_custkey"].astype(str),
        }
    )
    want = pd.concat([objects, relations, logs], ignore_index=True)
    _frames_equal(got, want)
    # stream cardinalities survive the union unchanged
    counts = got["record_type"].value_counts()
    assert counts["object"] == len(cust)
    assert counts["relation"] == len(orders)
    assert counts["log"] == len(neg)


# ---------------------------------------------------------------------------
# F2: degenerate-shape filter BEFORE fan-out (building-inspector.js:
# 138-140). Splitting on a single space keeps empty segments -- the
# python twin must use split(" "), not split().
# ---------------------------------------------------------------------------


def test_f2_degenerate_filter_word_gate(spark):
    got = _run(spark, "f2_degenerate_filter")
    docs = _read("documents")
    n_words = docs["text"].map(lambda t: len(t.split(" ")))
    keep = docs[n_words >= 40]
    want = pd.DataFrame(
        {
            "doc_id": keep["doc_id"].astype("int64"),
            "n_words": n_words[n_words >= 40].astype("int64"),
        }
    )
    _frames_equal(got, want)
    # the gate is a partition of the table
    assert len(got) + (n_words < 40).sum() == len(docs)
