"""Local replica of the driver's correctness gate: run every
queries()[name] on Spark and its oracle_sql()[name] on DuckDB over the
same parquet fixtures, compare row count, column names, and an
order-insensitive value multiset.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")


def canon(val):
    """Canonicalize a cell for multiset comparison.

    Deliberately NO list->tuple conversion: the driver's comparator
    hashes raw pandas cells and crashes on list values, so this
    replica must be exactly as strict (the old tuple fallback is how
    emb_pq_encode passed locally while dying at the driver --
    CORRECTNESS_r05). The schema guard below rejects nested output
    before any row is fetched; if a list ever reaches here anyway it
    raises unhashable just like the driver would.
    """
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return repr(val)  # full precision repr: bit-exact comparison
    return val


def compare(name: str, spark_rows, duck_rows) -> list[str]:
    problems = []
    if len(spark_rows) != len(duck_rows):
        problems.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
    from collections import Counter

    cs = Counter(tuple(canon(v) for v in r) for r in spark_rows)
    cd = Counter(tuple(canon(v) for v in r) for r in duck_rows)
    if cs != cd:
        only_s = list((cs - cd).items())[:3]
        only_d = list((cd - cs).items())[:3]
        problems.append(f"values differ; spark-only={only_s} duck-only={only_d}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import duckdb

    import __spark_entry__ as entrymod
    from etl_building_inspector_spark.plans.contract import (
        assert_scalar_output_schema,
    )
    from etl_building_inspector_spark.session import get_spark

    spark = get_spark("oracle-check")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(sys.argv[2:]) or set(queries)

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_fail = 0
    for name, fn in sorted(queries.items()):
        if name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            # driver-shape guard BEFORE any rows move: nested output
            # types crash the driver's canonicalizer even when every
            # value is right (plans/contract.py)
            assert_scalar_output_schema(sdf.schema, name)
            spark_cols = sdf.columns
            # collect() is sanctioned here: the gate runs at sf<=0.01
            # (<=60k-row fixtures). Stream + cap so a future fixture
            # bump degrades loudly instead of OOMing the driver.
            spark_rows = []
            for r in sdf.toLocalIterator():
                spark_rows.append(tuple(r))
                if len(spark_rows) > 5_000_000:
                    raise RuntimeError(
                        "oracle_check row cap exceeded (5M); "
                        "this gate is for small-SF fixtures only"
                    )
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: rows={len(spark_rows)} (no oracle) "
                  f"[{time.time() - t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: columns spark={spark_cols} duck={duck_cols}")
            n_fail += 1
            continue
        # driver sorts columns by name before hashing
        s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
        d_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
        spark_sorted = [tuple(r[i] for i in s_idx) for r in spark_rows]
        duck_sorted = [tuple(r[i] for i in d_idx) for r in duck_rows]
        problems = compare(name, spark_sorted, duck_sorted)
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(spark_rows)} [{time.time() - t0:.1f}s]")
    print(f"\n{'ALL PASS' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
