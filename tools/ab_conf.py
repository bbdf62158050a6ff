"""Interleaved A/B of a runtime SQL conf (host-noise-robust).

Usage:
  python tools/ab_conf.py --key K --a V1 --b V2 [--n 3] query [query...]
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from etl_building_inspector_spark.operators._cache import (  # noqa: E402
    release_persisted,
)
from etl_building_inspector_spark.plans.registry import QUERIES  # noqa: E402
from etl_building_inspector_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--key", required=True)
    ap.add_argument("--a", required=True, help="baseline value")
    ap.add_argument("--b", required=True, help="candidate value")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark("ab-conf")
    spark.read.parquet(os.path.join(args.sf, "region.parquet")).write.format(
        "noop"
    ).mode("overwrite").save()

    def run(name: str) -> float:
        t0 = time.time()
        df = QUERIES[name](spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        release_persisted()
        gc.collect()
        return dt

    tot_a = tot_b = 0.0
    for name in args.queries:
        run(name)  # warmup
        a, b = [], []
        for _ in range(args.n):
            spark.conf.set(args.key, args.a)
            a.append(run(name))
            spark.conf.set(args.key, args.b)
            b.append(run(name))
        tot_a += min(a)
        tot_b += min(b)
        fmt = lambda xs: "/".join(f"{x:.2f}" for x in xs)
        print(
            f"{name:42s} A min {min(a):6.3f} [{fmt(a)}]  "
            f"B min {min(b):6.3f} [{fmt(b)}]  B speedup {min(a)/min(b):5.2f}x"
        )
    print(f"TOTALS: A {tot_a:.2f}  B {tot_b:.2f}  ({tot_a/tot_b:.2f}x)")


if __name__ == "__main__":
    main()
