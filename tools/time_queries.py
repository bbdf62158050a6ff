"""Time a list of queries (cold + N warm reruns each) in one session,
bench-style (noop sink, release_persisted + gc between runs).

Usage: python tools/time_queries.py [--n 3] query [query...]
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
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark("time-queries")
    spark.read.parquet(os.path.join(args.sf, "region.parquet")).write.format(
        "noop"
    ).mode("overwrite").save()

    def run(name: str) -> float:
        t0 = time.time()
        QUERIES[name](spark, args.sf).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        release_persisted()
        gc.collect()
        return dt

    for name in args.queries:
        cold = run(name)
        warm = [run(name) for _ in range(args.n)]
        fmt = "/".join(f"{x:.2f}" for x in warm)
        print(f"{name:44s} cold {cold:6.2f}  warm best {min(warm):6.2f} [{fmt}]")


if __name__ == "__main__":
    main()
