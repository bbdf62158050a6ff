"""Interleaved A/B of fan_out_scan (host-noise-robust): runs each query
alternating baseline (fan-out disabled via monkeypatch) and optimized,
best-of-N each, in ONE session. Usage:
  python tools/ab_fanout.py [--n 3] query [query...]
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from etl_building_inspector_spark.operators import _parallel  # noqa: E402
from etl_building_inspector_spark.operators._cache import (  # noqa: E402
    release_persisted,
)
from etl_building_inspector_spark.plans.registry import QUERIES  # noqa: E402
from etl_building_inspector_spark.session import get_spark  # noqa: E402

_real = _parallel.fan_out_scan


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    # patch points: modules that imported the symbol by name
    import etl_building_inspector_spark.operators.dedup as dmod

    patch_targets = [dmod, _parallel]
    for modname in list(sys.modules):
        m = sys.modules[modname]
        if (
            modname.startswith("etl_building_inspector_spark")
            and getattr(m, "fan_out_scan", None) is _real
        ):
            if m not in patch_targets:
                patch_targets.append(m)

    def set_fanout(on: bool) -> None:
        fn = _real if on else (lambda df: df)
        for m in patch_targets:
            if hasattr(m, "fan_out_scan"):
                m.fan_out_scan = fn

    spark = get_spark("ab-fanout")
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

    for name in args.queries:
        a, b = [], []
        run(name)  # one unmeasured warmup (codegen compile)
        for _ in range(args.n):
            set_fanout(False)
            a.append(run(name))
            set_fanout(True)
            b.append(run(name))
        set_fanout(True)
        fmt = lambda xs: "/".join(f"{x:.2f}" for x in xs)
        print(
            f"{name:42s} base min {min(a):6.3f} [{fmt(a)}]  "
            f"fanout min {min(b):6.3f} [{fmt(b)}]  speedup {min(a)/min(b):5.2f}x"
        )


if __name__ == "__main__":
    main()
