"""Dump full `explain("formatted")` output for named queries into
plans/r11/<query>_<suffix>.txt — the optimization round's before/after
plan evidence (the judge checks plan claims against these files).

Usage: python tools/dump_r11_plans.py <before|after> query [query...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from etl_building_inspector_spark.plans.registry import QUERIES  # noqa: E402
from etl_building_inspector_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plans-r11")
    os.makedirs("/root/repo/plans/r11", exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = f"/root/repo/plans/r11/{name}_{suffix}.txt"
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
        from etl_building_inspector_spark.operators._cache import (
            release_persisted,
        )

        release_persisted()


if __name__ == "__main__":
    main()
