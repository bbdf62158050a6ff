"""Range (interval) join: pairs within a bounded distance on an
ordering key -- |left.ts - right.ts| <= window.

Spark has no native range-join strategy (Databricks' range-join hint is
proprietary), and the naive formulation is a cross join with a filter:
O(n*m) comparisons regardless of selectivity. The scalable shape
bucketizes the range key:

  right rows -> bucket floor(t/w); left rows -> explode to buckets
  {floor(t/w)-1, floor(t/w), floor(t/w)+1}. Any pair within w shares a
  bucket (|t1-t2| <= w bounds their bucket distance to 1), so the
  equi-join on bucket finds every candidate, and the exact predicate
  filters false positives inside the bucket. Shuffle is hash-on-bucket;
  cost scales with bucket occupancy (w controls skew), not n*m.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_micros


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    window_seconds: float,
    extra_cond: Column | None = None,
) -> DataFrame:
    """Inner range join on |left_key - right_key| <= window_seconds
    (timestamp columns). `extra_cond` appends additional join
    predicates (evaluated with the exact filter).

    Bucketing and the exact filter both run on integer epoch MICROS
    (epoch_micros handles TIMESTAMP and TIMESTAMP_NTZ): a double-typed
    comparison would wobble on sub-second fractions right at the window
    boundary and disagree with the integer-precision oracle."""
    w_us = int(round(float(window_seconds) * 1_000_000))
    lb = F.floor(epoch_micros(left[left_key]) / F.lit(w_us))
    rb = F.floor(epoch_micros(right[right_key]) / F.lit(w_us))
    lefts = left.withColumn(
        "__rb", F.explode(F.array(lb - 1, lb, lb + 1))
    )
    rights = right.withColumn("__rb", rb)
    joined = lefts.join(rights, "__rb", "inner")
    exact = (
        F.abs(epoch_micros(left[left_key]) - epoch_micros(right[right_key]))
        <= F.lit(w_us)
    )
    if extra_cond is not None:
        exact = exact & extra_cond
    return joined.filter(exact).drop("__rb")
