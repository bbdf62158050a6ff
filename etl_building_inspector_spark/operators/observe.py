"""Zero-cost pipeline telemetry via DataFrame.observe.

Quality/volume metrics (row counts, null rates, domain violations)
computed AS A SIDE EFFECT of the job that materializes the data — no
second scan, no separate metrics query drifting out of sync with the
pipeline. The metrics ride the same whole-stage-codegen pass; on a
cluster they aggregate through the standard accumulator channel.

This is the engine-side half of data-quality gating at 100 TB: the
pipeline writes its output AND reports "n_rows, null_id_rate,
oversize_docs" from the very rows it wrote, so a gate can abort a bad
publish without re-reading anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_quality(
    df: DataFrame,
    name: str = "quality",
    null_cols: tuple[str, ...] = (),
    bounds: dict[str, tuple[float, float]] | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach quality metrics to `df`. Returns (observed_df, obs);
    after the observed frame is materialized (write/collect/count),
    `obs.get` yields the metrics dict.

    - n_rows: total rows that flowed through
    - null_<col>: null count per requested column
    - oob_<col>: rows outside [lo, hi] per bounds entry
    """
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}")
        )
    for c, (lo, hi) in (bounds or {}).items():
        metrics.append(
            F.sum(
                (~F.col(c).between(lo, hi)).cast("long")
            ).alias(f"oob_{c}")
        )
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
