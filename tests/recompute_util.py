"""Shared helpers for the independent property-test layer (the
pandas/numpy/hashlib recompute discipline of tests/test_r6_properties
.py, factored out as the layer grew to cover the whole registry).

Nothing here touches Spark or DuckDB: the point of the layer is that
the expected values are derived by a third, unrelated implementation.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd

# Default scale for the recompute layer; override with
# EBI_RECOMPUTE_SF_DIR=/root/testdata/sf0.01 for a second-scale soak
# (the r7 window bugs showed ties can be scale-dependent).
SF = os.environ.get("EBI_RECOMPUTE_SF_DIR", "/root/testdata/sf0.001")


def read(table: str, sf: str = SF) -> pd.DataFrame:
    return pd.read_parquet(f"{sf}/{table}.parquet")


def md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def half_up(x, scale: int) -> pd.Series:
    """Spark's F.round: HALF_UP (away from zero). numpy/python round
    is half-even, so spell it out: sign * floor(|x*10^scale| + 0.5)."""
    v = np.asarray(x, dtype="float64") * (10.0**scale)
    return pd.Series(
        (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype("int64")
    )


def rev_e4(price, disc) -> pd.Series:
    """The TPC-H battery's exact integer revenue domain:
    round(price * (1 - disc) * 10000, 0) as BIGINT, HALF_UP."""
    return half_up(
        np.asarray(price, dtype="float64")
        * (1.0 - np.asarray(disc, dtype="float64")),
        4,
    )


def frames_equal(got: pd.DataFrame, want: pd.DataFrame):
    """Order-free exact comparison: align columns by name, sort both
    frames by every column (NaN/None mapped to a sentinel so sorting
    and equality are well-defined), compare cell-by-cell. Floats are
    compared by exact IEEE repr -- the engine must match the recompute
    bit-for-bit, not approximately."""
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
                out[c] = s.map(
                    lambda v: "\x00<NULL>" if pd.isna(v) else repr(float(v))
                )
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
