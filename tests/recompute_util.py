"""Shared helpers for the independent property-test layer (the
pandas/numpy/hashlib recompute discipline of tests/test_r6_properties
.py, factored out as the layer grew to cover the whole registry).

Nothing here touches Spark or DuckDB: the point of the layer is that
the expected values are derived by a third, unrelated implementation.
"""

from __future__ import annotations

import hashlib
import os
from decimal import ROUND_HALF_UP, Decimal

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


_ONE = Decimal(1)


def half_up(x, scale: int) -> pd.Series:
    """Spark's F.round: BigDecimal.valueOf(double) -- i.e. the
    shortest-repr decimal of the double -- rounded HALF_UP (away from
    zero). The float trick floor(|v|+0.5) diverges at IEEE boundaries
    (v=0.49999999999999994 has v+0.5 == 1.0 exactly, rounding up where
    the JVM yields 0), so round via Decimal(repr(v)) which mirrors
    Double.toString's shortest-repr semantics exactly (ADVICE r7).

    The 10^scale multiply happens INSIDE Decimal (ADVICE r8): scaling
    in binary float first perturbs .5 boundaries -- half_up(1.005, 2)
    via float gives 1.005*100 == 100.49999999999999 -> 100, while the
    JVM's BigDecimal.valueOf(1.005).setScale(2, HALF_UP) sees the
    exact shortest-repr '1.005' and yields 101 (likewise 0.285, 8.575,
    -1.005 at scale 2). Decimal('1.005') * 100 is exact, so the
    boundary survives."""
    v = np.asarray(x, dtype="float64")
    p = Decimal(10) ** scale
    return pd.Series(
        [
            int((Decimal(repr(f)) * p).quantize(_ONE, rounding=ROUND_HALF_UP))
            for f in v.tolist()
        ],
        dtype="int64",
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

    def cell(v):
        # Uniform type-tagged normalization (ADVICE r7): bool True and
        # the string 'True' must not conflate, and pandas nullable
        # Int64/boolean cells (pd.NA) must map to the sentinel instead
        # of raising in an int cast. Tags are coarse kind markers so
        # numpy scalars and python scalars of the same kind agree.
        # Bools normalize into the INT kind (ADVICE r8): an engine
        # boolean modeled as 0/1 by a recompute (or vice versa) must
        # compare equal, as it did before type tagging -- only the
        # string/bool distinction the r7 note required is kept.
        if isinstance(v, (list, tuple, np.ndarray)):
            return "s:" + str(list(v))
        if pd.isna(v):
            return "\x00<NULL>"
        if isinstance(v, (bool, np.bool_)):
            return f"i:{int(v)}"
        if isinstance(v, (float, np.floating)):
            return f"f:{repr(float(v))}"
        if isinstance(v, (int, np.integer)):
            return f"i:{int(v)}"
        return f"s:{v}"

    def norm(df):
        out = df[cols].copy()
        for c in cols:
            out[c] = out[c].astype(object).map(cell)
        return out.sort_values(cols).reset_index(drop=True)

    g, w = norm(got), norm(want)
    for c in cols:
        eq = g[c].to_numpy() == w[c].to_numpy()
        assert eq.all(), (
            f"column {c} diverges at sorted-row {int(np.argmin(eq))}: "
            f"got={g[c][~eq].iloc[0]!r} want={w[c][~eq].iloc[0]!r}"
        )
