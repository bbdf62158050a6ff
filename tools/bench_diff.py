"""Round-over-round bench regression diff.

Compares two BENCH_DETAIL.json files (e.g. the current one vs the
previous round's, extracted with `git show <rev>:BENCH_DETAIL.json`)
and reports per-query deltas beyond a noise threshold -- the
systematic version of the manual diff the per-round review does.

The comparison prefers the WARM map when both files have one (warm is
the steady-state signal that extrapolates; cold includes the
per-plan codegen compile, which is fixed but noisier), falling back
to cold. Queries present on only one side are listed separately
(headline-set changes, not regressions).

Usage:
    python tools/bench_diff.py OLD.json [NEW.json] [--threshold 1.3]
    git show <rev>:BENCH_DETAIL.json > /tmp/old.json && \
        python tools/bench_diff.py /tmp/old.json

NEW defaults to the repo-root BENCH_DETAIL.json. Exit code 1 when any
query regressed beyond the threshold AND by more than 0.5 s absolute
(both gates: ratio-only flags sub-100ms noise, absolute-only misses
slow creep on big queries).
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    threshold = 1.3
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            threshold = float(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
    if not args:
        sys.exit("usage: bench_diff.py OLD.json [NEW.json] [--threshold 1.3]")
    old_path = args[0]
    new_path = (
        args[1]
        if len(args) > 1
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_DETAIL.json",
        )
    )
    old = json.load(open(old_path))
    new = json.load(open(new_path))

    def pick(d: dict) -> tuple[str, dict]:
        return (
            ("warm", d["queries_warm"])
            if "queries_warm" in d
            else ("cold", d["queries"])
        )

    old_kind, old_q = pick(old)
    new_kind, new_q = pick(new)
    if old_kind != new_kind:
        # fall back to the map both sides have
        old_kind = new_kind = "cold"
        old_q, new_q = old["queries"], new["queries"]
    print(
        f"comparing {old_kind} maps: old sf={old.get('sf')} "
        f"value={old.get('value')} vs new sf={new.get('sf')} "
        f"value={new.get('value')} (threshold {threshold}x & >0.5s)"
    )
    if old.get("sf") != new.get("sf"):
        print("WARNING: different scale factors -- ratios not meaningful")

    shared = sorted(set(old_q) & set(new_q))
    only_old = sorted(set(old_q) - set(new_q))
    only_new = sorted(set(new_q) - set(old_q))
    regressed, improved = [], []
    for name in shared:
        o, n = old_q[name], new_q[name]
        if n > o * threshold and n - o > 0.5:
            regressed.append((name, o, n))
        elif o > n * threshold and o - n > 0.5:
            improved.append((name, o, n))
    regressed.sort(key=lambda t: t[1] - t[2])
    improved.sort(key=lambda t: t[2] - t[1])

    if regressed:
        print(f"\n{len(regressed)} REGRESSED:")
        for name, o, n in regressed:
            print(f"  {name}: {o:.2f}s -> {n:.2f}s ({n / o:.2f}x)")
    if improved:
        print(f"\n{len(improved)} improved:")
        for name, o, n in improved:
            print(f"  {name}: {o:.2f}s -> {n:.2f}s ({n / o:.2f}x)")
    if only_old:
        print(f"\nremoved from headline set: {only_old}")
    if only_new:
        print(f"\nadded to headline set: {only_new}")
    if not (regressed or improved or only_old or only_new):
        print("\nno per-query change beyond noise")
    tot_o = sum(old_q[n] for n in shared)
    tot_n = sum(new_q[n] for n in shared)
    print(
        f"\nshared-set total ({len(shared)} queries): "
        f"{tot_o:.1f}s -> {tot_n:.1f}s ({tot_n / tot_o:.2f}x)"
    )
    sys.exit(1 if regressed else 0)


if __name__ == "__main__":
    main()
