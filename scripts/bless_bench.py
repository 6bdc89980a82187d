"""Cross-run bench blessing (round-14 verdict #3): the blessed
artifact a round ships must carry, per query, the MEDIAN across the
>=3 same-tree recordings — a single run's number, even a median-of-3
reps, can sit 2x above the cross-run truth when a hypervisor-steal
window covers all its reps (r14: q171 blessed at 5.68 s vs a 2.6 s
cross-run median; q161 7.20 vs 4.1). The in-run spread gate
(bench.REP_SPREAD_BAR) votes out single-rep bursts; THIS script is the
complement for uniformly-elevated whole runs.

Usage:
    python scripts/bless_bench.py bench_runs/bench_A.json bench_B.json ...

Writes bench_runs/blessed_<stamp>.json carrying per-query cross-run
medians, the per-run values (provenance — a reader can recompute), the
source filenames, and band flags for any query whose cross-run
max/min spread exceeds BAND (those rows are noise-suspect even after
medianing and must be annotated if quoted). Prints the compact JSON
line. Only query keys present in EVERY run are blessed; the rest are
reported under "unblessed" (e.g. a query added mid-round)."""

from __future__ import annotations

import datetime
import json
import os
import sys

#: cross-run max/min spread above which a blessed row is flagged
BAND = 1.5


def _median(xs):
    s = sorted(xs)
    return s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2


def bless(paths: list[str]) -> dict:
    runs = []
    for p in paths:
        with open(p) as f:
            runs.append(json.load(f))
    sfs = {r.get("sf") for r in runs}
    if len(sfs) != 1:
        raise SystemExit(f"refusing to bless across scale factors: {sfs}")
    keysets = [set(r["queries"]) for r in runs]
    common = set.intersection(*keysets)
    unblessed = sorted(set.union(*keysets) - common)
    per_query = {
        q: [r["queries"][q] for r in runs] for q in sorted(common)
    }
    blessed = {q: round(_median(vs), 3) for q, vs in per_query.items()}
    flags = {
        q: round(max(vs) / min(vs), 2)
        for q, vs in per_query.items()
        if min(vs) > 0 and max(vs) / min(vs) > BAND
    }
    return {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(blessed.values()), 3),
        "unit": "sec",
        "queries": blessed,
        "sf": sfs.pop(),
        "aggregation": f"cross-run-median-of-{len(runs)}-run-medians",
        "runs": [os.path.basename(p) for p in paths],
        "sandbox_cal": [r.get("sandbox_cal") for r in runs],
        "per_query": per_query,
        "band_flags": flags,
        "band": BAND,
        "unblessed": unblessed,
    }


def main() -> None:
    paths = sys.argv[1:]
    if len(paths) < 2:
        raise SystemExit("need >=2 bench_runs artifacts to bless across")
    out = bless(paths)
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime("%Y%m%dT%H%M%SZ")
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_runs",
        f"blessed_{stamp}.json",
    )
    with open(dest, "w") as f:
        f.write(json.dumps(out) + "\n")
    compact = {k: v for k, v in out.items() if k != "per_query"}
    compact["file"] = os.path.relpath(dest, os.path.dirname(os.path.dirname(dest)))
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    main()
