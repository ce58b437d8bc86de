#!/usr/bin/env python3
"""Regenerate BENCH_BUDGET.json from a quiet-window bench_detail run.

Usage: python3 tools/make_budget.py <bench_detail.json> <sf_dir> [out]

The budget file freezes each query's quiet-window WARM time at the graded
sf (VERDICT r12 #6). graft.Bench loads it on every run whose sf matches
"_sf" and flags any query whose warm time exceeds 1.5x its budget —
"budget_flags" in the output JSON and bench_detail.json — so a plan
regression cannot hide behind a host-noise adjudication. Regenerate ONLY
from a quiet fresh-layout run (retried should be empty or tiny), and
review the diff like any plan change.
"""
import json
import sys

def main() -> None:
    detail_path = sys.argv[1]
    sf_dir = sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "BENCH_BUDGET.json"
    with open(detail_path) as f:
        detail = json.load(f)
    rows = {q["name"]: q["warm"] for q in detail["queries"]}
    retried = set(detail.get("retried", []))
    doc = {"_sf": sf_dir, "_source": detail_path,
           "_note": "quiet-window warm seconds; Bench flags warm > 1.5x"}
    # a retried query's kept time is already the min of two runs, but a
    # quiet regeneration should rarely have any — keep them, flag in note
    if retried:
        doc["_retried_at_generation"] = sorted(retried)
    for name in sorted(rows):
        doc[name] = round(rows[name], 3)
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {out}: {len(rows)} budgets from {detail_path} at {sf_dir}")

if __name__ == "__main__":
    main()
