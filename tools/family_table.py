#!/usr/bin/env python3
"""Per-family bench table from a Bench artifact (round-9 VERDICT item 6).

The single s/q scalar under-represents the engine as the catalog mix
shifts toward streaming/index-write/iterative queries; this groups every
catalog query into a stable family (by its defining source file — the
registry is organized that way) and prints per-family totals so the 2×
baseline gate stays meaningful at any mix.

Usage: python3 tools/family_table.py target/bench_full.json [old.json]
With a second artifact, adds that artifact's s/q per family for
round-over-round comparison on the SHARED queries only.
"""
import json, re, subprocess, sys

FAMILY = {
    "Relational.scala":      "relational core (scan/filter/join/agg/window)",
    "IoQueries.scala":       "io + jdbc + ddl (CSV/HTTP/JDBC/CTAS/upsert)",
    "TextQueries.scala":     "text search + inverted index (tsvector/rank/index-write)",
    "StreamQueries.scala":   "structured streaming (stateful/watermark/index-maint)",
    "ExtQueriesPart1.scala": "ext: dedup/ANN/multimodal/pipeline",
    "ExtQueriesPart2.scala": "ext: stats/privacy/reconciliation",
    "ExtQueriesPart3.scala": "ext: distribution/rank statistics",
    "ExtQueriesPart4.scala": "ext: sampling/product analytics",
    "ExtQueriesPart5.scala": "ext: corpus QA (zipf/entropy/langid)",
    "ExtQueriesPart6.scala": "ext: placement/sketches (ring/KMV)",
    "ExtQueriesPart7.scala": "ext: embedding geometry/SPRT/bootstrap",
    "ExtQueriesPart8.scala": "ext: training-run ops (mixture/packing/split)",
}


def query_files():
    out = subprocess.run(
        ["grep", "-rn", "-E", '"q[0-9]+[a-z_0-9]*" *->',
         "src/main/scala/graft/ops/"],
        capture_output=True, text=True).stdout
    loc = {}
    for line in out.splitlines():
        f = line.split(":")[0].split("/")[-1]
        for m in re.findall(r'"(q[0-9][a-z_0-9]*)" *->', line):
            # a query registered in several files keeps its first site
            loc.setdefault(m, f)
    return loc


def main():
    art = json.load(open(sys.argv[1]))
    old = json.load(open(sys.argv[2])) if len(sys.argv) > 2 else None
    qs, loc = art["queries"], query_files()
    oldqs = (old or {}).get("queries", {})
    fams = {}
    for q, t in qs.items():
        fam = FAMILY.get(loc.get(q, "?"), "unclassified")
        fams.setdefault(fam, []).append(q)
    print("| Family | n | total s | s/q | prior s/q (shared) |")
    print("|---|---|---|---|---|")
    tot_n = tot_s = 0
    for fam in sorted(fams, key=lambda f: -sum(qs[q] for q in fams[f])):
        names = fams[fam]
        n, s = len(names), sum(qs[q] for q in names)
        shared = [q for q in names if q in oldqs]
        prior = (f"{sum(oldqs[q] for q in shared)/len(shared):.2f} "
                 f"({len(shared)}q)") if shared else "—"
        print(f"| {fam} | {n} | {s:.1f} | {s/n:.2f} | {prior} |")
        tot_n += n; tot_s += s
    print(f"| **all** | {tot_n} | {tot_s:.1f} | {tot_s/tot_n:.2f} | "
          f"{(sum(oldqs[q] for q in qs if q in oldqs)/max(1,len([q for q in qs if q in oldqs]))):.2f} |"
          if oldqs else
          f"| **all** | {tot_n} | {tot_s:.1f} | {tot_s/tot_n:.2f} | — |")


if __name__ == "__main__":
    main()
