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

# Short keys match graft.SparkEntry.families (the artifact's `families`
# rollup); DESC is the human-readable gloss for the printed table.
FAMILY = {
    "Relational.scala":      "relational",
    "IoQueries.scala":       "io_jdbc",
    "TextQueries.scala":     "text_index",
    "StreamQueries.scala":   "streaming",
    "ExtQueriesPart1.scala": "ext_dedup_ann_mm",
    "ExtQueriesPart2.scala": "ext_stats_privacy",
    "ExtQueriesPart3.scala": "ext_distribution",
    "ExtQueriesPart4.scala": "ext_sampling_product",
    "ExtQueriesPart5.scala": "ext_corpus_qa",
    "ExtQueriesPart6.scala": "ext_placement_sketch",
    "ExtQueriesPart7.scala": "ext_geometry_sprt",
    "ExtQueriesPart8.scala": "ext_training_ops",
}
DESC = {
    "relational":           "scan/filter/join/agg/window",
    "io_jdbc":              "CSV/HTTP/JDBC/CTAS/upsert",
    "text_index":           "tsvector/rank/index-write",
    "streaming":            "stateful/watermark/index-maint",
    "ext_dedup_ann_mm":     "dedup/ANN/multimodal/pipeline",
    "ext_stats_privacy":    "stats/privacy/reconciliation",
    "ext_distribution":     "distribution/rank statistics",
    "ext_sampling_product": "sampling/product analytics",
    "ext_corpus_qa":        "corpus QA (zipf/entropy/langid)",
    "ext_placement_sketch": "placement/sketches (ring/KMV)",
    "ext_geometry_sprt":    "embedding geometry/SPRT/bootstrap",
    "ext_training_ops":     "training-run ops (mixture/packing/split)",
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
    # per-query family: from the grep map (needed for the prior-s/q column
    # on SHARED queries, which the artifact's rollup cannot carry)
    fams = {}
    for q, t in qs.items():
        fam = FAMILY.get(loc.get(q, "?"), "unclassified")
        fams.setdefault(fam, []).append(q)
    # primary columns come straight from the artifact's `families` rollup
    # when present (Bench embeds it since round 11); the grep rollup is the
    # fallback for pre-r11 artifacts — and a consistency check: warn when
    # the two disagree on a family's membership count (a drifted FAMILY
    # map here, or a stale artifact, would otherwise pass silently)
    rollup = art.get("families")
    # per-query shuffle-write bytes (Bench embeds since round 12): lets a
    # round-over-round timing move be attributed in one diff — identical
    # bytes + moved seconds = host drift, moved bytes = plan change
    shuf = art.get("queries_shuffle_bytes", {})
    oldshuf = (old or {}).get("queries_shuffle_bytes", {})
    if rollup:
        for fam, r in rollup.items():
            n_grep = len(fams.get(fam, []))
            if n_grep and n_grep != r["n"]:
                print(f"WARNING: family '{fam}': artifact rollup n={r['n']} "
                      f"but grep-derived map has {n_grep} queries — "
                      "FAMILY map or artifact is stale", file=sys.stderr)
        for fam in fams:
            if fam not in rollup:
                print(f"WARNING: family '{fam}' ({len(fams[fam])} queries) "
                      "absent from artifact rollup", file=sys.stderr)
    print("| Family | n | total s | s/q | shuffle MB | prior s/q (shared) |")
    print("|---|---|---|---|---|---|")
    tot_n = tot_s = 0
    order = (sorted(rollup, key=lambda f: -rollup[f]["total_sec"]) if rollup
             else sorted(fams, key=lambda f: -sum(qs[q] for q in fams[f])))
    for fam in order:
        if rollup:
            n, s = rollup[fam]["n"], rollup[fam]["total_sec"]
        else:
            n, s = len(fams.get(fam, [])), sum(qs[q] for q in fams.get(fam, []))
        names = fams.get(fam, [])
        shared = [q for q in names if q in oldqs]
        prior = (f"{sum(oldqs[q] for q in shared)/len(shared):.2f} "
                 f"({len(shared)}q)") if shared else "—"
        gloss = DESC.get(fam, "")
        label = f"{fam} ({gloss})" if gloss else fam
        smb = (f"{sum(shuf.get(q, 0) for q in names)/1048576:.1f}"
               if shuf else "—")
        print(f"| {label} | {n} | {s:.1f} | {s/n:.2f} | {smb} | {prior} |")
        tot_n += n; tot_s += s
    tot_smb = f"{sum(shuf.values())/1048576:.1f}" if shuf else "—"
    print(f"| **all** | {tot_n} | {tot_s:.1f} | {tot_s/tot_n:.2f} | {tot_smb} | "
          f"{(sum(oldqs[q] for q in qs if q in oldqs)/max(1,len([q for q in qs if q in oldqs]))):.2f} |"
          if oldqs else
          f"| **all** | {tot_n} | {tot_s:.1f} | {tot_s/tot_n:.2f} | {tot_smb} | — |")
    # the attribution diff itself: concentrated timing movers annotated
    # with their shuffle-byte movement (needs both artifacts instrumented)
    if oldqs and shuf and oldshuf:
        movers = [(q, qs[q], oldqs[q]) for q in qs
                  if q in oldqs and oldqs[q] > 0.5
                  and abs(qs[q]/oldqs[q] - 1) > 0.2]
        if movers:
            print("\nConcentrated movers (>20% on >0.5s) — shuffle attribution:")
            for q, new, prior in sorted(movers, key=lambda m: -abs(m[1]-m[2])):
                sb_n, sb_o = shuf.get(q, 0), oldshuf.get(q, 0)
                verdict = ("plan change (shuffle bytes moved)"
                           if sb_o and abs(sb_n/max(sb_o, 1) - 1) > 0.1
                           else "host/code-constant (shuffle bytes flat)")
                print(f"  {q}: {prior:.2f}s → {new:.2f}s, "
                      f"shuffle {sb_o/1048576:.1f} → {sb_n/1048576:.1f} MB — {verdict}")


if __name__ == "__main__":
    main()
