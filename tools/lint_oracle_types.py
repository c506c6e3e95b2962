#!/usr/bin/env python3
"""Oracle output-type lint — the round-9 lesson made permanent.

DuckDB's integer sum() returns HUGEINT; any final oracle expression built
on it WITHOUT `CAST(... AS BIGINT)` stays HUGEINT, which DuckDB's pandas
path converts to float64 — so the driver hashes "85700.0" against Spark's
int64 "85700" and mismatches even though every value is identical.  Round
9 shipped 13 red queries through exactly that hole.

This lint PLANS (never executes) every oracleSql statement against views
over a small SF dir and fails on:
  * any HUGEINT / UHUGEINT output column (always wrong — the engine never
    emits a 128-bit integer, so the driver compare can only lose);
  * any DOUBLE/FLOAT output column whose name carries an integer-scale
    suffix (_ppm/_milli/_micro/_mc/_pico/_nano/_centi) or is a known
    integer gate — those columns are integer by house convention.

Usage: python3 tools/lint_oracle_types.py [oracle_sql.json] [sfDir]
Run via tools/precommit.sh after `runMain graft.tools.DumpOracles`.
"""
import duckdb, json, re, sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
INT_SUFFIX = re.compile(
    r"(_ppm|_milli|_micro|_mc|_pico|_nano|_centi|_cents)$")
BAD_ALWAYS = {"HUGEINT", "UHUGEINT"}
FLOATY = {"DOUBLE", "FLOAT", "REAL"}


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/oracle_sql.json"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    oracle = json.load(open(path))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    bad, planfail = [], []
    for name in sorted(oracle):
        try:
            rel = con.sql(oracle[name])
            cols, types = rel.columns, [str(t).upper() for t in rel.types]
        except Exception as e:
            planfail.append(f"{name}: PLAN-FAIL {str(e).splitlines()[0][:160]}")
            continue
        for c, ty in zip(cols, types):
            base = ty.split("(")[0]
            if base in BAD_ALWAYS:
                bad.append(f"{name}.{c}: {ty} (wrap the final expression in"
                           f" CAST(... AS BIGINT))")
            elif base in FLOATY and INT_SUFFIX.search(c):
                bad.append(f"{name}.{c}: {ty} but integer-scale suffix — "
                           f"cast to BIGINT or rename")
    for m in planfail:
        print(f"FAIL  {m}")
    for m in bad:
        print(f"FAIL  {m}")
    n = len(oracle)
    if bad or planfail:
        print(f"\nlint: {len(bad)} type violations, {len(planfail)} "
              f"plan failures across {n} oracles")
        sys.exit(1)
    print(f"lint OK: {n} oracles, 0 HUGEINT/float-suffixed output columns")


if __name__ == "__main__":
    main()
