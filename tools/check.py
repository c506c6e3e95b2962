#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage:  python3 tools/check.py [sfDir] [outDir] [jsonOut]

With a third argument, also writes a machine-readable artifact (per-query
status + pass counts + the corpus fingerprint Verify dropped in outDir) —
this is what tools/strict_gate.sh commits as CORRECTNESS_sf01_rN.json.

Assumes `graft.Verify` was already run (sbt "runMain graft.Verify <sfDir>
<outDir>").  Registers the testdata parquet as DuckDB views, runs each
oracle_sql.json entry, and compares against the Spark-written parquet:
columns sorted by name, rows sorted by all columns, exact value equality
(floats compared bit-exactly — the engine is designed for exact aggregates).
"""
import duckdb, json, math, os, sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    # Mirror the driver's gate exactly: plain pandas sort_values with NO
    # array coercion — an array/map/binary cell must FAIL here like it
    # fails in the driver (round-5's q108 lesson; CatalogSchemaSpec bans
    # such columns at the source).
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def cells_equal(a, b):
    if a is None and b is None:
        return True
    # Round-9 lesson: the driver hashes STRING renderings, so int 85700 vs
    # float 85700.0 mismatches there and MUST mismatch here too.  Never let
    # python's int==float leniency paper over a dtype divergence.
    if isinstance(a, float) != isinstance(b, float):
        return False
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    if isinstance(a, (list, tuple)) or str(type(a)).find("ndarray") >= 0:
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(cells_equal(x, y) for x, y in zip(la, lb))
    try:
        if a != a and b != b:  # NaN-ish
            return True
    except Exception:
        pass
    return a == b or str(a) == str(b)

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    results = {}
    produced = {d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d))}
    for name in sorted(produced | set(oracle)):
        if name not in produced:
            results[name] = "MISSING-OUTPUT"
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
        except Exception as e:
            results[name] = f"READ-FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"rows-only ({len(got)} rows)" if len(got) > 0 else "ZERO-ROWS"
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-SQL-FAIL {str(e).splitlines()[0][:160]}"
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA-MISMATCH spark={list(g.columns)} oracle={list(e.columns)}"
            continue
        # Driver-strict dtype gate (round-9 HUGEINT lesson): an oracle
        # column that degrades to float64 while Spark writes int64 hashes
        # red at the driver even when every value is numerically equal.
        # Compare numpy dtype KINDS (i/u vs f vs O vs b vs M) so int32 vs
        # int64 — which the driver's string hash treats as equal — stays
        # green, while int-vs-float fails loudly.
        gk = ["i" if d.kind == "u" else d.kind for d in g.dtypes]
        ek = ["i" if d.kind == "u" else d.kind for d in e.dtypes]
        if gk != ek:
            pairs = [f"{c}: spark={dg} oracle={de}" for c, dg, de
                     in zip(g.columns, g.dtypes, e.dtypes)
                     if ("i" if dg.kind == "u" else dg.kind)
                     != ("i" if de.kind == "u" else de.kind)]
            results[name] = f"DTYPE-MISMATCH {'; '.join(pairs)}"
            continue
        if len(g) != len(e):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(g)} oracle={len(e)}"
            continue
        bad = None
        for col in g.columns:
            gv, ev = g[col].tolist(), e[col].tolist()
            for i, (x, y) in enumerate(zip(gv, ev)):
                if not cells_equal(x, y):
                    bad = f"VALUE-MISMATCH col={col} row={i} spark={x!r} oracle={y!r}"
                    break
            if bad:
                break
        results[name] = bad or "OK"
    n_ok = sum(1 for v in results.values() if v == "OK" or v.startswith("rows-only"))
    for k, v in results.items():
        mark = "PASS" if (v == "OK" or v.startswith("rows-only")) else "FAIL"
        print(f"{mark}  {k}: {v}")
    print(f"\n{n_ok}/{len(results)} pass")
    if len(sys.argv) > 3:
        # the fingerprint pins WHICH corpus this artifact certifies — a
        # silently-empty one loses the provenance the strict gate exists
        # for, so a missing/unparseable file fails the artifact write
        try:
            fp = json.load(open(f"{out}/fingerprint.json"))
        except Exception as e:
            print(f"FATAL: cannot load {out}/fingerprint.json ({e}); "
                  "refusing to write an artifact without corpus provenance")
            sys.exit(2)
        artifact = {"sf": sf, "n_pass": n_ok, "n_total": len(results),
                    "strict_dtype_gate": True, "fingerprint": fp,
                    "queries": results}
        with open(sys.argv[3], "w") as f:
            json.dump(artifact, f, indent=1, sort_keys=True)
        print(f"artifact → {sys.argv[3]}")
    sys.exit(0 if n_ok == len(results) else 1)

if __name__ == "__main__":
    main()
