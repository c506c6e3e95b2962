#!/bin/bash
# Fast inner loop for ONE catalog query: run the engine query to parquet,
# dump its oracle SQL, and compare via the same gate logic as check.py.
#
# Usage: tools/check_one.sh q193_pareto_frontier [sfDir]
set -e
Q="$1"
SF="${2:-/root/testdata/sf0.01}"
OUT="/tmp/graft_check_one/$Q"
mkdir -p "$OUT"
sbt -batch "runMain graft.tools.RunOne $Q $SF $OUT/result.parquet" > "$OUT/run.log" 2>&1 \
  || { tail -20 "$OUT/run.log"; exit 1; }
sbt -batch "runMain graft.tools.OracleOne $Q" > "$OUT/oracle.log" 2>&1 \
  || { tail -20 "$OUT/oracle.log"; exit 1; }
awk "/-----8<-----/{f=1;next}/----->8-----/{f=0}f" "$OUT/oracle.log" | sed "s/^.info. \{0,1\}//" > "$OUT/oracle.sql"
python3 - "$Q" "$SF" "$OUT" <<'EOF'
import duckdb, sys, math
q, sf, out = sys.argv[1:4]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = con.execute(open(f"{out}/oracle.sql").read()).df()
engine = con.execute(f"SELECT * FROM read_parquet('{out}/result.parquet/*.parquet')").df()
def norm(df):
    df = df[sorted(df.columns)].copy()
    return df.sort_values(by=list(df.columns), ignore_index=True)
o, e = norm(oracle), norm(engine)
if list(o.columns) != list(e.columns):
    print("SCHEMA MISMATCH", list(o.columns), list(e.columns)); sys.exit(1)
if len(o) != len(e):
    print("ROWCOUNT MISMATCH", len(o), len(e)); sys.exit(1)
ok = [d.kind.replace("u", "i") for d in o.dtypes]
ek = [d.kind.replace("u", "i") for d in e.dtypes]
if ok != ek:
    print("DTYPE MISMATCH (driver-strict)",
          [f"{c}: oracle={a} engine={b}" for c, a, b
           in zip(o.columns, o.dtypes, e.dtypes)
           if a.kind.replace("u", "i") != b.kind.replace("u", "i")])
    sys.exit(1)
def eq(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) != isinstance(b, float): return False
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    return a == b
bad = 0
for i in range(len(o)):
    for c in o.columns:
        a, b = o.at[i, c], e.at[i, c]
        if not eq(a, b):
            if bad < 5: print(f"row {i} col {c}: oracle={a!r} engine={b!r}")
            bad += 1
print(f"{'PASS' if bad == 0 else 'FAIL'} {q}: {len(o)} rows, {bad} bad cells")
sys.exit(1 if bad else 0)
EOF
