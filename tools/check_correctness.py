#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: run Verify (Spark) at a given SF,
then run each oracle_sql.json query in DuckDB over the same parquet tables
and compare (schema by sorted column names, values after row sort).

Usage: python3 tools/check_correctness.py [sfdir] [outdir] [--skip-verify]
"""
import json, sys, math, subprocess, os
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

if "--skip-verify" not in sys.argv:
    # wipe the outdir first: a compile failure must NEVER silently fall back
    # to stale outputs from a previous run
    import shutil
    shutil.rmtree(outdir, ignore_errors=True)
    r = subprocess.run(["sbt","-batch",f"runMain graft.Verify {sfdir} {outdir}"],
                       cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    errs = [l for l in (r.stdout+r.stderr).splitlines() if "[verify]" in l or "error]" in l]
    if r.returncode != 0:
        print("VERIFY RUN FAILED (compile or runtime):")
        print("\n".join(errs[-40:]))
        sys.exit(2)
    print("\n".join(l for l in errs if "[verify]" in l)[:3000])

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
names = sorted(os.listdir(outdir))
results = {}

def canon(rows, colnames):
    """sort columns by name, then rows. Floats compare EXACT (bit-level):
    the driver's hasher does, and 9-dp rounding hid a real last-ULP red
    in round 5 (q117). Only NaN is normalized (NaN != NaN)."""
    idx = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in idx:
            v = row[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [colnames[i] for i in idx], out

def widened_cols(sql):
    """Column types the driver's hasher renders differently from Spark's:
    DuckDB types integer sum()/window-sum() as HUGEINT (int128), which
    Arrow/pandas maps to double — bit-identical VALUES then hash differently
    (the proven round-6 failure mode: exactly the 6 uncast-HUGEINT oracles
    failed). Every such column must be CAST(... AS BIGINT) in the oracle."""
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception:
        return []
    return [(c, t) for c, t, *_ in desc if "HUGEINT" in str(t).upper()]

for name in sorted(oracle.keys()):
    pdir = os.path.join(outdir, name)
    if not os.path.isdir(pdir):
        results[name] = "MISSING-SPARK-OUTPUT"; continue
    try:
        huge = widened_cols(oracle[name])
        if huge:
            results[name] = f"HUGEINT-ORACLE-COLS {huge} (driver hasher renders int128 != int64; CAST AS BIGINT)"
            continue
        tbl = pq.read_table(pdir)
        scols, srows = canon([list(r.values()) for r in tbl.to_pylist()], tbl.column_names)
        cur = con.execute(oracle[name])
        ocols_raw = [d[0] for d in cur.description]
        orows_raw = cur.fetchall()
        ocols, orows = canon(orows_raw, ocols_raw)
        if scols != ocols:
            results[name] = f"SCHEMA-MISMATCH spark={scols} oracle={ocols}"
        elif len(srows) != len(orows):
            results[name] = f"ROWCOUNT spark={len(srows)} oracle={len(orows)}"
            for a, b in zip(srows, orows):
                if a != b:
                    results[name] += f" firstdiff spark={a} oracle={b}"; break
        else:
            diff = [(i,a,b) for i,(a,b) in enumerate(zip(srows,orows)) if a != b]
            if diff:
                i,a,b = diff[0]
                results[name] = f"VALUE-DIFF n={len(diff)}/{len(srows)} row{i} spark={a} oracle={b}"
            else:
                results[name] = f"OK ({len(srows)} rows)"
    except Exception as e:
        results[name] = f"ERROR {type(e).__name__}: {str(e)[:200]}"

# rows-only queries (no oracle)
for name in sorted(os.listdir(outdir)):
    if name.endswith(".json") or name in oracle: continue
    pdir = os.path.join(outdir, name)
    if os.path.isdir(pdir):
        n = pq.read_table(pdir).num_rows
        results[name] = f"ROWS-ONLY ({n} rows)"

ok = sum(1 for v in results.values() if v.startswith("OK"))
for k, v in sorted(results.items()):
    flag = "  " if v.startswith(("OK","ROWS-ONLY")) else "XX"
    print(f"{flag} {k}: {v}")
print(f"\n{ok}/{len(oracle)} oracle queries OK")
