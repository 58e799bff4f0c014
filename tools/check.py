#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle in DuckDB against views over <sfDir>/*.parquet, loads the Spark
result parquet from <verifyOutDir>/<name>/, sorts columns by name (like the
driver) and compares values exactly.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def load_spark(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    con = duckdb.connect()
    frames = [con.sql(f"SELECT * FROM '{f}'").df() for f in sorted(files)]
    return pd.concat(frames, ignore_index=True)

def canon(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    n_ok = n_bad = 0
    report = {}
    for name in names:
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"FAIL {name}: no spark output"); n_bad += 1
            report[name] = {"status": "FAIL", "err": "no spark output"}
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(spark_df)} rows (no oracle)")
            report[name] = {"status": "ROWS", "rows": len(spark_df),
                            "err": "no_oracle"}
            continue
        try:
            ora = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_bad += 1
            report[name] = {"status": "FAIL", "err": f"oracle error: {e}"}
            continue
        s, o = canon(spark_df), canon(ora)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} oracle={list(o.columns)}")
            report[name] = {"status": "FAIL", "err": "schema mismatch"}
            n_bad += 1; continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}")
            report[name] = {"status": "FAIL",
                            "err": f"rows spark={len(s)} oracle={len(o)}"}
            n_bad += 1; continue
        if len(s) == 0:
            print(f"WARN {name}: ok but EMPTY (weak test)"); n_ok += 1
            report[name] = {"status": "OK", "rows": 0, "note": "empty"}
            continue
        bad = None
        for col in s.columns:
            sv, ov = s[col], o[col]
            neq = ~((sv == ov) | (sv.isna() & ov.isna()))
            if neq.any():
                i = int(neq.idxmax())
                bad = (col, i, sv[i], ov[i])
                break
        if bad:
            col, i, a, b = bad
            print(f"FAIL {name}: col={col} row={i} spark={a!r} oracle={b!r}")
            report[name] = {"status": "FAIL",
                            "err": f"col={col} row={i} spark={a!r} oracle={b!r}"}
            n_bad += 1
        else:
            print(f"OK   {name}: {len(s)} rows")
            report[name] = {"status": "OK", "rows": len(s),
                            "match": "rows+schema+hash"}
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad, {len(names)} total")
    # optional CORRECTNESS-style artifact (the r15 verdict #1 receipt):
    # third argv = path to write a per-query JSON of this sweep
    if len(sys.argv) > 3:
        with open(sys.argv[3], "w") as f:
            json.dump({"sf_dir": sfdir, "n_ok": n_ok, "n_bad": n_bad,
                       "n_total": len(names), "queries": report}, f, indent=1)
        print(f"wrote {sys.argv[3]}")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
