#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf0.01 tables, load the Spark-written parquet for the same
key, sort columns by name + rows by value, and compare. Builder-side tool
only (driver-side python libs are allowed for validation, not for the
engine itself).

Two hardenings after round 5's driver-red/replica-green split:
- DTYPE STRICTNESS: an int64-vs-float64 column pair (the classic DuckDB
  HUGEINT -> pandas float64 canonicalization of an uncast sum()) is a
  FAILURE here even when the values compare equal, because the driver's
  value hash serializes `5` and `5.0` differently.
- DIVERGENCE ARTIFACTS: any mismatch persists both sides' canonical rows
  and the per-column first-diff to OUT_DIR/_diff_<name>.json, so a
  driver-side-only failure next round is diagnosable from the artifact.
"""
import sys, json, glob
import duckdb
import numpy as np
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def dump_diff(name, w, g, diffs):
    """Persist both canonical sides (capped) + the per-column first-diff."""
    try:
        art = {
            "query": name,
            "diffs": diffs,
            "oracle_dtypes": {c: str(w[c].dtype) for c in w.columns},
            "spark_dtypes": {c: str(g[c].dtype) for c in g.columns},
            "oracle_rows": json.loads(w.head(200).to_json(orient="records")),
            "spark_rows": json.loads(g.head(200).to_json(orient="records")),
        }
        with open(f"{OUT_DIR}/_diff_{name}.json", "w") as f:
            json.dump(art, f, indent=1, default=str)
    except Exception as e:  # diagnostics must never mask the verdict
        print(f"  (diff artifact for {name} failed: {e})")

ok, bad = [], []
for name, sql in sorted(oracle.items()):
    try:
        want = con.execute(sql).df()
        got = pd.concat([pd.read_parquet(f) for f in
                         sorted(glob.glob(f"{OUT_DIR}/{name}/*.parquet"))])
        w, g = canon(want), canon(got)
        if list(w.columns) != list(g.columns):
            bad.append((name, f"columns differ: oracle={list(w.columns)} spark={list(g.columns)}"))
            dump_diff(name, w, g, ["column sets differ"])
            continue
        if len(w) != len(g):
            bad.append((name, f"row count differs: oracle={len(w)} spark={len(g)}"))
            dump_diff(name, w, g, ["row counts differ"])
            continue
        diffs = []
        for c in w.columns:
            wv, gv = w[c], g[c]
            wf, gf = wv.dtype.kind == 'f', gv.dtype.kind == 'f'
            if wf != gf:
                diffs.append(
                    f"col {c}: DTYPE oracle={wv.dtype} vs spark={gv.dtype} "
                    f"(driver hashes 5 vs 5.0 differently — CAST the oracle)")
                continue
            if wf or gf:
                # SIGNBIT STRICTNESS (round-6 hardening): the driver's
                # value hash serializes -0.0 and 0.0 differently, but
                # (wv == gv) treats them as equal — exactly the
                # evt_cuped r6 blind spot. Restrict to float dtypes and
                # flag any zero whose sign differs between the sides.
                sign_neq = (np.signbit(wv.fillna(0.0).to_numpy())
                            != np.signbit(gv.fillna(0.0).to_numpy()))
                neq = ~((wv.isna() & gv.isna()) | (wv == gv)) | sign_neq
            else:
                neq = wv.astype(str) != gv.astype(str)
            if neq.any():
                i = neq.idxmax()
                diffs.append(f"col {c}: {int(neq.sum())} diffs, first at row {i}: oracle={wv[i]!r} spark={gv[i]!r}")
        if diffs:
            bad.append((name, "; ".join(diffs)))
            dump_diff(name, w, g, diffs)
        else:
            ok.append(name)
    except Exception as e:
        bad.append((name, f"EXC {type(e).__name__}: {e}"))

print(f"PASS {len(ok)}/{len(oracle)}: {' '.join(ok)}")
for name, msg in bad:
    print(f"FAIL {name}: {msg[:400]}")
# rows-only keys
rows_only = [k for k in glob.glob(f"{OUT_DIR}/*") if k.split('/')[-1] not in oracle
             and not k.endswith('.json')]
for k in sorted(rows_only):
    n = sum(len(pd.read_parquet(f)) for f in glob.glob(f"{k}/*.parquet"))
    print(f"ROWS-ONLY {k.split('/')[-1]}: {n} rows")
