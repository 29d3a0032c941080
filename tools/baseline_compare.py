#!/usr/bin/env python3
"""Diff a Verify output dir against the committed canonical-hash
baseline (tools/baseline_sf001_hashes.json, written at the end of a
round from a fully gate-green run at sf0.01).

Usage: python3 tools/baseline_compare.py [verify_out_dir] [baseline.json]
       python3 tools/baseline_compare.py [verify_out_dir] [baseline.json] --write
         (regenerate the baseline from a gate-green run — do this at
          every round's green close so the discriminator stays fresh)

Purpose: when a future driver gate reds a query, this answers "did the
SPARK OUTPUT move since the last green round, or did the oracle
environment move?" — a changed hash with unchanged code means the
driver regenerated the testdata; an unchanged hash with a driver red
means the divergence is oracle-side (DuckDB version / canonicalization).
Rows-only queries are covered too (they have hashes but no oracle).
"""
import sys, json, glob, hashlib
import pandas as pd

args = [a for a in sys.argv[1:] if a != "--write"]
WRITE = "--write" in sys.argv
OUT_DIR = args[0] if len(args) > 0 else "/tmp/verify_out"
BASE = args[1] if len(args) > 1 else "tools/baseline_sf001_hashes.json"

base = json.load(open(BASE)) if not WRITE else {}
fresh = {}
same, moved, missing, new = [], [], [], []
for d in sorted(glob.glob(f"{OUT_DIR}/*")):
    name = d.split("/")[-1]
    if name.endswith(".json"):
        continue
    files = sorted(glob.glob(f"{d}/*.parquet"))
    if not files:
        continue
    df = pd.concat([pd.read_parquet(f) for f in files])
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    h = hashlib.md5()
    h.update(("|".join(f"{c}:{df[c].dtype}" for c in df.columns)).encode())
    h.update(df.to_csv(index=False, float_format="%.10g").encode())
    got = {"rows": len(df), "md5": h.hexdigest()}
    fresh[name] = got
    want = base.get(name)
    if want is None:
        new.append(name)
    elif want == got:
        same.append(name)
    else:
        moved.append((name, want, got))
for name in base:
    if not glob.glob(f"{OUT_DIR}/{name}/*.parquet"):
        missing.append(name)

print(f"UNCHANGED {len(same)}/{len(base)}")
for name, want, got in moved:
    print(f"MOVED {name}: baseline rows={want['rows']} md5={want['md5'][:12]}"
          f" -> rows={got['rows']} md5={got['md5'][:12]}")
for name in new:
    print(f"NEW {name} (not in baseline)")
for name in missing:
    print(f"MISSING {name} (in baseline, not in {OUT_DIR})")
if WRITE:
    with open(BASE, "w") as f:
        json.dump(fresh, f, indent=0, sort_keys=True)
    print(f"WROTE {BASE}: {len(fresh)} query hashes from {OUT_DIR}")
