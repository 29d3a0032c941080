#!/usr/bin/env python3
"""Tabulate the r12 probe JSONs (planted_* / reg_* in /tmp/graft_scale_r12)
into the PLANS.md markdown table: warm seconds per key per multiple."""
import json, glob, os, sys

G = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_scale_r12"
rows = {}
for f in sorted(glob.glob(f"{G}/*_x*_*.json")):
    base = os.path.basename(f)[:-5]
    mode, mult, key = base.split("_", 2)
    try:
        d = json.load(open(f))
        warm = d.get("warm", {}).get(key)
        cold = d.get("queries", {}).get(key)
    except Exception as e:
        warm, cold = f"ERR {e}", None
    rows.setdefault((mode, key), {})[mult] = (warm, cold)

for (mode, key), m in sorted(rows.items()):
    parts = []
    for mult in ("x1", "x100", "x300"):
        if mult in m:
            w, c = m[mult]
            parts.append(f"{mult}: warm={w} cold={c}")
    print(f"{mode:8s} {key:26s} " + " | ".join(parts))
