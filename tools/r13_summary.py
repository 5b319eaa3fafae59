#!/usr/bin/env python3
"""Render scale_matrix_r13.jsonl as decade tables (SURVEY material).

Usage: python3 tools/r13_summary.py [scale_matrix_r13.jsonl]
"""
import json
import sys
from collections import defaultdict

SF_ORDER = ["sf0.1", "sf1p", "sf10p", "sf100p", "sf1000p", "sf10p_skew50"]


def main(path):
    cells = defaultdict(dict)   # q -> sf -> (value, status, protocol)
    probes = []
    for line in open(path):
        d = json.loads(line)
        if d.get("what", "").startswith("stageprobe"):
            probes.append(d)
            continue
        if "q" not in d:
            continue
        sf = d.get("sf", "").rstrip("/").split("/")[-1]
        v = d.get("median_sec")
        if v is None and isinstance(d.get("r"), dict):
            v = d["r"].get("value")
        cells[d["q"]][sf] = (v, d.get("status"), d.get("protocol"))

    sfs = [s for s in SF_ORDER if any(s in m for m in cells.values())]
    w = max(len(q) for q in cells) if cells else 10
    print(f"{'query':{w}} | " + " | ".join(f"{s:>10}" for s in sfs) + " | x/decade(last)")
    for q in sorted(cells):
        row = []
        vals = []
        for s in sfs:
            v, st, _ = cells[q].get(s, (None, None, None))
            if v is not None:
                row.append(f"{v:10.2f}")
                if s != "sf10p_skew50":
                    vals.append(v)
            elif st:
                row.append(f"{st:>10}")
                vals.append(None)
            else:
                row.append(" " * 10)
        ratio = ""
        real = [v for v in vals if v is not None]
        if len(real) >= 2 and vals[-1] is not None and vals[-2] is not None:
            ratio = f"{vals[-1]/vals[-2]:.1f}x"
        print(f"{q:{w}} | " + " | ".join(row) + f" | {ratio}")
    if probes:
        print("\nstageprobe rows:")
        for p in probes:
            r = p.get("r", {})
            if "stage" in r:
                print(f"  stage {r['stage']:>3}: {r['task_time_ms']/1000.0:9.1f} task-sec  "
                      f"shufR {r['shuffle_read_mb']:9.1f}MB shufW {r['shuffle_write_mb']:9.1f}MB "
                      f"input {r['input_mb']:8.1f}MB spill {r['spill_mb']:8.1f}MB skew {r['skew']}")
            else:
                print(f"  total: {r}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "scale_matrix_r13.jsonl")
