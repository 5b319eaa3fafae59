#!/usr/bin/env python3
"""Render a scale_matrix_*.jsonl as decade tables (SURVEY material).

Usage: python3 tools/r14_summary.py [scale_matrix_r14.jsonl]

Fixes vs r13_summary.py (ADVICE r13): every sf in the rendered column
set appends a placeholder to `vals`, so the x/decade(last) ratio only
prints for genuinely ADJACENT decades (an entirely-absent sf used to
slide the ratio across e.g. sf10p->sf1000p silently), and the skew
layout column is excluded from the ratio in BOTH the value and the
failed-cell branches.
"""
import json
import sys
from collections import defaultdict

SF_ORDER = ["sf0.1", "sf1p", "sf10p", "sf100p", "sf1000p", "sf10p_skew50"]


def main(path):
    cells = defaultdict(dict)   # q -> sf -> (value, status, protocol, extras)
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
        rows = None
        if isinstance(d.get("r"), dict):
            if v is None:
                v = d["r"].get("value")
            rows = (d["r"].get("out_rows") or {}).get(d["q"])
        extras = {k: d[k] for k in ("contract", "layout") if k in d}
        if rows is not None:
            extras["out_rows"] = rows
        cells[d["q"]][sf] = (v, d.get("status"), d.get("protocol"), extras)

    sfs = [s for s in SF_ORDER if any(s in m for m in cells.values())]
    w = max(len(q) for q in cells) if cells else 10
    print(f"{'query':{w}} | " + " | ".join(f"{s:>10}" for s in sfs) +
          " | x/decade(last)")
    notes = []
    for q in sorted(cells):
        row = []
        vals = []
        for s in sfs:
            v, st, _, extras = cells[q].get(s, (None, None, None, {}))
            skew = s == "sf10p_skew50"
            if v is not None:
                row.append(f"{v:10.2f}")
                if not skew:
                    vals.append(v)
            elif st:
                row.append(f"{st:>10}")
                if not skew:
                    vals.append(None)
            else:
                row.append(" " * 10)
                if not skew:
                    vals.append(None)   # placeholder: keeps decades adjacent
            if extras.get("contract"):
                notes.append((q, s, extras))
        ratio = ""
        if len(vals) >= 2 and vals[-1] is not None and vals[-2] is not None:
            ratio = f"{vals[-1]/vals[-2]:.1f}x"
        print(f"{q:{w}} | " + " | ".join(row) + f" | {ratio}")
    for q, s, extras in notes:
        rows = extras.get("out_rows")
        rowstr = f" out_rows={rows}" if rows is not None else ""
        print(f"  note [{q} @ {s}]:{rowstr} {extras['contract']}")
    if probes:
        print("\nstageprobe rows:")
        for p in probes:
            r = p.get("r", {})
            if "stage" in r:
                print(f"  stage {r['stage']:>3}: "
                      f"{r['task_time_ms']/1000.0:9.1f} task-sec  "
                      f"shufR {r['shuffle_read_mb']:9.1f}MB "
                      f"shufW {r['shuffle_write_mb']:9.1f}MB "
                      f"input {r['input_mb']:8.1f}MB "
                      f"spill {r['spill_mb']:8.1f}MB skew {r['skew']}")
            else:
                print(f"  total: {r}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "scale_matrix_r14.jsonl")
