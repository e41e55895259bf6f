#!/usr/bin/env python3
"""Assemble SCALE_r17.json from the round-17 probe logs.

Inputs are the raw probe logs (CurationColdProbe / Bm25Scale stdout)
plus prebuilt JSON fragments; each CURCOLD line's task-metric fields
are parsed into the run so the committed artifact carries the
mechanism numbers (runSec/gcSec/spill/shuffle), not just walls.

Usage: assemble_r17_scale.py OUT [name=path ...]
  name=curcold:<path>  parse a CurationColdProbe log
  name=json:<path>     splice a file of JSON lines/objects verbatim
"""
import json
import re
import subprocess
import sys
import time

CURCOLD = re.compile(
    r"CURCOLD pass=(\d+) stage=(\w+) wall=([\d.]+)"
    r"(?: runSec=([\d.]+) gcSec=([\d.]+) spillMemMB=(\d+)"
    r" spillDiskMB=(\d+) shufWriteMB=(\d+) shufReadMB=(\d+))?")


def parse_curcold(path):
    passes = {}
    meta = []
    with open(path) as f:
        for line in f:
            m = CURCOLD.search(line)
            if m:
                p = int(m.group(1))
                st = {"stage": m.group(2), "wall_sec": float(m.group(3))}
                if m.group(4) is not None:
                    st.update(run_sec=float(m.group(4)),
                              gc_sec=float(m.group(5)),
                              spill_mem_mb=int(m.group(6)),
                              spill_disk_mb=int(m.group(7)),
                              shuffle_write_mb=int(m.group(8)),
                              shuffle_read_mb=int(m.group(9)))
                passes.setdefault(p, []).append(st)
            elif line.startswith('{"metric":"curation_cold'):
                meta.append(json.loads(line))
    return {"metric": "curation_cold_probe", "log": path,
            "passes": [{"pass": p, "stages": sts}
                       for p, sts in sorted(passes.items())],
            "summary_lines": meta}


def main():
    out, *specs = sys.argv[1:]
    merged = {
        "metric": "scale_evidence",
        "round": 17,
        "run_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "commit": subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True
        ).stdout.strip(),
        "runs": [],
    }
    for spec in specs:
        kind, path = spec.split(":", 1)
        if kind == "curcold":
            merged["runs"].append(parse_curcold(path))
        elif kind == "json":
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if line.startswith("{"):
                        merged["runs"].append(json.loads(line))
        else:
            raise SystemExit(f"unknown kind {kind}")
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
        f.write("\n")
    print(f"wrote {out}: {len(merged['runs'])} runs")


if __name__ == "__main__":
    main()
