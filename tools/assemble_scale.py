#!/usr/bin/env python3
"""Assemble SCALE_r{N}.json from per-run BenchScale JSON lines.

Each input is one `{"metric":"scale_curve","points":[...],...}` line
(BenchScale writes target/bench_sf1.json per invocation; the runner
copies each to a stable path). Output keeps every run's own loadavg
stamps — the curve is graded on RATIOS across points, and a per-run
stamp makes host state self-evidencing per the round-12 advice.

Usage: assemble_scale.py OUT ROUND RUN1.json [RUN2.json ...]
"""
import json
import subprocess
import sys
import time


def main() -> None:
    out, rnd, *runs = sys.argv[1:]
    merged = {
        "metric": "scale_curve",
        "round": int(rnd),
        "run_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "commit": subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True
        ).stdout.strip(),
        "runs": [],
    }
    for path in runs:
        with open(path) as f:
            merged["runs"].append(json.load(f))
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
        f.write("\n")
    print(f"wrote {out}: {len(merged['runs'])} runs, "
          f"{sum(len(r['points']) for r in merged['runs'])} points")


if __name__ == "__main__":
    main()
