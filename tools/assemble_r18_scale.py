#!/usr/bin/env python3
"""Assemble SCALE_r18.json from the round-18 gated probe runs.

Inputs (all produced under tools/capture_clean.sh's idle gate):
  - target/scale_r18_sf10_run.json   BenchScale sf10 decade, pre-touched
                                     XMS=XMX=48g, window_dirty:false
  - target/bm25_scale_r18_runA.log   Bm25Scale full grid (sf0.1 + sf1)
  - target/bm25_scale_r18b.log       Bm25Scale sf1-only re-run
  - target/ccbench_r18{,b,c}.log     gated pre-touched CcBench series

The cc run records every gated attempt's walls plus the launch-gate
evidence (loadavg + calib at exec, from target/capture_attempts.log);
the bm25 runs are spliced verbatim from each log's final JSON line so
their own window stamps ride along.
"""
import json
import re
import subprocess
import sys
import time

WALL = re.compile(r"CCBENCH rep=(\d+) nodes=\d+ rounds=(\d+) wall=([\d.]+)")


def cc_walls(path):
    walls, rounds = [], None
    with open(path) as f:
        for line in f:
            m = WALL.search(line)
            if m:
                walls.append(float(m.group(3)))
                rounds = int(m.group(2))
    return walls, rounds


CURCOLD = re.compile(
    r"CURCOLD pass=(\d+) stage=(\w+) wall=([\d.]+)"
    r" runSec=([\d.]+) gcSec=([\d.]+) spillMemMB=(\d+)"
    r" spillDiskMB=(\d+) shufWriteMB=(\d+) shufReadMB=(\d+)")


def parse_curcold(path):
    passes, meta = {}, []
    with open(path) as f:
        for line in f:
            m = CURCOLD.search(line)
            if m:
                passes.setdefault(int(m.group(1)), []).append({
                    "stage": m.group(2), "wall_sec": float(m.group(3)),
                    "run_sec": float(m.group(4)),
                    "gc_sec": float(m.group(5)),
                    "spill_mem_mb": int(m.group(6)),
                    "spill_disk_mb": int(m.group(7)),
                    "shuffle_write_mb": int(m.group(8)),
                    "shuffle_read_mb": int(m.group(9))})
            elif line.startswith('{"metric":"curation_cold'):
                meta.append(json.loads(line.strip()))
    return {"metric": "curation_cold_probe", "log": path,
            "passes": [{"pass": p, "stages": sts}
                       for p, sts in sorted(passes.items())],
            "summary_lines": meta}


def last_json_line(path, key):
    out = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith('{"metric":"%s"' % key):
                out = json.loads(line)
    return out


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "SCALE_r18.json"
    runs = []

    with open("target/scale_r18_sf10_run.json") as f:
        runs.append(json.load(f))

    a = last_json_line("target/bm25_scale_r18_runA.log", "bm25_scale")
    a["note"] = (
        "full grid; window_dirty fired on ASYMMETRIC calib drift (end "
        "min-of-N 0.400 FASTER than start 0.513 = start stamp inflated "
        "by the preceding decade run's tail) - a slower-than-true window "
        "only understates the capped-vs-uncapped flattening claimed")
    runs.append(a)
    b = last_json_line("target/bm25_scale_r18b.log", "bm25_scale")
    b["note"] = "sf1-only re-run in a fresh gated window (dense-cell check)"
    runs.append(b)

    attempts = []
    for log, reps in (("target/ccbench_r18.log", 4),
                      ("target/ccbench_r18b.log", 8),
                      ("target/ccbench_r18c.log", 12),
                      ("target/ccbench_r18d.log", 8)):
        walls, rounds = cc_walls(log)
        attempts.append({"log": log, "reps": reps, "rounds": rounds,
                         "walls": walls})
    runs.append({
        "metric": "cc_gated_attempts",
        "graph": "cc_star_2m5_scrambled",
        "tool": "graft.tools.CcBench",
        "heap": "XMX=16g XMS=16g AlwaysPreTouch",
        "gate": "tools/capture_clean.sh idle gate (calib-stable probe "
                "first, two settled loadavg polls < 1.0, pre-JVM stamp)",
        "gate_log": open("target/capture_attempts.log").read()
            .strip().splitlines(),
        "attempts": attempts,
        "note": "r17 verdict #3 closing evidence: with SCALE_r17 run 7's "
                "undisturbed window (19.10/9.56/9.45/8.89 - the touch), "
                "five gated pre-touched windows exist; none after it "
                "yields a settled 3-rep median <= 9 s (best 9.28, reps "
                "6-8 of the first 8-rep series; the last window's best "
                "single wall 8.106 is the all-time min but its medians "
                "sit 9.56-9.88); settled medians 9.3-11.8 s all hold "
                "the <= 12 s re-baseline, which stands as FINAL",
    })

    cap = parse_curcold("target/curcold_r18_capped.log")
    cap["heap"] = "XMX=48g XMS=48g AlwaysPreTouch"
    cap["note"] = (
        "q138's CAPPED pipeline decomposed per stage at sf10 (idle-"
        "gated entry, loadavg 0.75 pre-JVM; the in-JVM 20.5 stamp is "
        "the 48 GB pre-touch): the capped lsh_verify stage runs "
        "15.8/13.9 s - 9x cheaper than the uncapped ~147 s (SCALE_r17 "
        "pre-touched probe) - and the ENTIRE q138-vs-q127 premium is "
        "the containment stage verifying the cap-deferred suffix-"
        "perturbed 100-member families: 177.4 s pass 1 (83% of the "
        "213.8 s total) with 31.2 GB mem-spill / 2.9 GB disk-spill / "
        "4.0 GB shuffle vs 6.9-27.7 s on uncapped survivors. Pass 2's "
        "276 s hit a mid-run burst (loadavg 23 at end); the "
        "attribution stands on the spill/shuffle volumes, which are "
        "workload-determined. Guidance: arming the LSH cap moves the "
        "deferred-family cost into containment's guarded-but-spilling "
        "verify - size executor scratch for it, or tighten "
        "maxShingleDf. Candidate r19 lever (corrected against the "
        "verify's cost shape - the spill is verification-side, in the "
        "candidate distinct + per-pair shared-hash count over the "
        "exploded stream, NOT in the output pairs): a per-probe-doc "
        "candidate cap - bound each contained-side doc to its top-N "
        "index matches by shared-probe-hash count before verification; "
        "for the report's loser decision one true container suffices.")
    runs.append(cap)

    runs.append({
        "metric": "containment_candidate_cap_ab",
        "knob": "spark.graft.dedup.containmentMaxCandidates (r18, "
                "default 0 = off)",
        "semantics": "per-contained-doc top-N candidates by shared-"
                     "probe-hash count, ties by lower container id, "
                     "applied before the exact verify on both tiers; "
                     "spec-pinned (TextModelSpec 'candidate cap "
                     "semantics')",
        "sf1_ab": {
            "uncapped": {"cont_pairs": 148918, "cont_losers": 13226,
                         "containment_wall_sec": 8.76,
                         "shuffle_write_mb": 3,
                         "log": "target/curcold_r18_sf1_cc0.log"},
            "cap32": {"cont_pairs": 148684, "cont_losers": 13226,
                      "containment_wall_sec": 10.19,
                      "shuffle_write_mb": 169,
                      "log": "target/curcold_r18_sf1_cc32.log"},
            "reading": "loser SET preserved exactly (13226 == 13226; "
                       "234 redundant pairs capped away); on the "
                       "broadcast tier the cap's rank exchange adds "
                       "169 MB of shuffle to a zero-exchange stream "
                       "and costs 1.4 s - arm it only where the "
                       "verify is the bottleneck, as documented"},
        "sf10_attempt": {
            "log": "target/curcold_r18_capped_cc32.log",
            "outcome": "ENOSPC after ~11 min in the containment "
                       "stage: the window-rank top-N sorts the full "
                       "distinct-candidate stream and its exchange + "
                       "sort spill (~79 GB written) stack on the "
                       "verify's own waves OUTSIDE the bounded-"
                       "scratch wave-sizing model (capPairs runs "
                       "inside countVerified, invisible to the "
                       "sampled estimate). The uncapped run "
                       "completes the same stage in 177 s with "
                       "~7 GB on disk.",
            "verdict": "lever NOT usable at the target decade as "
                       "integrated; left default-off. r19 path: "
                       "replace the window rank with a per-partition "
                       "heap top-N (the bm25_retrieve pattern - "
                       "O(n log N) streaming, no full sort, no "
                       "second exchange) and fold the cap's volume "
                       "into the wave estimate."},
    })

    merged = {
        "metric": "scale_evidence",
        "round": 18,
        "run_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "commit": subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True
        ).stdout.strip(),
        "runs": runs,
    }
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
        f.write("\n")
    print(f"wrote {out}: {len(runs)} runs")


if __name__ == "__main__":
    main()
