#!/usr/bin/env python3
"""Repo-side leak check with a self-evidencing stamp.

Greps src/ and build.sbt for the same categories the driver's LEAKCHECK
covers (proprietary imports, internal URLs/buckets/env vars, slack
links, API keys) and writes LEAKCHECK_LOCAL_r{N}.json stamped with the
run's UTC time and HEAD commit — so an artifact that only bumps its
round number is distinguishable from a fresh run (round-12 advice).

Usage: python3 tools/leakcheck.py <round>
"""
import json, re, subprocess, sys, datetime, pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent
PATTERNS = {
    "internal-import": r"import\s+(com\.anthropic|ant\.|anthropic\.)",
    "internal-url": r"https?://[a-z0-9.-]*\b(anthropic|ant-internal|corp)\b",
    "internal-pkg2": r"\b(claude[-_]cli|claude[-_]code)\b",
    "internal-bucket": r"\b(s3|gs)://[a-z0-9.-]*\b(ant|anthropic|internal)\b",
    "slack-link": r"(slack\.com/archives|#claude-)",
    "api-key": r"\b(sk-ant-|ANTHROPIC_API_KEY)\b",
    "axon-env": r"\bAXON_[A-Z_]+\b",
}

def scan():
    hits = {k: [] for k in PATTERNS}
    targets = list((ROOT / "src").rglob("*.scala")) + [ROOT / "build.sbt"]
    for f in targets:
        try:
            text = f.read_text(errors="replace")
        except OSError:
            continue
        for i, line in enumerate(text.splitlines(), 1):
            for key, pat in PATTERNS.items():
                if re.search(pat, line, re.IGNORECASE):
                    hits[key].append(f"{f.relative_to(ROOT)}:{i}")
    return hits

def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hits = scan()
    commit = subprocess.run(["git", "rev-parse", "HEAD"], cwd=ROOT,
                            capture_output=True, text=True).stdout.strip()
    out = {
        "round": rnd,
        "run_utc": datetime.datetime.now(datetime.timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "commit": commit,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    path = ROOT / f"LEAKCHECK_LOCAL_r{rnd}.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(f"{path.name}: n_hits={out['n_hits']} commit={commit[:12]}")

if __name__ == "__main__":
    main()
