#!/usr/bin/env python3
"""Repo-side leak scan with run provenance: greps the source tree for
the same categories the per-round LEAKCHECK gate reports, and writes
LEAKCHECK.json with a generated-at timestamp and the scanned commit, so
each round's '0 hits' claim is provably fresh (a number-only round bump
is indistinguishable from a stale copy).

Usage: python3 tools/leakcheck.py [ROUND]
"""
import json
import re
import subprocess
import sys
from datetime import datetime, timezone
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

# category -> regex over file content. Matches are reported as
# "path:line: excerpt". The patterns target non-public infrastructure
# references: anything the build could not resolve from the public
# Spark API, this repo, or published papers.
PATTERNS = {
    "internal-import": r"^\s*import\s+(?:com|net|io)\.(?:anthropic|internal|corp)\b",
    "internal-url": r"https?://[\w.-]*(?:internal|corp|intranet)[\w.-]*/",
    "internal-pkg2": r"\b(?:claude-cli-internal|anthropics/)\b",
    "internal-bucket": r"\b(?:s3|gs)://[\w.-]*(?:internal|corp|prod)[\w./-]*",
    "slack-link": r"\bslack\.com/archives/|#claude-code-",
    "api-key": r"\b(?:sk-ant-|AKIA[0-9A-Z]{16}|api[_-]?key\s*[:=]\s*['\"][\w-]{20,})",
    "axon-env": r"\bAXON_[A-Z_]+\b",
}

SCAN_DIRS = ["src", "tools", "build.sbt", "project"]
SKIP_SUFFIXES = {".parquet", ".class", ".jar", ".png", ".jpg"}


def files():
    for entry in SCAN_DIRS:
        p = ROOT / entry
        if p.is_file():
            yield p
        elif p.is_dir():
            for f in p.rglob("*"):
                if f.is_file() and f.suffix not in SKIP_SUFFIXES \
                        and "leakcheck" not in f.name:
                    yield f


def main():
    # the round number is REQUIRED: a defaulted 0 stamps the provenance
    # with the wrong audit round (the r17 ADVICE finding) - fail loudly
    if len(sys.argv) < 2:
        sys.exit("usage: leakcheck.py <round-number>")
    rnd = int(sys.argv[1])
    hits = {k: [] for k in PATTERNS}
    compiled = {k: re.compile(v) for k, v in PATTERNS.items()}
    for f in files():
        try:
            text = f.read_text(errors="replace")
        except OSError:
            continue
        for i, line in enumerate(text.splitlines(), 1):
            for cat, rx in compiled.items():
                if rx.search(line):
                    rel = f.relative_to(ROOT)
                    hits[cat].append(f"{rel}:{i}: {line.strip()[:120]}")
    commit = subprocess.run(
        ["git", "-C", str(ROOT), "rev-parse", "HEAD"],
        capture_output=True, text=True).stdout.strip()
    # LEAKCHECK.json is DRIVER-FORMAT (round/n_hits/hits, no trailing
    # newline): the per-round driver overwrites this file with exactly
    # that shape, so emitting the same bytes keeps `git status` clean
    # after a driver pass. Provenance (generated_at/commit) that the
    # driver would strip lives in the committed sidecar instead.
    out = {
        "round": rnd,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    (ROOT / "LEAKCHECK.json").write_text(json.dumps(out, indent=2))
    prov = {
        "round": rnd,
        "generated_at": datetime.now(timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "commit": commit,
        "n_hits": out["n_hits"],
    }
    (ROOT / "LEAKCHECK_PROVENANCE.json").write_text(
        json.dumps(prov, indent=2) + "\n")
    print(f"LEAKCHECK.json: {out['n_hits']} hits at {commit[:12]}")


if __name__ == "__main__":
    main()
