#!/usr/bin/env python
"""One-command closing gate (r9 VERDICT ask #8): the round-close
checklist that used to be three manual runs, machine-checkable and
nonzero-on-failure:

1. full-registry sf0.01 mirror (``tools/mirror_sf001.py --all``) —
   every registered query vs its DuckDB oracle (rows-only entries
   smoke-executed);
2. negative-zero scan (``tools/negzero_scan.py``) — flags latent
   '-0' vs '0' value-hash flakes in either engine's output;
3. leak-pattern grep over the tracked source tree — credential
   shapes, cloud-bucket URIs, and non-public URLs (allowlist:
   public docs/paper hosts used in citations).

Usage:
  python tools/gate.py            # all three, summary JSON line
  python tools/gate.py --skip-mirror   # grep+negzero only (fast)

Exit status: 0 iff every section passed.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: credential / endpoint shapes that must never appear in a public repo
LEAK_PATTERNS = [
    (r"AKIA[0-9A-Z]{16}", "aws-access-key"),
    (r"-----BEGIN [A-Z ]*PRIVATE KEY-----", "private-key"),
    (r"ghp_[A-Za-z0-9]{36}", "github-token"),
    (r"xox[baprs]-[A-Za-z0-9-]{10,}", "slack-token"),
    (r"s3://[A-Za-z0-9._-]+", "s3-bucket"),
    (r"gs://[A-Za-z0-9._-]+", "gcs-bucket"),
    (r"wasbs?://[A-Za-z0-9._-]+", "azure-blob"),
    (r"jdbc:[a-z]+://[^\s\"']+", "jdbc-endpoint"),
]

#: public hosts that legitimately appear in citations/docstrings.
#: Exact-host / registered-suffix matching on the PARSED host (r10
#: ADVICE: the old regex prefix-match let 'apacheevil.example' or
#: 'github.evil.io' through); an allowed suffix must align on a dot
#: boundary ('spark.apache.org' yes, 'notapache.org' no).
URL_ALLOW_HOSTS = {
    "localhost",
    "127.0.0.1",
    "apache.org",
    "arxiv.org",
    "github.com",
    "githubusercontent.com",
    "duckdb.org",
    "python.org",
    "pypi.org",
    "postgresql.org",
    "wikipedia.org",
    "w3.org",
    "ietf.org",
    "rfc-editor.org",
    "aclanthology.org",
    "openreview.net",
    "jmlr.org",
    "acm.org",
    "ieee.org",
    "nist.gov",
}
URL_ANY = re.compile(r"https?://[^\s\"')]+")


def url_allowed(url: str) -> bool:
    from urllib.parse import urlparse

    try:
        host = (urlparse(url).hostname or "").lower()
    except ValueError:
        return False
    return any(
        host == allow or host.endswith("." + allow) for allow in URL_ALLOW_HOSTS
    )


def grep_leaks() -> list[dict]:
    tracked = subprocess.run(
        ["git", "ls-files", "*.py", "*.md", "*.json", "*.toml", "*.cfg"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    hits = []
    for rel in tracked:
        # judge-authored round artifacts quote ADVERSARIAL EXAMPLES
        # (e.g. r10 ADVICE cites 'apacheevil.example' to describe the
        # old prefix-match weakness) — the gate polices the BUILDER's
        # files, not the judge's own text
        if rel in ("ADVICE.md", "VERDICT.md"):
            continue
        path = os.path.join(REPO, rel)
        try:
            text = open(path, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        for pat, label in LEAK_PATTERNS:
            for m in re.finditer(pat, text):
                hits.append({"file": rel, "kind": label, "match": m.group(0)[:60]})
        for m in URL_ANY.finditer(text):
            if not url_allowed(m.group(0)):
                hits.append(
                    {"file": rel, "kind": "non-public-url", "match": m.group(0)[:80]}
                )
    return hits


#: one mirror result line, e.g.
#: "OK q1_pricing_summary: rows 6/6 schema=True values=True"
#: "ROWS-ONLY m11_stationarity_tests: 150 rows"
_MIRROR_LINE = re.compile(
    r"^(OK|FAIL|ERROR|VACUOUS|ROWS-ONLY)\s+(\S+?):?\s+(.*)$"
)
_ROWS_PAIR = re.compile(r"rows (\d+)/(\d+)")
_ROWS_ONLY = re.compile(r"^(\d+) rows")


def parse_mirror(lines: list[str]) -> dict[str, dict]:
    """Per-query records from the mirror's stdout — the
    machine-readable verification-coverage table GATE_rN.json carries
    (r11 VERDICT ask #6: the '276 checked, 0 failing' tally lived
    only in prose, so judges could not diff coverage across rounds)."""
    out: dict[str, dict] = {}
    for ln in lines:
        m = _MIRROR_LINE.match(ln)
        if not m:
            continue
        status, name, rest = m.groups()
        rec: dict = {"status": status}
        pair = _ROWS_PAIR.search(rest)
        if pair:
            rec["spark_rows"] = int(pair.group(1))
            rec["oracle_rows"] = int(pair.group(2))
        else:
            solo = _ROWS_ONLY.match(rest)
            if solo:
                rec["spark_rows"] = int(solo.group(1))
        if status not in ("OK", "ROWS-ONLY"):
            rec["detail"] = rest[:160]
        out[name] = rec
    return out


def run_mirror() -> tuple[bool, str, dict[str, dict]]:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "mirror_sf001.py"), "--all"],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    lines = (proc.stdout or "").strip().splitlines()
    tail = lines[-1] if lines else ""
    # surface the actual failing rows (r11: a FAIL tally without the
    # names forced a full 12-min re-run just to learn WHICH query)
    bad = [
        ln
        for ln in lines
        if ln.startswith(("FAIL ", "ERROR ", "VACUOUS "))
    ]
    if bad:
        tail += " | " + "; ".join(b[:120] for b in bad[:10])
    return proc.returncode == 0, tail, parse_mirror(lines)


def run_negzero() -> tuple[bool, str]:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "negzero_scan.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    out = proc.stdout or ""
    flagged_line = next(
        (ln for ln in out.splitlines() if ln.startswith("flagged:")), "flagged: ?"
    )
    ok = proc.returncode == 0 and flagged_line.strip() == "flagged: []"
    return ok, flagged_line.strip()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-mirror", action="store_true")
    ap.add_argument("--skip-negzero", action="store_true")
    ap.add_argument(
        "--out",
        default=None,
        help="write the full summary (incl. per-query mirror rows) to "
        "this JSON file — commit GATE_r<N>.json at round close (r11 "
        "VERDICT ask #6)",
    )
    args = ap.parse_args()

    summary: dict = {}
    ok = True

    leaks = grep_leaks()
    summary["leak_hits"] = leaks
    if leaks:
        ok = False

    if not args.skip_negzero:
        nz_ok, nz = run_negzero()
        summary["negzero"] = nz
        ok = ok and nz_ok

    queries: dict[str, dict] = {}
    if not args.skip_mirror:
        m_ok, tally, queries = run_mirror()
        summary["mirror"] = tally
        ok = ok and m_ok
        # coverage-completeness assertion (r12 VERDICT ask #5 / "what's
        # wrong" #3's ordering gap): a registration the mirror did not
        # cover must be IMPOSSIBLE, not merely unlikely — GATE_r12.json
        # silently missed text_bpe_token_budget because post-close
        # commits landed after the gate ran.
        sys.path.insert(0, REPO)
        from commodity_price_forecasting_spark.plans.registry import load_all

        registered = set(load_all())
        covered = set(queries)
        summary["n_registered"] = len(registered)
        if registered != covered:
            summary["uncovered_registrations"] = sorted(registered - covered)
            summary["unknown_mirror_rows"] = sorted(covered - registered)
            ok = False

    summary["gate"] = "PASS" if ok else "FAIL"
    # the artifact must be provably ORDERED against the history it
    # covers (r12's gate silently predated the round's last commits;
    # r13's first re-run produced a byte-identical file, leaving no
    # committed evidence it ran at HEAD): record the commit the gate
    # ran against — everything up to and including it is covered, and
    # the artifact's own commit should add nothing else.
    summary["git_head"] = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=REPO, capture_output=True,
        text=True,
    ).stdout.strip()
    if args.out:
        full = dict(summary)
        full["queries"] = queries
        full["n_queries"] = len(queries)
        with open(os.path.join(REPO, args.out), "w") as fh:
            json.dump(full, fh, indent=1, sort_keys=True)
    # stdout stays the compact line (per-query table goes to --out)
    print(json.dumps(summary))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
