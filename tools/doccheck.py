#!/usr/bin/env python3
"""Derive every stamped count from its artifact and diff against the
docs (VERDICT r11 #7: hand-stamped counts drifted three rounds running
— test counts in r9/r10, bench-row counts in r11).

Facts (never hand-entered):
  bench rows / errors  <- bench_out/latest.json          (len(queries))
  registry count       <- <verify_out>/oracle_sql.json   (len(keys))
  test count           <- target/test-reports/TEST-*.xml (sum; 0 fails)

Checked regions (current-claim stamps only — historical round
narratives legitimately carry their own era's numbers):
  README.md   : the "## Status" section
  BASELINE.md : from the LAST "## Round-N close-out" heading to EOF

Usage: python3 tools/doccheck.py [verify_out_dir]   (default /tmp/verify_sf0.01)
Exit 1 on any mismatch. Run AFTER the final `sbt test` and full bench
of the round, so the artifacts are the ones the stamps describe.
"""
import json
import re
import sys
import xml.etree.ElementTree as ET
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def fact_bench():
    p = REPO / "bench_out" / "latest.json"
    if not p.is_file():
        return None, None
    d = json.loads(p.read_text())
    return len(d.get("queries", {})), len(d.get("errors", {}))


def fact_registry(verify_out):
    p = Path(verify_out) / "oracle_sql.json"
    if not p.is_file():
        return None
    return len(json.loads(p.read_text()))


def fact_tests():
    reports = sorted((REPO / "target" / "test-reports").glob("TEST-*.xml"))
    if not reports:
        return None
    total = fails = 0
    for r in reports:
        a = ET.parse(r).getroot().attrib
        total += int(a.get("tests", 0))
        fails += int(a.get("failures", 0)) + int(a.get("errors", 0))
    if fails:
        print(f"FAIL test-reports record {fails} failing tests")
        sys.exit(1)
    return total


def region_readme():
    lines = (REPO / "README.md").read_text().splitlines()
    out, inside = [], False
    for i, ln in enumerate(lines):
        if ln.startswith("## Status"):
            inside = True
        elif inside and ln.startswith("## "):
            break
        if inside:
            out.append((f"README.md:{i + 1}", ln))
    return out


def region_baseline():
    lines = (REPO / "BASELINE.md").read_text().splitlines()
    starts = [i for i, ln in enumerate(lines)
              if re.match(r"## Round-\d+ close-out", ln)]
    if not starts:
        return []
    return [(f"BASELINE.md:{i + 1}", lines[i])
            for i in range(starts[-1], len(lines))]


# (claim kind, regex) — matched per region line; every capture must
# equal the kind's fact. "rows" rejects a digit/comma prefix so
# "state = 1,500 rows" can never alias a bench-row stamp.
PATTERNS = [
    # bold-only: current-record stamps are bolded by convention, while
    # unbolded "N rows" sentences describe OTHER artifacts (e.g. a
    # confirmation run) whose row counts legitimately differ
    ("rows", re.compile(r"\*\*(\d+) rows")),
    ("registry", re.compile(r"[Rr]egistry \*\*(\d+)\*?\*? ?(?:oracle)?")),
    ("registry", re.compile(r"(\d+)/(\d+) DuckDB-green")),
    ("registry", re.compile(r"(\d+)/(\d+) (?:queries|DuckDB|driver queries)")),
    ("tests", re.compile(r"(\d+) ScalaTest specs")),
    ("tests", re.compile(r"(\d+) tests green")),
    ("tests", re.compile(r"(\d+)/(\d+) (?:ScalaTest|tests)")),
]


def main():
    verify_out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_sf0.01"
    rows, errs = fact_bench()
    facts = {"rows": rows, "registry": fact_registry(verify_out),
             "tests": fact_tests()}
    print("facts:", {k: v for k, v in facts.items()},
          f"(bench errors: {errs})")
    failed = checked = 0
    for where, ln in region_readme() + region_baseline():
        for kind, pat in PATTERNS:
            for mo in pat.finditer(ln):
                fact = facts[kind]
                if fact is None:
                    print(f"SKIP {where} [{kind}] no artifact: {mo.group(0)!r}")
                    continue
                checked += 1
                vals = [int(g) for g in mo.groups() if g is not None]
                if all(v == fact for v in vals):
                    print(f"OK   {where} [{kind}={fact}] {mo.group(0)!r}")
                else:
                    failed += 1
                    print(f"FAIL {where} [{kind}] stamped {vals}, "
                          f"artifact says {fact}: {ln.strip()!r}")
    if errs:
        failed += 1
        print(f"FAIL bench_out/latest.json records {errs} errored rows")
    print(f"{checked - failed}/{checked} stamped counts match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
