#!/usr/bin/env python3
"""Derive every stamped count from its artifact and diff against the
docs (VERDICT r11 #7: hand-stamped counts drifted three rounds running
— test counts in r9/r10, bench-row counts in r11; VERDICT r12 #1/#2:
the cross-round comparison sentence diffed a driver re-run instead of
the committed record, and the checker itself read the working-tree
latest.json that the driver's post-commit re-run overwrites).

Facts (never hand-entered):
  bench rows / errors  <- the COMMITTED record the last close-out pins
                          ("as committed at `<sha>`"), because the
                          driver's post-round protocol both overwrites
                          AND commits its own latest.json re-run — so
                          neither the worktree nor HEAD reliably holds
                          the record the stamps describe. Fallback:
                          git show HEAD, then the worktree file.
  registry count       <- <verify_out>/oracle_sql.json   (len(keys))
  test count           <- target/test-reports/TEST-*.xml (sum; 0 fails)

Derived checks:
  - every registry key has a row in the committed bench record
    (r12 advice: a query registered after the record has no reading)
  - the close-out's "vs the round-N record (`<sha>`) on M common rows:
    total A → **B s**, median per-row ratio **R**" sentence is
    RECOMPUTED from `git show <sha>:bench_out/latest.json` vs the
    committed current record — the comparator-provenance drift class
    (VERDICT r12 What's-wrong #1) is now machine-checked
  - test-report staleness: warn when a TEST-*.xml predates the newest
    compiled class (renamed/deleted suites leave stale XMLs that
    inflate the derived test count — r12 advice)

Checked regions (current-claim stamps only — historical round
narratives legitimately carry their own era's numbers):
  README.md   : the "## Status" section
  BASELINE.md : from the LAST "## Round-N close-out" heading to EOF

Usage: python3 tools/doccheck.py [verify_out_dir]   (default /tmp/verify_sf0.01)
Exit 1 on any mismatch. Run AFTER the final `sbt test`, full bench AND
the record commit, so HEAD's artifacts are the ones the stamps describe.
"""
import json
import re
import statistics
import subprocess
import sys
import xml.etree.ElementTree as ET
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def committed_record(ref="HEAD"):
    """The bench record as COMMITTED at `ref` (None if absent there)."""
    try:
        out = subprocess.check_output(
            ["git", "-C", str(REPO), "show", f"{ref}:bench_out/latest.json"],
            stderr=subprocess.DEVNULL)
        return json.loads(out)
    except (subprocess.CalledProcessError, FileNotFoundError,
            json.JSONDecodeError):
        return None


# the close-out pins ITS record's commit: "as committed at `<sha>`".
# The driver's post-round protocol both overwrites AND commits its own
# re-run of latest.json, so neither the worktree nor HEAD reliably
# holds the record the stamps describe — only a pinned ref does.
RECORD_REF = re.compile(r"as committed at `([0-9a-f]{7,40})`")


def fact_bench(baseline_region_text):
    mo = RECORD_REF.search(baseline_region_text)
    refs = ([(mo.group(1), f"pinned `{mo.group(1)}`")] if mo else []) + \
        [("HEAD", "HEAD")]
    d = src = None
    for ref, label in refs:
        d = committed_record(ref)
        if d is not None:
            src = label
            break
    if d is None:  # no committed record yet (first round / fresh repo)
        p = REPO / "bench_out" / "latest.json"
        if not p.is_file():
            return None, None, None, None, None
        d = json.loads(p.read_text())
        src = "worktree"
    return (len(d.get("queries", {})), len(d.get("errors", {})),
            d.get("queries", {}), d.get("excluded"), src)


def fact_registry(verify_out):
    p = Path(verify_out) / "oracle_sql.json"
    if not p.is_file():
        return None, None
    keys = list(json.loads(p.read_text()))
    return len(keys), keys


def fact_tests():
    reports = sorted((REPO / "target" / "test-reports").glob("TEST-*.xml"))
    if not reports:
        return None
    # stale-report guard (r12 advice): an XML older than the newest
    # compiled test class may describe a renamed/deleted suite and
    # inflate the count — warn loudly, don't guess
    classes = list((REPO / "target").glob("scala-*/test-classes/**/*.class"))
    if classes:
        newest_class = max(c.stat().st_mtime for c in classes)
        stale = [r.name for r in reports
                 if r.stat().st_mtime < newest_class - 1.0]
        if stale:
            print(f"WARN {len(stale)} test-report XML(s) predate the newest "
                  f"compiled test class — if a suite was renamed or removed, "
                  f"clean target/test-reports and re-run sbt test: "
                  f"{stale[:4]}{'...' if len(stale) > 4 else ''}")
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

# the cross-round comparator sentence (possibly wrapped across lines):
# "vs the round-N record (`<sha>`) on M common rows: total A → **B s**,
#  median per-row ratio **R**"
CMP = re.compile(
    r"vs the round-\d+ record \(`([0-9a-f]{7,40})`\) on (\d+) common "
    r"rows:\s*total\s*([\d.]+)\s*→\s*\*\*([\d.]+)\s*s\*\*,\s*median "
    r"per-row ratio\s*\*\*([\d.]+)\*\*")


def check_comparator(region_text, cur_queries):
    """Recompute every comparator sentence in the LAST close-out from
    committed records. Returns the number of failures."""
    failed = 0
    for mo in CMP.finditer(region_text):
        sha, n_common, t_prev, t_cur, med = (
            mo.group(1), int(mo.group(2)), float(mo.group(3)),
            float(mo.group(4)), float(mo.group(5)))
        prev = committed_record(sha)
        if prev is None:
            failed += 1
            print(f"FAIL comparator cites `{sha}` but no bench record is "
                  f"committed there")
            continue
        pq = prev.get("queries", {})
        common = sorted(set(pq) & set(cur_queries))
        got_prev = sum(pq[k] for k in common)
        got_cur = sum(cur_queries[k] for k in common)
        ratios = [cur_queries[k] / pq[k] for k in common if pq[k] > 0]
        got_med = statistics.median(ratios) if ratios else float("nan")
        ok = (len(common) == n_common
              and f"{got_prev:.1f}" == f"{t_prev:.1f}"
              and f"{got_cur:.1f}" == f"{t_cur:.1f}"
              and f"{got_med:.3f}" == f"{med:.3f}")
        if ok:
            print(f"OK   comparator vs `{sha}`: {len(common)} rows, "
                  f"{got_prev:.1f} -> {got_cur:.1f}, median {got_med:.3f}")
        else:
            failed += 1
            print(f"FAIL comparator vs `{sha}`: stamped ({n_common} rows, "
                  f"{t_prev} -> {t_cur}, median {med}) but committed records "
                  f"say ({len(common)} rows, {got_prev:.1f} -> {got_cur:.1f}, "
                  f"median {got_med:.3f})")
    return failed


def main():
    verify_out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_sf0.01"
    baseline_lines = region_baseline()
    region_text = "\n".join(ln for _, ln in baseline_lines)
    rows, errs, queries, excluded, src = fact_bench(region_text)
    reg_count, reg_keys = fact_registry(verify_out)
    facts = {"rows": rows, "registry": reg_count, "tests": fact_tests()}
    print("facts:", {k: v for k, v in facts.items()},
          f"(bench errors: {errs}, record source: {src})")
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
        print(f"FAIL committed bench record has {errs} errored rows")
    # every registry key needs a committed bench reading, minus the
    # record's own gate-exclusion list (r12 advice; quadratic oracle
    # validators are excluded by contract and carry b_* twins)
    if queries is not None and reg_keys is not None:
        if excluded is None:
            print("SKIP registry-coverage check: record predates the "
                  "'excluded' artifact field")
        else:
            missing = [k for k in reg_keys
                       if k not in queries and k not in excluded]
            checked += 1
            if missing:
                failed += 1
                print(f"FAIL {len(missing)} registry keys have no row in the "
                      f"committed bench record: {missing[:6]}"
                      f"{'...' if len(missing) > 6 else ''}")
            else:
                print(f"OK   all {len(reg_keys)} registry keys have "
                      f"committed bench rows ({len(excluded)} gate-excluded "
                      f"by the record's own contract list)")
    # comparator sentences in the last close-out, recomputed from git
    if queries is not None:
        cmp_failed = check_comparator(region_text, queries)
        checked += 1 if (cmp_failed or CMP.search(region_text)) else 0
        failed += cmp_failed
    print(f"{checked - failed}/{checked} stamped counts match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
