#!/usr/bin/env python3
"""Assert that the repo's public counts agree with the code.

Checks (exit 1 on any drift):
  1. The query inventory: distinct `Q("qNNN_...")` declarations in
     src/main/scala vs every count claimed in README.md ("maps N
     names", "Current gate: **N pass").
  2. README's test count ("M suites, N tests") vs the actual totals.
     Source of truth, in priority order: `--tests N` / `--suites M`
     flags (copy from the latest full `sbt test` summary line), else
     tools/last_test_run.txt — a one-line record of that summary
     ("Tests: succeeded N ..." + "Suites: completed M ..." verbatim,
     or just "M suites, N tests") refreshed whenever the full suite
     runs. With the record file present the check is ALWAYS on, so
     the README count cannot silently drift between full runs.
  3. No raw control bytes in .scala sources (a stray NUL flips git
     and grep into binary mode and hides the file from text tooling).

Usage: python3 tools/check_counts.py [--tests N] [--suites M]
"""
import argparse
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def declared_queries():
    names = set()
    for dirpath, _, files in os.walk(os.path.join(ROOT, "src", "main", "scala")):
        for f in files:
            if not f.endswith(".scala"):
                continue
            with open(os.path.join(dirpath, f), encoding="utf-8") as fh:
                names.update(re.findall(r'Q\("(q\d+[A-Za-z0-9_]*)"', fh.read()))
    return names


def control_byte_files():
    bad = []
    for sub in ("main", "test"):
        for dirpath, _, files in os.walk(os.path.join(ROOT, "src", sub)):
            for f in files:
                if not f.endswith(".scala"):
                    continue
                p = os.path.join(dirpath, f)
                with open(p, "rb") as fh:
                    data = fh.read()
                if any(b < 9 or b in (11, 12) or 13 < b < 32 for b in data):
                    bad.append(os.path.relpath(p, ROOT))
    return bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tests", type=int, default=None)
    ap.add_argument("--suites", type=int, default=None)
    args = ap.parse_args()

    failures = []
    queries = declared_queries()
    n = len(queries)
    print(f"declared queries in src/main: {n}")

    with open(os.path.join(ROOT, "README.md"), encoding="utf-8") as fh:
        readme = fh.read()

    m = re.search(r"maps (\d+) names", readme)
    if m and int(m.group(1)) != n:
        failures.append(f"README 'maps {m.group(1)} names' != {n} declared")
    m = re.search(r"Current gate: \*\*(\d+) pass", readme)
    if m and int(m.group(1)) != n:
        failures.append(f"README 'Current gate: {m.group(1)} pass' != {n} declared")

    # fall back to the recorded last full-suite summary so the test
    # count is ALWAYS checked, not only when someone passes --tests
    actual_tests, actual_suites = args.tests, args.suites
    rec_path = os.path.join(ROOT, "tools", "last_test_run.txt")
    if (actual_tests is None or actual_suites is None) and os.path.exists(rec_path):
        with open(rec_path, encoding="utf-8") as fh:
            rec = fh.read()
        mt = re.search(r"Tests:\s*succeeded\s*(\d+)", rec) or \
            re.search(r"(\d+)\s*tests", rec)
        ms = re.search(r"Suites:\s*completed\s*(\d+)", rec) or \
            re.search(r"(\d+)\s*suites", rec)
        if actual_tests is None and mt:
            actual_tests = int(mt.group(1))
        if actual_suites is None and ms:
            actual_suites = int(ms.group(1))

    m = re.search(r"(\d+) suites, (\d+) tests", readme)
    if m:
        suites, tests = int(m.group(1)), int(m.group(2))
        if actual_tests is not None and actual_tests != tests:
            failures.append(f"README claims {tests} tests, actual {actual_tests}")
        if actual_suites is not None and actual_suites != suites:
            failures.append(f"README claims {suites} suites, actual {actual_suites}")

    bad = control_byte_files()
    if bad:
        failures.append(f"raw control bytes in: {', '.join(bad)}")

    for f in failures:
        print(f"DRIFT: {f}")
    if not failures:
        print("all counts consistent")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
