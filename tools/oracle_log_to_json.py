#!/usr/bin/env python3
"""Convert a tools/check_oracle.py log into a committed JSON record
(dev tool, not engine code).

Usage: python3 tools/oracle_log_to_json.py <check_oracle_log> <sf_label>

Emits one JSON document on stdout shaped like the driver's
CORRECTNESS_r{N}.json (per-query pass + row count), so an off-driver
gate run (e.g. the round-16 sf0.1 certification) can be committed in
the same format the judge already reads. FAIL detail lines are folded
into the query's "err" field verbatim.
"""
import json
import re
import sys


def main(log_path, sf_label):
    queries = {}
    cur = None
    for line in open(log_path):
        line = line.rstrip("\n")
        m = re.match(r"PASS (\S+) \((\d+) rows\)", line)
        if m:
            queries[m.group(1)] = {"pass": True, "rows": int(m.group(2)),
                                   "err": None}
            cur = None
            continue
        m = re.match(r"FAIL (\S+): (.*)", line)
        if m:
            cur = m.group(1)
            queries[cur] = {"pass": False, "rows": None, "err": m.group(2)}
            continue
        if cur is not None and line.startswith("  "):
            queries[cur]["err"] += " | " + line.strip()
            continue
        # Any other line ends the FAIL block: without this reset, a later
        # two-space-indented line anywhere in the log (unrelated tool
        # output between queries) would be appended verbatim to the last
        # FAIL entry's err field (r16 ADVICE).
        cur = None
    n_pass = sum(1 for q in queries.values() if q["pass"])
    out = {
        "sf": sf_label,
        "n_queries": len(queries),
        "n_pass": n_pass,
        "n_fail": len(queries) - n_pass,
        "queries": dict(sorted(queries.items())),
    }
    json.dump(out, sys.stdout, indent=1)
    sys.stdout.write("\n")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
