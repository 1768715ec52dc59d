#!/usr/bin/env python
"""Compare two driver_sim gate logs (e.g. local[8] vs local[32]) by
value hash — the determinism-across-parallelism evidence.

Usage: python jobs/compare_gate_logs.py A.log B.log
Prints per-query mismatches and a summary; exit code 1 if any query
mismatches, else 0 (the per-query count stays in stdout — a raw count
as exit status would wrap mod 256 and read as success at exactly 256).
"""

from __future__ import annotations

import re
import sys

PAT = re.compile(r"^(\S+)\s+OK\s+spark=\s*(\d+)\s+duck=\s*(\d+)\s+hash (\S+) vs (\S+)")


def parse(path: str) -> dict[str, tuple[str, str]]:
    out = {}
    for line in open(path):
        m = PAT.match(line)
        if m:
            out[m.group(1)] = (m.group(2), m.group(4))
    return out


def main() -> int:
    a, b = parse(sys.argv[1]), parse(sys.argv[2])
    shared = sorted(set(a) & set(b))
    bad = 0
    for q in shared:
        if a[q] != b[q]:
            bad += 1
            print(f"MISMATCH {q}: {a[q]} vs {b[q]}")
    print(
        f"shared={len(shared)} identical={len(shared) - bad} mismatched={bad}"
        f" only_a={len(set(a) - set(b))} only_b={len(set(b) - set(a))}"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
