#!/usr/bin/env python3
"""Round-over-round correctness diff (VERDICT r9 'what's wrong' #3).

A query VANISHING from CORRECTNESS_r{N}.json is a louder alarm than a
red row — it means the query threw before the driver could compare it
(exactly how the r8 events regression sat undetected for two rounds).
Run this at the START of every round:

    python3 scripts/correctness_diff.py CORRECTNESS_r09.json CORRECTNESS_r10.json

Exit 1 if any query disappeared, regressed (err appeared / a match
flag flipped false), or shifted row counts; 0 when the newer file
dominates the older one.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def ok(row):
    return row.get("err") is None and all(
        row.get(k) is not False for k in ("rows_match", "schema_match", "hash_match"))


def main(old_path, new_path):
    old, new = load(old_path), load(new_path)
    bad = 0
    for q in sorted(old):
        if q not in new:
            print(f"DISAPPEARED  {q} (was spark_rows={old[q].get('spark_rows')})")
            bad += 1
            continue
        o, n = old[q], new[q]
        if ok(o) and not ok(n):
            print(f"REGRESSED    {q}: err={n.get('err')} matches="
                  f"{[n.get(k) for k in ('rows_match', 'schema_match', 'hash_match')]}")
            bad += 1
        elif o.get("spark_rows") != n.get("spark_rows"):
            print(f"ROWS-SHIFTED {q}: {o.get('spark_rows')} -> {n.get('spark_rows')}"
                  " (fixture or data change — confirm it was intentional)")
            bad += 1
    for q in sorted(set(new) - set(old)):
        print(f"new          {q} ({'green' if ok(new[q]) else 'NOT GREEN'})")
    print(f"{'FAIL' if bad else 'OK'}: {len(old)} -> {len(new)} queries, {bad} alarms")
    return 1 if bad else 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
