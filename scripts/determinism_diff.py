#!/usr/bin/env python3
"""Cross-core determinism audit: compare two graft.Verify output dirs
(e.g. SPARK_GRAFT_CPUS=8 vs 32) value-for-value.

    python3 scripts/determinism_diff.py /tmp/det8 /tmp/det32

For each query directory present in both, loads the parquet, sorts
rows by every column, and compares cell values exactly (NaN == NaN).
Exit 1 on any difference or on a query present in only one dir.
"""
import sys
import glob
import os

import pyarrow.parquet as pq


def load(d, q):
    files = glob.glob(os.path.join(d, q, "*.parquet"))
    t = pq.read_table(sorted(files)[0]) if len(files) == 1 else \
        pq.read_table(sorted(files))
    df = t.to_pandas()
    cols = sorted(df.columns)
    return df[cols].sort_values(by=cols, kind="mergesort",
                                na_position="last").reset_index(drop=True)


def main():
    a, b = sys.argv[1], sys.argv[2]
    qa = {q for q in os.listdir(a) if os.path.isdir(os.path.join(a, q))}
    qb = {q for q in os.listdir(b) if os.path.isdir(os.path.join(b, q))}
    bad = 0
    for q in sorted(qa ^ qb):
        print(f"ONLY-ONE-SIDE {q}")
        bad += 1
    for q in sorted(qa & qb):
        da, db = load(a, q), load(b, q)
        if list(da.columns) != list(db.columns):
            print(f"SCHEMA-DIFF {q}")
            bad += 1
        elif len(da) != len(db):
            print(f"ROWCOUNT-DIFF {q}: {len(da)} vs {len(db)}")
            bad += 1
        elif not da.equals(db):
            print(f"VALUE-DIFF {q}")
            bad += 1
    print(f"{len(qa & qb)} compared, {bad} differ")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
