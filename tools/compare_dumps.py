#!/usr/bin/env python3
"""Cross-parallelism determinism sweep comparator.

Usage: python3 tools/compare_dumps.py <dirA> <dirB>

Compares every query subdirectory present in BOTH Verify dump dirs after a
column-name + row sort (the driver's canonicalization): bit-identical
engine output at two parallelism levels is the engine-wide payoff of the
integer-micro-unit / content-hash / total-order determinism discipline.
"""
import sys
import os
import glob

import pandas as pd

a_dir, b_dir = sys.argv[1], sys.argv[2]

def canon(qdir: str) -> str:
    df = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(os.path.join(qdir, "*.parquet"))],
        ignore_index=True)
    df = df[sorted(df.columns)]
    rows = sorted(df.astype(str).values.tolist())
    return "\n".join("\x1f".join(r) for r in rows)

names = sorted(set(os.listdir(a_dir)) & set(os.listdir(b_dir)))
names = [n for n in names if os.path.isdir(os.path.join(a_dir, n))]
mism = 0
for n in names:
    same = canon(os.path.join(a_dir, n)) == canon(os.path.join(b_dir, n))
    if not same:
        mism += 1
        print(f"MISMATCH {n}")
print(f"{len(names) - mism}/{len(names)} queries bit-identical, {mism} mismatches")
sys.exit(1 if mism else 0)
