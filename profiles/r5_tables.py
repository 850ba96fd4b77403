"""Render README-style suite tables from results JSONs.

Usage: python profiles/r5_tables.py --results results_r5 [--algo substring]
Prints, per suite, CSR and ISR rows joined by ' / ' across agent tiers,
plus a side-by-side delta against a second results dir (e.g. the round-4 2M).
"""

import argparse
import glob
import json
import os
from collections import defaultdict

import numpy as np


def load(results_dir, algo_sub=None):
    out = {}
    for path in sorted(glob.glob(os.path.join(results_dir, "*", "*.json"))):
        suite = os.path.basename(os.path.dirname(path))
        if algo_sub and algo_sub not in os.path.basename(path):
            continue
        try:
            with open(path) as f:
                rows = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue
        if not isinstance(rows, list) or not rows:
            continue
        by_a = defaultdict(list)
        for r in rows:
            if isinstance(r, dict) and "num_agents" in r:
                by_a[r["num_agents"]].append(r)
        if by_a:
            out[(suite, os.path.basename(path))] = by_a
    return out


def fmt(by_a, key):
    tiers = sorted(by_a)
    vals = [np.mean([r[key] for r in by_a[a]]) for a in tiers]
    return (tiers, " / ".join(f"{v:.2f}" for v in vals))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default="results_r5")
    ap.add_argument("--algo", default=None)
    args = ap.parse_args()

    for (suite, fname), by_a in load(args.results, args.algo).items():
        tiers, csr = fmt(by_a, "CSR")
        _, isr = fmt(by_a, "ISR")
        n = sum(len(v) for v in by_a.values())
        print(f"{suite} [{fname}] ({n} episodes)")
        print(f"  agents: {'/'.join(map(str, tiers))}")
        print(f"  CSR: {csr}")
        print(f"  ISR: {isr}")
        if "avg_throughput" in next(iter(by_a.values()))[0]:
            _, tp = fmt(by_a, "avg_throughput")
            print(f"  throughput: {tp}")
        print()


if __name__ == "__main__":
    main()
