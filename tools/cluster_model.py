#!/usr/bin/env python3
"""Separate uniform distributed overhead from per-query outliers
(BASELINE §4.0f's analysis, reproducible).

A cluster-vs-local per-query RATIO conflates two different costs: a
fixed per-query term (scheduler + transport round-trips — dominant on
50 ms queries) and a throughput factor (fewer cores + serialization —
dominant on 1 s queries). So fit

    cluster_ms ≈ a + b · local_ms

robustly: `a` = median(cluster − local) over the sub-150 ms local
queries, `b` = median((cluster − a) / local) over the >600 ms local
queries. A query is an OUTLIER by its residual against that model
(cluster / (a + b·local)), not by its raw ratio — raw ratios flag every
tiny query at any fixed overhead.

Usage: python3 tools/cluster_model.py <local_ledger.json> <cluster_ledger.json> [outlierX=1.5]
"""
import sys
from statistics import median

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from bench_compare import load_seconds  # noqa: E402


def main(local_path, cluster_path, outlier_x=1.5):
    ltot, _, local = load_seconds(local_path)
    ctot, _, cluster = load_seconds(cluster_path)
    keys = sorted(set(local) & set(cluster))
    if not keys:
        sys.exit("no common query keys")
    lms = {k: local[k] * 1000 for k in keys}
    cms = {k: cluster[k] * 1000 for k in keys}

    small = [k for k in keys if lms[k] < 150]
    big = [k for k in keys if lms[k] > 600]
    if not small or not big:
        sys.exit(f"degenerate strata: {len(small)} small / {len(big)} big")
    a = median(cms[k] - lms[k] for k in small)
    b = median((cms[k] - a) / lms[k] for k in big)
    print(f"totals: local {ltot:.1f} s -> cluster {ctot:.1f} s "
          f"({ctot / ltot:.2f}x)")
    print(f"model:  cluster_ms = {a:.0f} + {b:.2f} x local_ms   "
          f"(fixed overhead from {len(small)} sub-150ms queries, "
          f"slope from {len(big)} over-600ms queries)")

    resid = {k: cms[k] / (a + b * lms[k]) for k in keys}
    outliers = sorted((r, k) for k, r in resid.items() if r > outlier_x)
    if outliers:
        print(f"\noutliers (> {outlier_x}x the model — the plans that "
              f"only looked good in-process):")
        for r, k in reversed(outliers):
            print(f"  {k:28s} local {lms[k]:7.0f} ms  cluster "
                  f"{cms[k]:7.0f} ms  residual {r:.2f}x")
    else:
        print(f"\nno query exceeds {outlier_x}x the model.")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 1.5)
