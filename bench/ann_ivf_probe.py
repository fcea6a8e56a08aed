"""Fixed-vs-variable cost split for `ann_ivf_kmeans` (VERDICT r3 item 5):
time the query at two scale factors in ONE host window.  If the wall gap
between sf0.01 (~1.2k vectors) and sf0.1 (~12k) is small relative to the
total, the remaining cost is materialization/broadcast overhead (Lloyd
round barriers + centroid rebuilds), not data-proportional work.

Usage: python bench/ann_ivf_probe.py [--repeat 3]
Prints one JSON line with medians and the split.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--query", default="ann_ivf_kmeans")
    args = ap.parse_args(argv)

    from pdf_extractor_spark.queries import REGISTRY
    from pdf_extractor_spark.session import get_spark
    spark = get_spark("ann_ivf_probe")
    fn = REGISTRY[args.query].spark
    sfs = {"sf0.01": "/root/testdata/sf0.01", "sf0.1": "/root/testdata/sf0.1"}
    times = {k: [] for k in sfs}
    fn(spark, sfs["sf0.01"]).count()       # warm-up: codegen + worker fork
    for _ in range(args.repeat):
        for k, d in sfs.items():           # interleaved, one window
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, d).count()
            times[k].append(round(time.perf_counter() - t0, 3))
    med = {k: statistics.median(v) for k, v in times.items()}
    print(json.dumps({
        "query": args.query,
        "median_s": med, "all_s": times,
        # 10x the data costs this much more wall: the data-proportional part
        "variable_s_per_10x": round(med["sf0.1"] - med["sf0.01"], 3),
        "fixed_overhead_share_at_sf01": round(
            med["sf0.01"] / med["sf0.1"], 3) if med["sf0.1"] else None,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
