"""Same-window linearity probe for the production dedup CLIs.

`bench/dedup_scale_smoke.py` proves correctness at 10^6-row scale, but
cross-invocation wall-clocks on this sandbox VM mix host-noise windows
that swing per-core throughput up to 2x (see BENCH/BASELINE.md
methodology) — a naive walls-at-two-scales table measures the windows,
not the operator.  This probe applies the same discipline as
`bench/scaling.py`: generate the small and large corpus ONCE, then run
the mode at the two scales INTERLEAVED (small, large, small, large, ...)
inside one Spark session so each rep pair shares a noise window, and
grade the MEDIAN per-pair wall ratio against the row ratio.

For a linear-in-n operator the expected wall ratio at 4x rows is <= 4x
(sub-linear is fine: fixed per-job overhead — plan, JVM, Lloyd barriers —
amortizes at the larger scale).  The gate flags ratio > 1.5 * row_ratio,
the documented host-noise band.

Usage: python bench/dedup_linearity_probe.py [--mode texts|embeddings]
       [--small 550000] [--large 2200000] [--reps 2]
       [--workdir /tmp/dedup_linprobe]
Prints one JSON line per rep-scale run and a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dedup_scale_smoke import DUP_EVERY, gen_texts, gen_vecs  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["texts", "embeddings"],
                    default="texts")
    ap.add_argument("--small", type=int, default=550_000)
    ap.add_argument("--large", type=int, default=2_200_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--workdir", default="/tmp/dedup_linprobe")
    args = ap.parse_args()

    from pdf_extractor_spark.corpus import (dedup_embeddings_run,
                                            dedup_texts_run)
    from pdf_extractor_spark.session import get_spark
    spark = get_spark("dedup_linearity_probe")
    wd = f"{args.workdir}/{args.mode}"
    gen = gen_texts if args.mode == "texts" else gen_vecs
    run = dedup_texts_run if args.mode == "texts" else dedup_embeddings_run

    scales = {"small": args.small, "large": args.large}
    rows = {k: gen(spark, f"{wd}/in_{k}", n) for k, n in scales.items()}

    walls: dict[str, list[float]] = {k: [] for k in scales}
    ok = True
    for rep in range(args.reps):
        for k in ("small", "large"):
            m = run(spark, f"{wd}/in_{k}", f"{wd}/out_{k}_{rep}")
            m.update(rep=rep, scale=k, rows=rows[k],
                     planted=scales[k] // DUP_EVERY)
            ok = ok and m["cc_converged"] and m["pairs"] == m["planted"]
            walls[k].append(m["wall_s"])
            print(json.dumps(m), flush=True)

    med = {k: statistics.median(w) for k, w in walls.items()}
    row_ratio = rows["large"] / rows["small"]
    wall_ratio = round(med["large"] / med["small"], 3)
    # pairs are exact at every scale (checked above), so the only open
    # question is the wall slope in one shared window
    summary = {
        "probe": f"dedup_linearity_{args.mode}",
        "rows_small": rows["small"], "rows_large": rows["large"],
        "row_ratio": round(row_ratio, 2),
        "wall_small_med": round(med["small"], 1),
        "wall_large_med": round(med["large"], 1),
        "wall_ratio": wall_ratio,
        "linear": wall_ratio <= 1.5 * row_ratio,
        "exact_at_all_scales": ok,
    }
    print(json.dumps(summary), flush=True)
    return 0 if (ok and summary["linear"]) else 1


if __name__ == "__main__":
    sys.exit(main())
