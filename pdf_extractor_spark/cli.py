"""spark-submit / python -m entry point for the extraction job.

Usage::

    spark-submit --py-files pdf_extractor_spark.zip -m ... OR
    python -m pdf_extractor_spark.cli \
        --input /path/to/documents_parquet_or_iceberg_table \
        --output /path/to/run_dir \
        [--partitions N] [--no-resume] [--master local[32]] \
        [--gen-docs 1000]   # generate a synthetic corpus to --input first

Prints one JSON line of run metrics on completion.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pdf_extractor_spark")
    ap.add_argument("--input", required=True, help="documents table (parquet path or Iceberg name)")
    ap.add_argument("--output", required=True, help="run directory (extracted/ + lineage/)")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--master", default=None, help="e.g. local[8]; default local[$SPARK_GRAFT_CPUS]")
    ap.add_argument("--gen-docs", type=int, default=None,
                    help="generate a deterministic synthetic corpus of N docs into --input first")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    from .session import get_spark
    spark = get_spark("pdf_extractor_spark.cli", master=args.master)

    if args.gen_docs:
        from .gen import gen_corpus
        from .operators.extraction import INPUT_SCHEMA
        if not os.path.exists(args.input):
            rows = gen_corpus(args.gen_docs, seed=args.seed)
            spark.createDataFrame(rows, schema=INPUT_SCHEMA).write.parquet(args.input)

    from .plans.pipeline import run_extraction
    metrics = run_extraction(
        spark, args.input, args.output,
        num_partitions=args.partitions, resume=not args.no_resume,
    )
    metrics["docs_per_sec"] = round(metrics["docs_total_committed"] / metrics["wall_s"], 2)
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
