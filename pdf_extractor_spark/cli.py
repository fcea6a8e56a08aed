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


def _run_selection(spark, input_path: str, config_path: str, out_path: str,
                   timestamp: str) -> dict:
    """One collection's selection run: config JSON → record JSON file."""
    import time

    from pyspark.sql import functions as F

    from .plans.selection import (build_selection_records,
                                  load_collection_config, persona_keywords,
                                  selection_plan)
    with open(config_path) as fh:
        cfg = load_collection_config(json.load(fh))
    kws = persona_keywords(cfg["persona"], cfg["job_to_be_done"])
    proc = cfg.get("processing_config", {})
    raw = spark.read.parquet(input_path)
    names = [d["filename"] for d in cfg.get("documents", [])]
    if "spans" in raw.columns and "text" not in raw.columns:
        # extraction-output input (doc_id, spans): compose extract → select.
        # Text = the non-media span texts in order.  If the extraction
        # output carries a `source` column the config's documents list
        # scopes the collection exactly as in the text branch; a bare
        # (doc_id, spans) table has no filename to match, so the whole
        # table is one collection (named by the config) and a non-empty
        # documents list cannot be honored — fail loudly rather than
        # silently selecting from documents outside the collection.
        if "source" in raw.columns:
            src_col = F.col("source")
            if names:
                raw = raw.filter(src_col.isin(names))
        elif names:
            raise ValueError(
                "config lists specific documents but the spans input has "
                "no `source` column to match filenames against; drop the "
                "documents list or add `source` to the extraction output")
        else:
            src_col = F.lit(cfg["collection_name"])
        docs = raw.select(
            "doc_id",
            src_col.alias("source"),
            F.array_join(F.expr(
                "transform(filter(spans, s -> s.kind != 'media'), s -> s.text)"),
                " ").alias("text"))
    else:
        docs = raw.select("doc_id", "source", "text")
        if names:
            docs = docs.filter(F.col("source").isin(names))
    t0 = time.perf_counter()
    sel = selection_plan(docs, kws,
                         max_sections=proc.get("max_sections", 25),
                         min_score=proc.get("min_relevance_score", 0.5))
    # bounded collect: <= max_sections rows per collection by construction
    rows = [r.asDict() for r in sel.collect()]
    records = build_selection_records(
        rows, cfg["persona"], cfg["job_to_be_done"], timestamp)
    with open(out_path, "w") as fh:
        json.dump(records, fh, indent=2, sort_keys=True)
    return {
        "mode": "selection", "collection_name": cfg["collection_name"],
        "persona": cfg["persona"], "n_keywords": len(kws),
        "collections": len(records),
        "sections_total": sum(len(r["extracted_sections"])
                              for r in records.values()),
        "wall_s": round(time.perf_counter() - t0, 3),
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pdf_extractor_spark")
    ap.add_argument("--input", default=None,
                    help="documents table (parquet path or Iceberg name); "
                         "required except in --grade mode")
    ap.add_argument("--output", required=True, help="run directory (extracted/ + lineage/)")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--master", default=None, help="e.g. local[8]; default local[$SPARK_GRAFT_CPUS]")
    ap.add_argument("--gen-docs", type=int, default=None,
                    help="generate a deterministic synthetic corpus of N docs into --input first")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--config", default=None,
                    help="challenge/pipeline JSON (1B/main.py:52-97 shape); switches to "
                         "selection mode: --input is a documents table "
                         "(doc_id, source, text), output is the per-collection "
                         "challenge1b_output record JSON at --output")
    ap.add_argument("--collections-dir", default=None,
                    help="batch selection mode (reference --mode batch, "
                         "1B/main.py:186-199): process every subdirectory "
                         "containing an input JSON; one record file per "
                         "collection written under --output")
    ap.add_argument("--timestamp", default="1970-01-01T00:00:00",
                    help="processing_timestamp stamped into selection records "
                         "(explicit for reproducible outputs)")
    ap.add_argument("--golden", default=None,
                    help="golden challenge1b record JSON; with --config, the "
                         "produced records are graded against it "
                         "(validation_report.json shape, 1B regression "
                         "scorer) and the report lands at "
                         "<output>.validation.json.  With --grade, grades "
                         "an existing record file instead (no Spark).")
    ap.add_argument("--dedup-embeddings", default=None, metavar="PARQUET",
                    help="embedding near-dup mode: input parquet of "
                         "(vec_id, embedding array<float>); corpus size is "
                         "estimated from the parquet footers and the LSH "
                         "band geometry DERIVED from it (emb_lsh_geometry), "
                         "then banding -> capped candidates -> exact cosine "
                         "verify -> components -> keep-canonical decisions "
                         "land under --output")
    ap.add_argument("--threshold-pct", type=int, default=98,
                    help="dedup cosine threshold x100 (default 98)")
    ap.add_argument("--dedup-texts", default=None, metavar="PARQUET",
                    help="simhash near-dup mode: input parquet of "
                         "(doc_id, text); corpus size is estimated from "
                         "the parquet footers and the pigeonhole band "
                         "width DERIVED from it (simhash_band_bits), then "
                         "banding -> capped candidates -> exact hamming "
                         "verify -> components -> keep-canonical "
                         "decisions land under --output")
    ap.add_argument("--hamming-max", type=int, default=3,
                    help="simhash near-dup hamming threshold (default 3; "
                         "max 3 — the 4-band pigeonhole only guarantees a "
                         "band collision for hamming <= bands-1, larger "
                         "values would silently lose recall and raise)")
    ap.add_argument("--dedup-semantic", default=None, metavar="PARQUET",
                    help="SemDeDup mode: input parquet of (vec_id, "
                         "embedding); corpus size is estimated from the "
                         "parquet footers and the k-means cluster count "
                         "DERIVED from it (kmeans_k ~ n/target_cell_size), "
                         "then Lloyd rounds -> capped intra-cell cosine "
                         "pairing -> components -> keep-canonical "
                         "decisions land under --output")
    ap.add_argument("--target-cell-size", type=int, default=1024,
                    help="SemDeDup expected vectors per k-means cell "
                         "(drives the derived K; default 1024)")
    ap.add_argument("--skew-safe", action="store_true",
                    help="count blocking-key occupancy with a map-side-"
                         "combining aggregate + broadcast anti-join instead "
                         "of the single-exchange window form: ~1.4x slower "
                         "when no block is hot, but no task ever ingests a "
                         "whole pathological block (use when the corpus has "
                         "multi-million-row duplicate regions)")
    ap.add_argument("--sql-sig", action="store_true",
                    help="compute the --dedup-texts simhash / the "
                         "--dedup-embeddings LSH bands + verify dots with "
                         "the SQL expression forms instead of the Arrow-"
                         "batched numpy default (bit-identical; the SQL "
                         "HOF chains are CodegenFallback — interpreted "
                         "row-at-a-time, ~10-40x slower per row — so this "
                         "exists only to cross-check the two paths)")
    ap.add_argument("--cc-iterations", type=int, default=20,
                    help="max min-label propagation rounds for the dedup "
                         "component labeling; the run iterates to fixpoint "
                         "inside this budget and surfaces cc_converged / "
                         "cc_residual in the metrics (default 20)")
    ap.add_argument("--grade", default=None,
                    help="existing generated record JSON to grade against "
                         "--golden; report printed to stdout and written "
                         "to --output (pure Python, no Spark session)")
    args = ap.parse_args(argv)

    # --- grading-only mode: no Spark session needed ------------------------
    if args.grade:
        if not args.golden:
            ap.error("--grade requires --golden")
        from .plans.grading import grade_report
        with open(args.grade) as fh:
            generated = json.load(fh)
        with open(args.golden) as fh:
            expected = json.load(fh)
        report = grade_report(generated, expected)
        with open(args.output, "w") as fh:
            json.dump(report, fh, indent=2, sort_keys=True)
        print(json.dumps({
            "mode": "grade", "collections": len(report),
            "scores": {k: round(v["overall_score"], 2)
                       for k, v in report.items()},
            "grades": {k: v["grade"] for k, v in report.items()},
            "report": args.output}))
        return 0

    if not args.input and not (args.dedup_embeddings or args.dedup_texts
                               or args.dedup_semantic):
        ap.error("--input is required except in --grade mode")

    from .session import get_spark
    spark = get_spark("pdf_extractor_spark.cli", master=args.master)

    if args.dedup_embeddings:
        from .corpus import dedup_embeddings_run
        metrics = dedup_embeddings_run(
            spark, args.dedup_embeddings, args.output,
            threshold_pct=args.threshold_pct,
            iterations=args.cc_iterations, skew_safe=args.skew_safe,
            arrow_sig=not args.sql_sig)
        print(json.dumps(metrics))
        return 0

    if args.dedup_texts:
        from .corpus import dedup_texts_run
        metrics = dedup_texts_run(spark, args.dedup_texts, args.output,
                                  hamming_max=args.hamming_max,
                                  iterations=args.cc_iterations,
                                  skew_safe=args.skew_safe,
                                  arrow_sig=not args.sql_sig)
        print(json.dumps(metrics))
        return 0

    if args.dedup_semantic:
        from .corpus import dedup_semantic_run
        metrics = dedup_semantic_run(
            spark, args.dedup_semantic, args.output,
            threshold_pct=args.threshold_pct,
            iterations=args.cc_iterations,
            target_cell_size=args.target_cell_size,
            skew_safe=args.skew_safe,
            arrow_sig=not args.sql_sig)
        print(json.dumps(metrics))
        return 0

    if args.config:
        metrics = _run_selection(spark, args.input, args.config, args.output,
                                 args.timestamp)
        if args.golden:
            from .plans.grading import grade_report
            with open(args.output) as fh:
                generated = json.load(fh)
            with open(args.golden) as fh:
                expected = json.load(fh)
            report = grade_report(generated, expected)
            rpath = f"{args.output}.validation.json"
            with open(rpath, "w") as fh:
                json.dump(report, fh, indent=2, sort_keys=True)
            metrics["validation_report"] = rpath
            metrics["validation_scores"] = {
                k: round(v["overall_score"], 2) for k, v in report.items()}
        print(json.dumps(metrics))
        return 0

    if args.collections_dir:
        # batch mode (1B/main.py:186-199): every subdir with an input JSON
        # is a collection; records land at --output/<collection>.json
        import glob

        os.makedirs(args.output, exist_ok=True)
        results = {}
        for sub in sorted(glob.glob(f"{args.collections_dir}/*/")):
            cfg_path = next(
                (p for name in ("input.json", "challenge1b_input.json",
                                "challenge_input.json")
                 if os.path.exists(p := os.path.join(sub, name))), None)
            if cfg_path is None:
                continue
            name = os.path.basename(sub.rstrip("/"))
            results[name] = _run_selection(
                spark, args.input, cfg_path,
                os.path.join(args.output, f"{name}.json"), args.timestamp)
        print(json.dumps({"mode": "batch_selection",
                          "collections_processed": len(results),
                          "results": results}))
        return 0 if results else 1

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
