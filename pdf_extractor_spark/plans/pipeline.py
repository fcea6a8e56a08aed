"""End-to-end extraction job: read → salt → extract → write + lineage,
with idempotent checkpoint resume (BASELINE.json north_rule).

Commit protocol (SURVEY.md §4.3):

* ``part_id`` is a pure function of ``doc_id`` and the partition count,
  so the work units are stable across runs.
* Output is written partitioned by ``part_id`` with dynamic partition
  overwrite → re-processing a partition replaces exactly its files
  (idempotent).
* A lineage row ``(source_snapshot, partition_id, doc_count, span_count,
  parse_failures, wall_ms, status)`` is appended only *after* the data
  write succeeds, and is computed by reading the written output back
  (never by re-running extraction), so a lineage row implies durable data.
* Resume = anti-filter pending partitions against committed lineage.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extraction import extract_operator, num_partitions_for, with_partition_id
from ..sources import catalog

LINEAGE_SUBDIR = "lineage"
EXTRACTED_SUBDIR = "extracted"

# closed output-kind set (core/extract.py contract; FIXTURES.md §5)
OUTPUT_KINDS = ("title", "h1", "h2", "h3", "h4", "body", "media")


def validate_extracted(df: DataFrame) -> DataFrame:
    """Schema/contract validation over written output rows — the analog of
    the reference's JSON-Schema pass over every output file
    (``1A/validate_outputs.py:10-22``), expressed as array predicates so
    one column-pruned scan validates 10^12 docs with no shuffle beyond a
    tiny per-partition count.

    A row is valid iff EITHER it is an error record (parse_failures=1,
    empty spans) OR: spans non-empty, title first, offsets dense 0..n-1,
    every kind in the closed set, and n_spans consistent.  Returns
    (part_id, docs_checked, violations).

    Relational form: posexplode + per-span scalar predicates + a two-level
    aggregate, NOT per-row array lambdas (forall/transform/sequence) —
    higher-order functions evaluate interpreted and allocation-heavy, and
    measured on a 13M-span output the lambda form ran 7.5 s on 2 cores
    but 11.1 s on 8 (allocator contention — it anti-scales), while this
    form stays inside whole-stage codegen.  The explode never shuffles:
    map-side partial aggregation collapses each doc's spans inside its
    scan task (a doc lives in exactly one file), so only per-doc partials
    cross the exchange.
    """
    kind_set = ", ".join(f"'{k}'" for k in OUTPUT_KINDS)
    ex = (df.select(
        "part_id", "doc_id", "n_spans", "parse_failures",
        # strip span text BEFORE the explode: only (kind, offset) matter
        # to the contract, and 13M exploded rows carrying body text would
        # dominate the stage's bytes.  arrays_zip of the extracted field
        # arrays stays in codegen (a lambda transform would not)
        F.arrays_zip(F.col("spans.kind").alias("kind"),
                     F.col("spans.offset").alias("offset")).alias("ko"))
        .select("part_id", "doc_id", "n_spans", "parse_failures",
                F.size("ko").alias("sz"),
                F.posexplode_outer("ko").alias("pos", "s")))
    span_ok = (F.col("s.offset") == F.col("pos")) \
        & F.expr(f"s.kind IN ({kind_set})") \
        & ((F.col("pos") != 0) | (F.col("s.kind") == "title"))
    # NULL kind/offset makes span_ok NULL, and `when(cond)` treats NULL as
    # false — coalesce so a NULL field counts as a violation, as it did in
    # the array-predicate form (where forall/== propagated NULL to invalid)
    span_bad = F.col("pos").isNotNull() & ~F.coalesce(span_ok, F.lit(False))
    per_doc = (ex.groupBy("part_id", "doc_id")
               .agg(F.first("n_spans").alias("n_spans"),
                    F.first("parse_failures").alias("parse_failures"),
                    F.first("sz").alias("sz"),
                    F.sum(F.when(span_bad, 1).otherwise(0)).alias("bad_spans")))
    consistent = F.col("n_spans") == F.col("sz")
    is_error_rec = (F.col("parse_failures") == 1) & (F.col("sz") == 0)
    valid = consistent & (
        is_error_rec
        | ((F.col("sz") >= 1) & (F.col("bad_spans") == 0)))
    return (per_doc.withColumn("ok", valid)
            .groupBy("part_id")
            .agg(F.count("*").alias("docs_checked"),
                 F.sum(F.when(F.col("ok"), 0).otherwise(1)).alias("violations")))


def committed_partitions(spark: SparkSession, lineage_loc: str) -> list[int]:
    import os
    if "://" not in lineage_loc and not os.path.exists(lineage_loc):
        return []
    try:
        lin = spark.read.parquet(lineage_loc)
    except Exception:
        return []
    rows = (lin.filter(F.col("status") == "committed")
               .select("partition_id").distinct().collect())
    return [r.partition_id for r in rows]


def run_extraction(
    spark: SparkSession,
    input_location: str,
    output_dir: str,
    num_partitions: int | None = None,
    resume: bool = True,
    limit_partitions: int | None = None,
    snapshot: str | None = None,
) -> dict:
    """Run (or resume) the extraction job.  Returns run metrics.

    ``limit_partitions`` is a test/chaos hook: process only part_ids
    below the limit, simulating a run killed after K partitions.
    """
    t_start = time.perf_counter()
    out_loc = f"{output_dir}/{EXTRACTED_SUBDIR}"
    lin_loc = f"{output_dir}/{LINEAGE_SUBDIR}"
    snapshot = snapshot or catalog.snapshot_id()

    docs = catalog.read_documents(spark, input_location)
    if num_partitions is None:
        n_docs = docs.count()  # parquet row-count from footer metadata: cheap
        num_partitions = num_partitions_for(n_docs, spark.sparkContext.defaultParallelism)

    salted = with_partition_id(docs.select("doc_id", "spans"), num_partitions)

    committed = committed_partitions(spark, lin_loc) if resume else []
    pending = salted
    if committed:
        pending = pending.filter(~F.col("part_id").isin(committed))
    if limit_partitions is not None:
        pending = pending.filter(F.col("part_id") < limit_partitions)

    extracted = extract_operator(pending, num_partitions)
    catalog.write_partitioned(extracted, out_loc, ["part_id"], overwrite_partitions=True)

    # lineage from the *written* output (read-back, column-pruned: the spans
    # column is never touched), appended only after the durable write
    out = spark.read.parquet(out_loc)
    newly = out if not committed else out.filter(~F.col("part_id").isin(committed))
    lineage = (
        newly.groupBy(F.col("part_id").cast("int").alias("partition_id"))
        .agg(
            F.count("doc_id").alias("doc_count"),
            F.sum("n_spans").cast("long").alias("span_count"),
            F.sum("parse_failures").cast("long").alias("parse_failures"),
            (F.sum("proc_us") / F.lit(1000)).cast("long").alias("wall_ms"),
        )
        .withColumn("source_snapshot", F.lit(snapshot))
        .withColumn("status", F.lit("committed"))
        .select("source_snapshot", "partition_id", "doc_count", "span_count",
                "parse_failures", "wall_ms", "status")
    )
    catalog.append(lineage, lin_loc)

    # post-write validation pass (1A/validate_outputs.py analog): appended
    # as its own lineage status so failures surface durably, not silently.
    # Column reuse: doc_count = docs checked, parse_failures = violations,
    # wall_ms = run sequence — a partition is only re-validated when it is
    # re-extracted, so the LATEST validation row per partition is the truth
    # about the data currently on disk.  The sequence is MONOTONIC over the
    # lineage's own prior validation rows (max existing + 1), not raw wall
    # clock: two sub-millisecond runs or an NTP step backwards must never
    # let a stale validation_failed row outrank a newer clean one.
    prev_seq = (spark.read.parquet(lin_loc)
                .filter(F.col("status").isin("validated", "validation_failed"))
                .agg(F.max("wall_ms")).collect()[0][0])
    run_seq = max(int(time.time() * 1000), int(prev_seq or 0) + 1)
    vstats = validate_extracted(newly)
    validation = (
        vstats.select(
            F.lit(snapshot).alias("source_snapshot"),
            F.col("part_id").cast("int").alias("partition_id"),
            F.col("docs_checked").cast("long").alias("doc_count"),
            F.lit(0).cast("long").alias("span_count"),
            F.col("violations").cast("long").alias("parse_failures"),
            F.lit(run_seq).cast("long").alias("wall_ms"),
            F.when(F.col("violations") > 0, "validation_failed")
             .otherwise("validated").alias("status"),
        ))
    catalog.append(validation, lin_loc)
    # DURABLE violations for this output dir: a resumed run skips committed
    # partitions and never re-validates them, so an earlier run's
    # validation_failed partition must keep flagging until its data is
    # actually re-extracted and re-validated clean (ADVICE r2).  Latest
    # validation row per partition wins (wall_ms run sequence; ties —
    # e.g. pre-fix rows with wall_ms=0 — resolve to the failed row,
    # surfacing conservatively).
    from pyspark.sql import Window
    wv = Window.partitionBy("partition_id").orderBy(
        F.desc("wall_ms"),
        F.desc((F.col("status") == "validation_failed").cast("int")))
    violations_total = int(
        spark.read.parquet(lin_loc)
        .filter(F.col("status").isin("validated", "validation_failed"))
        .withColumn("rn", F.row_number().over(wv)).filter("rn = 1")
        .filter(F.col("status") == "validation_failed")
        .agg(F.sum("parse_failures")).collect()[0][0] or 0)

    stats = (spark.read.parquet(lin_loc).filter(F.col("status") == "committed")
             .agg(F.count("*").alias("parts"),
                  F.sum("doc_count").alias("docs"),
                  F.sum("span_count").alias("spans"),
                  F.sum("parse_failures").alias("failures")).collect()[0])
    wall_s = time.perf_counter() - t_start
    catalog.write_manifest(output_dir, {
        "input": input_location, "snapshot": snapshot,
        "num_partitions": num_partitions, "resume": resume,
        "committed_partitions": int(stats.parts),
    })
    return {
        "snapshot": snapshot,
        "num_partitions": num_partitions,
        "committed_partitions": int(stats.parts),
        "docs_total_committed": int(stats.docs or 0),
        "spans_total": int(stats.spans or 0),
        "parse_failures": int(stats.failures or 0),
        "validation_violations": violations_total,
        "wall_s": wall_s,
        "skipped_committed": len(committed),
    }


def read_extracted(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.parquet(f"{output_dir}/{EXTRACTED_SUBDIR}")


def read_lineage(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.parquet(f"{output_dir}/{LINEAGE_SUBDIR}")
