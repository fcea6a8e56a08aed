"""Streaming near-duplicate detection against a growing signature index.

The batch registry demonstrates the single-shot shapes
(``dedup_minhash_lsh``) and the batch-vs-stored-index shape
(``dedup_incremental``); this module is the streaming-native composition:
documents arrive continuously, each micro-batch is MinHash-signed ONCE,
probed against the **persisted band index of everything ingested before
it**, and only first-occurrence docs extend the index.  That is the 100 TB
steady state for corpus dedup: per-batch work scales with the batch (its
own signatures + a thin band-key join), never with the corpus.

Exactly-once mechanics:

* The file source + checkpoint WAL give each input file to exactly one
  micro-batch (same as :mod:`.incremental`).
* ``foreachBatch`` may re-run a batch after a crash, so every write is
  made idempotent by landing in a ``batch_id=N`` partition directory with
  overwrite semantics — a replayed batch overwrites its own output
  instead of appending duplicates.
* The index a batch probes is every ``batch_id < N`` partition, which is
  exactly the set committed before this batch first ran.

Decision semantics (deterministic): a doc is a duplicate iff some INDEXED
doc, or some smaller-``doc_id`` doc in the same micro-batch, has shingle
Jaccard >= t with it; ``dup_of`` is the smallest such doc_id.  Chains
(a ~ b ~ c without a ~ c) are left to the offline ``dedup_components``
pass, as in the batch path.

At deploy scale the index partitions would be bucketed by ``band_hash``
so the probe join co-locates without shuffling the index; here the index
is small enough that Spark broadcasts or shuffles it per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (ArrayType, LongType, StringType, StructField,
                               StructType)

from ..corpus import MINHASH_LSH_SIG_S, WORDS_S

INPUT_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
])

_SIG_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("shset", ArrayType(StringType())),
    StructField("bands", ArrayType(StringType())),
])


def _signatures(docs: DataFrame) -> DataFrame:
    return (docs.filter(F.expr(f"size({WORDS_S}) >= 3"))
            .select("doc_id", F.expr(MINHASH_LSH_SIG_S).alias("sig"))
            .select("doc_id", "sig.*"))


def _verified_pairs(new_sigs: DataFrame, index_sigs: DataFrame,
                    threshold_pct: int, ordered: bool = False) -> DataFrame:
    """(new_doc, dup_of) pairs with exact shingle Jaccard >= t, candidates
    blocked by band-key equality (never all-pairs).  ``ordered=True`` (the
    within-batch self-join) keeps only index_doc < new_doc AT CANDIDATE
    TIME — verifying both orientations of every pair and discarding half
    afterwards would double the expensive verify-join work."""
    bx = new_sigs.select("doc_id",
                         F.posexplode("bands").alias("band_idx", "band_hash"))
    ix = index_sigs.select("doc_id",
                          F.posexplode("bands").alias("band_idx", "band_hash"))
    pair_cond = (F.col("i.doc_id") < F.col("b.doc_id")) if ordered \
        else (F.col("b.doc_id") != F.col("i.doc_id"))
    cand = (bx.alias("b")
            .join(ix.alias("i"), ["band_idx", "band_hash"])
            .filter(pair_cond)
            .select(F.col("b.doc_id").alias("new_doc"),
                    F.col("i.doc_id").alias("index_doc"))
            .distinct())
    sb = new_sigs.select(F.col("doc_id").alias("new_doc"),
                         F.col("shset").alias("sb"))
    si = index_sigs.select(F.col("doc_id").alias("index_doc"),
                           F.col("shset").alias("si"))
    n_inter = F.size(F.array_intersect("sb", "si"))
    n_union = F.size("sb") + F.size("si") - n_inter
    return (cand.join(sb, "new_doc").join(si, "index_doc")
            .filter(n_inter * 100 >= threshold_pct * n_union)
            .select("new_doc", "index_doc"))


def _process_batch(batch_df: DataFrame, batch_id: int, state_dir: str,
                   threshold_pct: int) -> None:
    from pyspark.errors import AnalysisException

    spark = batch_df.sparkSession
    sigs = _signatures(batch_df.select("doc_id", "text")).persist()
    try:
        index = (spark.read
                 .option("basePath", f"{state_dir}/index")
                 .parquet(f"{state_dir}/index")
                 .filter(F.col("batch_id") < batch_id)
                 .select("doc_id", "shset", "bands"))
        index.schema  # force resolution inside the try
    except AnalysisException:  # first batch: no index yet.  ONLY the
        # missing-path error may fall through to "empty index" — a
        # transient read failure must fail the batch (and be retried by
        # the stream) rather than silently commit every cross-batch
        # duplicate as an original
        index = spark.createDataFrame([], _SIG_SCHEMA)

    vs_index = _verified_pairs(sigs, index, threshold_pct)
    vs_batch = _verified_pairs(sigs, sigs, threshold_pct, ordered=True)
    dup_of = (vs_index.unionByName(vs_batch)
              .groupBy("new_doc")
              .agg(F.min("index_doc").alias("dup_of")))

    # one decision row per INGESTED doc: docs below the 3-word signature
    # floor can never match anything (no shingles) — they are recorded
    # is_dup=false here and never enter the index
    decisions = (batch_df.select("doc_id").distinct()
                 .join(dup_of, F.col("doc_id") == F.col("new_doc"), "left")
                 .select("doc_id",
                         F.col("dup_of").isNotNull().alias("is_dup"),
                         "dup_of"))
    # idempotent: a replayed batch overwrites its own partition dirs
    decisions.write.mode("overwrite").parquet(
        f"{state_dir}/decisions/batch_id={batch_id}")
    (sigs.join(dup_of, sigs.doc_id == dup_of.new_doc, "left_anti")
     .write.mode("overwrite")
     .parquet(f"{state_dir}/index/batch_id={batch_id}"))
    sigs.unpersist()


def streaming_dedup(
    spark: SparkSession,
    input_location: str,
    state_dir: str,
    threshold_pct: int = 50,
    max_files_per_trigger: int | None = None,
) -> None:
    """Dedupe all input files not yet seen by this checkpoint, then stop.

    ``state_dir`` gets ``index/`` (the growing signature store, one
    partition per micro-batch), ``decisions/`` (one row per ingested doc:
    is_dup + dup_of), and ``_checkpoint/`` (file-source WAL).
    """
    reader = spark.readStream.schema(INPUT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(input_location)
    q = (docs.writeStream
         .foreachBatch(lambda df, bid:
                       _process_batch(df, bid, state_dir, threshold_pct))
         .option("checkpointLocation", f"{state_dir}/_checkpoint")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
