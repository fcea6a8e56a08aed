"""Streaming incremental extraction: oracle parity + exactly-once file
tracking across restarts (streaming analog of the t3 resume test)."""

import pyarrow as pa
import pyarrow.parquet as pq

from pdf_extractor_spark.gen import gen_corpus, gen_doc
from pdf_extractor_spark.oracle import run_oracle
from pdf_extractor_spark.streaming.incremental import incremental_extraction

SPAN_T = pa.struct([("kind", pa.string()), ("text", pa.string()),
                    ("media_ref", pa.string()), ("offset", pa.int32())])


def write_rows(rows, path):
    table = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
        "spans": pa.array([r["spans"] for r in rows], pa.list_(SPAN_T)),
    })
    pq.write_table(table, path)


def collect_spans(spark, out_dir):
    df = spark.read.parquet(f"{out_dir}/extracted").select("doc_id", "spans")
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                      for s in r["spans"]]
        for r in df.collect()
    }


def test_streaming_incremental_parity_and_exactly_once(spark, tmp_path):
    inp = tmp_path / "docs"
    out = tmp_path / "out"
    inp.mkdir()

    batch1 = gen_corpus(60, seed=7)
    write_rows(batch1, str(inp / "b1.parquet"))

    incremental_extraction(spark, str(inp), str(out), num_partitions=8)
    got1 = collect_spans(spark, str(out))
    golden1 = {d: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in sp]
               for d, sp in run_oracle(batch1).items()}
    assert got1 == golden1

    # new file arrives; rerun with the SAME checkpoint → only new docs added,
    # existing rows untouched (no duplicates: exactly-once per input file)
    batch2 = [gen_doc(f"late-{i:04d}", seed=7) for i in range(20)]
    write_rows(batch2, str(inp / "b2.parquet"))
    incremental_extraction(spark, str(inp), str(out), num_partitions=8)

    got2 = collect_spans(spark, str(out))
    golden2 = dict(golden1)
    golden2.update({d: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                        for s in sp]
                    for d, sp in run_oracle(batch2).items()})
    assert got2 == golden2
    assert len(got2) == 80

    # idempotent: nothing new → no change
    incremental_extraction(spark, str(inp), str(out), num_partitions=8)
    assert collect_spans(spark, str(out)) == golden2


def test_stateful_partition_stats_accumulate(spark, tmp_path):
    """applyInPandasWithState tallies accumulate across separate runs via
    the checkpoint state store, and agree with a batch recount."""
    from pyspark.sql import functions as F

    from pdf_extractor_spark.operators.extraction import with_partition_id
    from pdf_extractor_spark.streaming.stateful import stateful_partition_stats

    inp = tmp_path / "docs"
    ckpt = str(tmp_path / "ckpt")
    inp.mkdir()

    def run(_name):
        updates = []
        stats = stateful_partition_stats(spark, str(inp), num_partitions=4)
        q = (stats.writeStream
             .foreachBatch(lambda bdf, _eid: updates.extend(bdf.collect()))
             .option("checkpointLocation", ckpt)
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination()
        # latest update per part_id wins
        latest = {}
        for r in updates:
            latest[r.part_id] = (r.docs_total, r.spans_total, r.failures_total)
        return latest

    write_rows(gen_corpus(40, seed=11), str(inp / "b1.parquet"))
    first = run("stats1")
    assert sum(v[0] for v in first.values()) == 40

    # second run, same checkpoint: only the new file is processed, but
    # emitted totals INCLUDE the restored state from run 1
    more = [gen_doc(f"extra-{i:04d}", seed=11) for i in range(25)]
    write_rows(more, str(inp / "b2.parquet"))
    second = run("stats2")
    assert sum(v[0] for v in second.values()) == 65

    # tallies agree exactly with a batch recount over the same corpus
    batch = spark.createDataFrame(gen_corpus(40, seed=11) + more,
                                  schema="doc_id string, spans array<struct<"
                                  "kind:string,text:string,media_ref:string,"
                                  "offset:int>>")
    from pdf_extractor_spark.operators.extraction import extract_operator
    got = {r.part_id: (r.docs, r.spans, r.fails)
           for r in extract_operator(
               with_partition_id(batch, 4).drop("part_id").select("doc_id", "spans"), 4)
           .groupBy("part_id")
           .agg(F.count("*").alias("docs"), F.sum("n_spans").alias("spans"),
                F.sum("parse_failures").alias("fails")).collect()}
    assert {k: tuple(map(int, v)) for k, v in second.items()} == \
        {k: tuple(map(int, v)) for k, v in got.items()}


def test_windowed_counts_watermark_drops_late_rows(spark, tmp_path):
    """Tumbling event-time windows finalize once the watermark passes; a row
    arriving later than the watermark bound is dropped, an in-bound late
    row is still counted into its event-time window."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extractor_spark.streaming.windowed import windowed_event_counts

    inp = tmp_path / "events"
    inp.mkdir()
    base = dt.datetime(2026, 1, 1, 10, 0, 0)
    T = lambda m, s=0: base + dt.timedelta(minutes=m, seconds=s)

    def write(rows, name):
        pq.write_table(pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }), str(inp / name))

    # batch 1: window [10:00,10:10) gets 3 clicks; max ts 10:16 will put
    # the watermark at 10:11.  Watermark propagation lags one micro-batch
    # (it is computed at the end of batch N and takes effect in batch N+2's
    # filter), so batch 2 is a filler that lets 10:11 take effect before
    # the straggler arrives in batch 3.
    import time as _time

    # mtime gaps: the file source orders the initial backlog by
    # modification time, and batch order is what the test asserts on
    write([(1, T(0), "click"), (2, T(4), "click"), (3, T(9), "click"),
           (4, T(16), "view")], "b1.parquet")
    _time.sleep(1.1)
    write([(10, T(17), "view")], "b2.parquet")
    _time.sleep(1.1)
    # batch 3: event at 10:01 is > 5 min late (watermark 10:11) -> dropped;
    # event at 10:12 is within the open [10:10,10:20) window -> counted
    write([(5, T(1), "click"), (6, T(12), "view"), (7, T(27), "view")],
          "b3.parquet")

    out = tmp_path / "out"
    q = (windowed_event_counts(spark, str(inp), max_files_per_trigger=1)
         .writeStream.format("parquet").option("path", str(out))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()

    rows = {(r.window_start.minute, r.event_type): r.n_events
            for r in spark.read.parquet(str(out)).collect()}
    # [10:00,10:10) x click finalized with exactly the 3 on-time rows —
    # the 10:01 straggler from batch 3 was dropped by the watermark
    assert rows[(0, "click")] == 3
    # [10:10,10:20) finalized after batch 3's 10:27 advanced the watermark;
    # it holds 10:16 (b1) + 10:17 (b2) + 10:12 (b3, late but within bound)
    assert rows[(10, "view")] == 3
    # [10:20,10:30) never finalized (watermark stops at 10:22) -> absent
    assert (20, "view") not in rows
