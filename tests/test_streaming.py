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
