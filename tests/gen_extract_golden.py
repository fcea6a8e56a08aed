"""Regenerate the extract_pipeline golden parquet (VERDICT r4 item 3).

The flagship extraction chain is not SQL-expressible, so its DuckDB
oracle is a *persisted golden*: the pure-Python oracle
(:mod:`pdf_extractor_spark.oracle`, the north-rule parity reference) is
run over every driver ``documents`` row at sf0.001 / sf0.01 / sf0.1 and
the exploded span rows land in ``tests/golden/extract_spans.parquet``.

Spans are a pure deterministic function of ``(doc_id, text)``
(``gen.doc_from_driver_row`` seeds from both), and doc_ids COLLIDE across
scales with different texts, so rows are keyed by
``(src_doc_id, md5(text))`` — the registry SQL joins the golden against
the active ``documents`` view on that pair, making one static oracle
string valid at every scale the driver runs.

Rerun (from the repo root) whenever the driver testdata or the shared
extraction heuristics change::

    python tests/gen_extract_golden.py
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pdf_extractor_spark import gen                       # noqa: E402
from pdf_extractor_spark.oracle import run_oracle         # noqa: E402

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]
OUT = os.path.join(os.path.dirname(__file__), "golden",
                   "extract_spans.parquet")


def golden_rows(sf_dir: str):
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    derived = [gen.doc_from_driver_row(i, txt) for i, txt in docs]
    spans_by_doc = run_oracle(derived)
    for (src_id, txt), d in zip(docs, derived):
        md5 = hashlib.md5((txt or "").encode()).hexdigest()
        for s in spans_by_doc[d["doc_id"]]:
            yield (src_id, md5, d["doc_id"], s["kind"], s["text"],
                   s["media_ref"], s["offset"])


def main() -> None:
    rows = []
    for sf_dir in SF_DIRS:
        before = len(rows)
        rows.extend(golden_rows(sf_dir))
        print(f"{sf_dir}: {len(rows) - before} span rows")
    # one row per (scale-keyed doc, span); collisions impossible because
    # (src_doc_id, text_md5) is unique per scale by construction
    schema = pa.schema([
        ("src_doc_id", pa.int64()), ("text_md5", pa.string()),
        ("doc_id", pa.string()), ("kind", pa.string()),
        ("text", pa.string()), ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ])
    tbl = pa.Table.from_arrays(
        [pa.array(col, type=f.type)
         for col, f in zip(zip(*rows), schema)], schema=schema)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(tbl, OUT, compression="zstd")
    print(f"wrote {tbl.num_rows} rows -> {OUT} "
          f"({os.path.getsize(OUT) / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
