"""Physical-plan guards: the scale properties SURVEY.md §4 promises must
show up in `.explain` output, or a refactor silently regressed them.

* extraction: exactly ONE exchange (the AQE rebalance) feeding one
  Arrow-batched MapInPandas — no sampling pass, no extra shuffle;
* dimension joins broadcast instead of shuffling the fact side;
* filters and column pruning reach the parquet scan.
"""

import contextlib
import io
import re

from pyspark.sql import functions as F

from pdf_extractor_spark.operators.extraction import extract_operator
from pdf_extractor_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_extraction_single_exchange(spark):
    docs = spark.createDataFrame(
        [("d1", [{"kind": "pdf", "text": "x", "media_ref": "", "offset": 0}])],
        schema="doc_id string, spans array<struct<kind:string,text:string,"
               "media_ref:string,offset:int>>")
    plan = plan_of(extract_operator(docs, 8))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "REBALANCE_PARTITIONS_BY_COL" in plan, plan
    assert len(re.findall(r"\(\d+\) (?:PythonMapInArrow|MapInArrow|MapInPandas)",
                          plan)) == 1, plan
    # no range-sampling repartition (would appear as rangepartitioning)
    assert "rangepartitioning" not in plan, plan


def test_q03_broadcasts_dimension(spark):
    plan = plan_of(REGISTRY["q03_topk_revenue"].spark(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan


def test_q01_pushes_filter_to_scan(spark):
    plan = plan_of(REGISTRY["q01_pricing_summary"].spark(spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" \
        in plan, plan


def test_q01_prunes_columns(spark):
    plan = plan_of(REGISTRY["q01_pricing_summary"].spark(spark, SF_DIR))
    m = re.search(r"ReadSchema: (\S+)", plan)
    assert m, plan
    # 16-column lineitem scan must read only the 5 referenced columns
    assert m.group(1).count(":") <= 6, m.group(1)


def test_ann_broadcasts_queries(spark):
    plan = plan_of(REGISTRY["ann_topk_cosine"].spark(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_lineitem_agg_partial_before_shuffle(spark):
    # map-side combine: HashAggregate appears below AND above the exchange
    plan = plan_of(
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .groupBy("l_returnflag").agg(F.count("*").alias("n")))
    assert len(re.findall(r"HashAggregate", plan)) >= 2, plan
