"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All operators live in :mod:`pdf_extractor_spark.queries` /
:mod:`pdf_extractor_spark.corpus` (one REGISTRY entry per SURVEY.md §2
operator family + the training-data corpus ops); this file just adapts the
registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pdf_extractor_spark.queries import REGISTRY

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full interleaved-document
    extraction pipeline (skew-salted, Arrow-batched, one shuffle), exploded to
    one row per emitted span.  Driver checks rows>0 + stable schema."""
    return REGISTRY["extract_pipeline"].spark(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + corpus ops."""
    return {name: spec.spark for name, spec in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every registered query — 50/50.  The one
    non-SQL-expressible chain (extract_pipeline) checks against a
    persisted pure-Python-oracle golden parquet keyed by
    (doc_id, md5(text)) (regen: tests/gen_extract_golden.py); its
    stronger exact-parity gate is tests/test_extract_spark.py."""
    return {name: spec.sql for name, spec in sorted(REGISTRY.items())
            if spec.sql is not None}
