"""Catalog/IO abstraction: Iceberg when the runtime is on the classpath,
partitioned Parquet + JSON manifest emulation otherwise.

The sandbox's pyspark 4.1.2 install ships no iceberg-spark-runtime jar,
so locally we always take the Parquet path; the Iceberg branch is the
deploy-time path (``--packages org.apache.iceberg:iceberg-spark-runtime-...``
+ a catalog conf).  The pipeline core never touches either API directly
(SURVEY.md §7.4 risk 5).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        ext = spark.conf.get("spark.sql.extensions", "") or ""
        return "IcebergSparkSessionExtensions" in ext
    except Exception:
        return False


def read_documents(spark: SparkSession, location: str) -> DataFrame:
    """Read the input documents table (Iceberg table name or parquet path)."""
    if "://" not in location and not os.path.exists(location) and iceberg_available(spark):
        return spark.read.table(location)
    return spark.read.parquet(location)


def write_partitioned(df: DataFrame, location: str, partition_cols: list[str],
                      overwrite_partitions: bool = True) -> None:
    """Write partitioned output; per-partition overwrite for idempotent resume."""
    spark = df.sparkSession
    if iceberg_available(spark) and "/" not in location:
        w = df.writeTo(location)
        if overwrite_partitions:
            w.overwritePartitions()
        else:
            w.append()
        return
    mode = "overwrite" if overwrite_partitions else "append"
    # dynamic partitionOverwriteMode (session.py) => only touched partitions replaced
    df.write.mode(mode).partitionBy(*partition_cols).parquet(location)


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 16,
                   path: str | None = None) -> None:
    """Persist a table bucketed+sorted on ``key`` so repeated joins/aggs on
    that key are co-located — no exchange at read time (the brief's
    "bucketing for co-located joins" lever; Iceberg's equivalent is a
    ``bucket(N, key)`` partition transform).  At 100 TB this is the right
    storage layout for any table joined on its key more than once: the
    shuffle is paid once at write, never per query.

    ``path`` makes it an external table at that location: the data files
    outlive the (in-memory) catalog entry, so a later session can still
    ``spark.read.parquet(path)`` them even though the bucketing METADATA
    is session-scoped without a persistent metastore."""
    w = (df.write.mode("overwrite")
         .bucketBy(n_buckets, key).sortBy(key)
         .format("parquet"))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def append(df: DataFrame, location: str) -> None:
    if iceberg_available(df.sparkSession) and "/" not in location:
        df.writeTo(location).append()
        return
    df.write.mode("append").parquet(location)


def snapshot_id() -> str:
    """A unique snapshot identifier for lineage rows (Iceberg would supply
    its own snapshot id; the parquet emulation mints one)."""
    return f"snap-{int(time.time())}-{uuid.uuid4().hex[:8]}"


def write_manifest(location: str, payload: dict) -> None:
    os.makedirs(location, exist_ok=True)
    with open(os.path.join(location, "_manifest.json"), "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True)


def read_manifest(location: str) -> dict | None:
    p = os.path.join(location, "_manifest.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


# --- Hadoop FileSystem helpers ----------------------------------------------
# Streaming state (index tails, compaction markers) must live on whatever
# filesystem the cluster uses (HDFS, S3A, local).  Python os.* only sees the
# driver's local disk, so state manipulation goes through the JVM's Hadoop
# FileSystem API — the same resolver Spark's own reads/writes use, so any
# path Spark can write, these can list/delete/touch.

def _hadoop_fs(spark: SparkSession, path_str: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path_str)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def fs_list_names(spark: SparkSession, dir_path: str) -> list[str]:
    """Child entry names of ``dir_path`` (empty if it does not exist) —
    a direct listing, never recursive."""
    fs, p = _hadoop_fs(spark, dir_path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def fs_size(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` (file or directory; 0 if absent) — the
    same FileSystem resolver Spark's scans use, so any readable source
    (HDFS/S3A/local) can be sized without planning a scan."""
    fs, p = _hadoop_fs(spark, path)
    if not fs.exists(p):
        return 0
    return int(fs.getContentSummary(p).getLength())


def fs_exists(spark: SparkSession, path: str) -> bool:
    fs, p = _hadoop_fs(spark, path)
    return bool(fs.exists(p))


def fs_delete(spark: SparkSession, path: str) -> None:
    fs, p = _hadoop_fs(spark, path)
    fs.delete(p, True)


def fs_touch(spark: SparkSession, path: str) -> None:
    """Create an empty commit-flag file.  Existence (not content) is the
    signal, so a crash mid-create can never yield a committed flag over
    un-durable data — the flag is only created after the data writes."""
    fs, p = _hadoop_fs(spark, path)
    fs.create(p, True).close()
