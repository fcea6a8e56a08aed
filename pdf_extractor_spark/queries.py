"""Query/operator registry: the SURVEY.md §2 operator inventory re-expressed
over the driver's parquet tables, each with a DuckDB oracle SQL.

Every entry is (a) an idiomatic-Spark DataFrame implementation and (b) an
ANSI-SQL equivalent DuckDB runs on the same parquet — the driver compares
row counts, schemas, and order-insensitive value hashes (see
``__spark_entry__.py``).

Cross-engine exactness rules (so value hashes match bit-for-bit):

* Sums/aggregates go through DECIMAL or integer arithmetic, never
  accumulated doubles (double sum order differs between engines); final
  outputs are cast to double/bigint from exact values.
* Ratio thresholds are cross-multiplied integers (``a*10 >= 6*b`` instead
  of ``a/b >= 0.6``).
* Top-k orderings always end in a unique key so membership at the cutoff
  is deterministic.
* Cross-engine hashing uses md5 hex strings (identical in Spark and
  DuckDB); embedding math is quantized to int64 before any dot product.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


@dataclass
class QuerySpec:
    spark: Callable[[SparkSession, str], DataFrame]
    sql: str | None          # DuckDB oracle; None => rows-only check
    doc: str                 # SURVEY §2 operator ids covered


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, sql: str | None, doc: str):
    def deco(fn):
        REGISTRY[name] = QuerySpec(spark=fn, sql=sql, doc=doc)
        return fn
    return deco


# Tables whose downstream registry queries are per-row CPU-bound (md5 per
# shingle, vote folds, regex batteries, vector math) rather than scan-bound.
_COMPUTE_HEAVY = {"documents", "embeddings"}


# scan-split estimates per parquet path: invariant within a session — cache
# so repeated t() calls don't re-stat the same files
_SCAN_PARTS: dict[str, int] = {}


def _bytes_conf(spark: SparkSession, key: str, default: int) -> int:
    raw = str(spark.conf.get(key, str(default))).strip().lower()
    for suffix, mult in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                         ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                         ("b", 1)):
        if raw.endswith(suffix) and raw[: -len(suffix)].isdigit():
            return int(raw[: -len(suffix)]) * mult
    return int(raw) if raw.isdigit() else default


def _scan_split_estimate(spark: SparkSession, df: DataFrame,
                         path: str) -> int:
    """How many partitions the file scan will yield, via Spark's own
    FilePartition packing arithmetic (maxSplitBytes = min(maxPartitionBytes,
    max(openCostInBytes, totalBytes/defaultParallelism)); files split at
    maxSplitBytes and bin-packed with openCost padding) computed from the
    parquet footprint through the Hadoop FileSystem — no df.rdd conversion,
    no physical planning of the scan."""
    from .sources import catalog
    n_files = max(1, len(df.inputFiles()))
    data_bytes = catalog.fs_size(spark, path)
    open_cost = _bytes_conf(spark, "spark.sql.files.openCostInBytes", 4 << 20)
    max_pb = _bytes_conf(spark, "spark.sql.files.maxPartitionBytes", 128 << 20)
    total = data_bytes + n_files * open_cost
    per_core = total // max(1, spark.sparkContext.defaultParallelism)
    max_split = min(max_pb, max(open_cost, per_core))
    return max(1, -(-total // max_split))


def t(spark: SparkSession, sf_dir: str, name: str,
      spread: bool = True) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if spread and name in _COMPUTE_HEAVY:
        # Parquet scans split by file size, so a small or well-compressed
        # corpus slice can arrive in far fewer partitions than cores while
        # its per-row compute is the real bottleneck (sf0.1 documents =
        # one 0.6 MB row-group = ONE task for every signature pass).
        # Spread it to the session parallelism; on a real cluster where
        # the scan already yields >= that many splits this branch never
        # fires, so no extra shuffle is introduced at scale.
        target = spark.sparkContext.defaultParallelism
        path = f"{sf_dir}/{name}.parquet"
        if path not in _SCAN_PARTS:
            _SCAN_PARTS[path] = _scan_split_estimate(spark, df, path)
        if _SCAN_PARTS[path] < target:
            df = df.repartition(target)
    return df


DEC = "decimal(18,2)"

# ---------------------------------------------------------------------------
# Relational core: scans, aggregations, joins, top-k (SURVEY §2.1/§2.4/§2.6)
# ---------------------------------------------------------------------------

@register(
    "q01_pricing_summary",
    sql="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="A1-family groupBy aggregate battery (TPC-H Q1 shape); map-side partial agg",
)
def q01_pricing_summary(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    qty = F.col("l_quantity").cast(DEC)
    price = F.col("l_extendedprice").cast(DEC)
    disc1 = (F.lit(1) - F.col("l_discount")).cast(DEC)
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * disc1).cast("double").alias("sum_disc_price"),
            (F.sum(qty).cast("double") / F.count("*").cast("double")).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q03_topk_revenue",
    sql="""
    SELECT l.l_orderkey AS orderkey, o.o_orderdate AS orderdate,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15' AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, orderdate ASC, orderkey ASC
    LIMIT 10
    """,
    doc="K4/W5 top-k after multi-join; broadcast dim join (TPC-H Q3 shape)",
)
def q03_topk_revenue(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    rev = (F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("l_orderkey").alias("orderkey"), F.col("o_orderdate").alias("orderdate"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("orderdate"), F.asc("orderkey"))
        .limit(10)
    )


@register(
    "q05_nation_revenue",
    sql="""
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'AFRICA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY n.n_name
    """,
    doc="multi-join with broadcast dims + co-located key condition (TPC-H Q5 shape)",
)
def q05_nation_revenue(spark, sf_dir):
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1999-01-01"))
    l = t(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (s.s_suppkey == l.l_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count("*").alias("n_items"))
    )


@register(
    "k2_maxby_tiebreak",
    sql="""
    SELECT p_type, p_partkey, p_retailprice FROM (
      SELECT p_type, p_partkey, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_type
                                ORDER BY p_retailprice DESC, p_name DESC, p_partkey) AS rn
      FROM part) WHERE rn = 1
    """,
    doc="K2 max-by with (size,text) tuple tie-break (extractor.py:563-571)",
)
def k2_maxby_tiebreak(spark, sf_dir):
    w = W.partitionBy("p_type").orderBy(
        F.desc("p_retailprice"), F.desc("p_name"), F.asc("p_partkey"))
    return (
        t(spark, sf_dir, "part")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("p_type", "p_partkey", "p_retailprice")
    )


# ---------------------------------------------------------------------------
# Window / ordered-adjacency operators (SURVEY §2.5)
# ---------------------------------------------------------------------------

# W2/W4/U1/U2/TT1/W3 ship as legs of the battery_micro_ops registry entry
# (windowed.py): the driver's correctness file records the first 50
# registry names only, so the micro-analog operators are folded into
# combined entries (scorer_battery-style) to keep EVERY SURVEY §2
# operator's oracle inside a checked row.  The functions and their
# oracle SQL are unchanged — the battery unions them with aligned casts.

W2_SQL = """
    SELECT user_id, event_id, gap_s FROM (
      SELECT user_id, event_id,
             DATEDIFF('second', ts,
                      LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_s
      FROM events) WHERE gap_s > 600
    """


def w2_next_gap(spark, sf_dir):
    """W2 colon-heading lookahead analog: lead() vertical-gap predicate
    (extractor.py:117-121)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t(spark, sf_dir, "events")
        .withColumn("gap_s", (F.unix_timestamp(F.lead("ts").over(w))
                              - F.unix_timestamp("ts")))
        .filter(F.col("gap_s") > 600)
        .select("user_id", "event_id", "gap_s")
    )


W4_SQL = """
    SELECT user_id, day, event_id FROM (
      SELECT user_id, CAST(ts AS DATE) AS day, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts, event_id) AS rn
      FROM events) WHERE rn <= 3
    """


def w4_top3_per_page(spark, sf_dir):
    """T2/W4 first-3-lines-per-page projection (extractor.py:254-284)."""
    e = t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    w = W.partitionBy("user_id", "day").orderBy("ts", "event_id")
    return (e.withColumn("rn", F.row_number().over(w))
             .filter("rn <= 3").select("user_id", "day", "event_id"))


@register(
    "f2_recurring_keys",
    sql="""
    WITH active AS (
      SELECT DISTINCT user_id, event_type, CAST(ts AS DATE) AS day FROM events),
    per_key AS (
      SELECT user_id, event_type, COUNT(DISTINCT day) AS nd
      FROM active GROUP BY user_id, event_type),
    per_user AS (
      SELECT user_id, COUNT(DISTINCT day) AS total FROM active GROUP BY user_id)
    SELECT k.user_id, k.event_type, k.nd, u.total
    FROM per_key k JOIN per_user u ON k.user_id = u.user_id
    WHERE k.nd * 10 >= 6 * u.total
    """,
    doc="A2/F2 recurring-header detection: key on >=60% of pages (extractor.py:286-321)",
)
def f2_recurring_keys(spark, sf_dir):
    active = (t(spark, sf_dir, "events")
              .select("user_id", "event_type", F.to_date("ts").alias("day")).distinct())
    per_key = active.groupBy("user_id", "event_type").agg(F.countDistinct("day").alias("nd"))
    per_user = active.groupBy("user_id").agg(F.countDistinct("day").alias("total"))
    return (per_key.join(F.broadcast(per_user), "user_id")
            .filter(F.col("nd") * 10 >= 6 * F.col("total"))
            .select("user_id", "event_type", "nd", "total"))


@register(
    "f2_anti_join_filter",
    sql="""
    WITH active AS (
      SELECT DISTINCT user_id, event_type, CAST(ts AS DATE) AS day FROM events),
    per_key AS (
      SELECT user_id, event_type, COUNT(DISTINCT day) AS nd
      FROM active GROUP BY user_id, event_type),
    per_user AS (
      SELECT user_id, COUNT(DISTINCT day) AS total FROM active GROUP BY user_id),
    recurring AS (
      SELECT k.user_id, k.event_type FROM per_key k
      JOIN per_user u ON k.user_id = u.user_id WHERE k.nd * 10 >= 6 * u.total)
    SELECT e.event_type, COUNT(*) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events e ANTI JOIN recurring r
      ON e.user_id = r.user_id AND e.event_type = r.event_type
    GROUP BY e.event_type
    """,
    doc="F2 application: left-anti join of blocks against recurring keys (extractor.py:347-359)",
)
def f2_anti_join_filter(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    rec = f2_recurring_keys(spark, sf_dir).select("user_id", "event_type")
    return (e.join(rec, ["user_id", "event_type"], "left_anti")
            .groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value")))


@register(
    "f3_local_window_ratio",
    sql="""
    SELECT l_returnflag, COUNT(*) AS n_table_like FROM (
      SELECT l_returnflag, l_quantity,
             SUM(CASE WHEN l_quantity < 25 THEN 1 ELSE 0 END)
               OVER (PARTITION BY l_orderkey
                     ORDER BY l_linenumber, l_quantity, l_returnflag, l_extendedprice
                     ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS n_short,
             COUNT(*) OVER (PARTITION BY l_orderkey
                            ORDER BY l_linenumber, l_quantity, l_returnflag, l_extendedprice
                            ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS n_local
      FROM lineitem)
    WHERE l_quantity < 25 AND n_short * 10 > 6 * n_local
    GROUP BY l_returnflag
    """,
    doc="F3 table-content filter analog: ±k row frame, local ratio > 0.6 (extractor.py:387-421)",
)
def f3_local_window_ratio(spark, sf_dir):
    # (l_orderkey, l_linenumber) is NOT unique in the driver's synthetic
    # lineitem; extend the ordering until remaining ties are interchangeable
    # (equal l_quantity + l_returnflag) so the ±2 frame is engine-independent
    w = (W.partitionBy("l_orderkey")
         .orderBy("l_linenumber", "l_quantity", "l_returnflag", "l_extendedprice")
         .rowsBetween(-2, 2))
    l = (t(spark, sf_dir, "lineitem")
         .withColumn("n_short", F.sum(F.when(F.col("l_quantity") < 25, 1).otherwise(0)).over(w))
         .withColumn("n_local", F.count("*").over(w)))
    return (l.filter((F.col("l_quantity") < 25) & (F.col("n_short") * 10 > 6 * F.col("n_local")))
            .groupBy("l_returnflag").agg(F.count("*").alias("n_table_like")))


@register(
    "a1_font_distribution",
    sql="""
    WITH buckets AS (
      SELECT source, n_chars // 16 AS bucket, COUNT(*) AS cnt
      FROM documents GROUP BY source, n_chars // 16),
    tot AS (SELECT source, SUM(cnt) AS total FROM buckets GROUP BY source),
    dom AS (
      SELECT source, bucket AS dominant FROM (
        SELECT source, bucket,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY cnt DESC, bucket ASC) AS rn
        FROM buckets) WHERE rn = 1)
    SELECT b.source,
           MAX(d.dominant) AS dominant_bucket,
           -- CAST: DuckDB types SUM(CASE...) as HUGEINT; Spark returns bigint
           CAST(SUM(CASE WHEN b.bucket > d.dominant AND b.cnt * 20 <= t.total
                         AND b.bucket - d.dominant >= 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_h1,
           CAST(SUM(CASE WHEN b.bucket > d.dominant AND b.cnt * 20 <= t.total
                         AND b.bucket - d.dominant >= 2 AND b.bucket - d.dominant < 4
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_h2,
           CAST(SUM(CASE WHEN b.bucket > d.dominant AND b.cnt * 20 <= t.total
                         AND b.bucket - d.dominant >= 1 AND b.bucket - d.dominant < 2
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_h3
    FROM buckets b JOIN dom d ON b.source = d.source JOIN tot t ON b.source = t.source
    GROUP BY b.source
    """,
    doc="A1 font-distribution aggregate: mode + <=5%-share candidates leveled by diff "
        "(extractor.py:211-252), n_chars//16 standing in for font size",
)
def a1_font_distribution(spark, sf_dir):
    # spread=False: this query's only per-row work is an integer divide —
    # its first groupBy shuffle redistributes anyway, so the heavy-table
    # spread repartition would be a pure extra exchange here
    d = t(spark, sf_dir, "documents", spread=False) \
        .withColumn("bucket", F.expr("n_chars div 16"))
    buckets = d.groupBy("source", "bucket").agg(F.count("*").alias("cnt"))
    tot = buckets.groupBy("source").agg(F.sum("cnt").alias("total"))
    wdom = W.partitionBy("source").orderBy(F.desc("cnt"), F.asc("bucket"))
    dom = (buckets.withColumn("rn", F.row_number().over(wdom)).filter("rn = 1")
           .select("source", F.col("bucket").alias("dominant")))
    b = buckets.join(F.broadcast(dom), "source").join(F.broadcast(tot), "source")
    is_cand = (F.col("bucket") > F.col("dominant")) & (F.col("cnt") * 20 <= F.col("total"))
    diff = F.col("bucket") - F.col("dominant")
    return b.groupBy("source").agg(
        F.max("dominant").alias("dominant_bucket"),
        F.sum(F.when(is_cand & (diff >= 4), 1).otherwise(0)).alias("n_h1"),
        F.sum(F.when(is_cand & (diff >= 2) & (diff < 4), 1).otherwise(0)).alias("n_h2"),
        F.sum(F.when(is_cand & (diff >= 1) & (diff < 2), 1).otherwise(0)).alias("n_h3"),
    )


# ---------------------------------------------------------------------------
# Set ops & scalar battery (SURVEY §2.7/§2.8/§2.9)
# ---------------------------------------------------------------------------

KEYWORDS = ("spark", "window", "join", "order", "batch")


U2_SQL = f"""
    WITH w AS (
      SELECT doc_id, list_distinct(string_split(trim(text), ' ')) AS words FROM documents)
    SELECT doc_id,
           len(list_filter(words, x -> x IN {KEYWORDS!r})) AS n_common,
           len(words) AS n_words,
           (len(list_filter(words, x -> x IN {KEYWORDS!r})) * 10
              >= 8 * len(words)) AND len(words) >= 3 AS is_dup
    FROM w
    """


def u2_word_overlap(spark, sf_dir):
    """U2/F6 word-set intersection ratio >= 0.8 with >= 3 words
    (extractor.py:861-871)."""
    kw = F.array(*[F.lit(k) for k in KEYWORDS])
    d = (t(spark, sf_dir, "documents")
         .withColumn("words", F.array_distinct(F.split(F.trim("text"), " "))))
    n_common = F.size(F.array_intersect("words", kw))
    n_words = F.size("words")
    return d.select(
        "doc_id",
        n_common.alias("n_common"),
        n_words.alias("n_words"),
        ((n_common * 10 >= 8 * n_words) & (n_words >= 3)).alias("is_dup"),
    )


@register(
    "scorer_battery",
    sql=r"""
    WITH blocks AS (
      SELECT doc_id,
             concat(CAST(1 + doc_id % 3 AS VARCHAR),
                    CASE WHEN doc_id % 7 = 0 THEN '.' ELSE '' END, ' ',
                    CASE WHEN doc_id % 13 = 0 THEN 'Appendix ' ELSE '' END,
                    CASE WHEN doc_id % 2 = 0 THEN upper(substr(text, 1, 40))
                         ELSE substr(text, 1, 40) END) AS btext,
             doc_id % 5 = 0 AS bold
      FROM documents),
    scored AS (
      SELECT doc_id, btext, bold,
             regexp_matches(btext, '^\d+\.?\s+[A-Z]') AS numbered,
             (btext LIKE '%required%' OR btext LIKE '%amount%' OR btext LIKE '%pay%'
              OR btext LIKE '%si%' OR btext LIKE '%details%') AS vetoed,
             upper(btext) = btext AND lower(btext) <> btext AND length(btext) < 60 AS allcaps,
             regexp_matches(btext, '^(Appendix|Phase)') AS appx
      FROM blocks)
    SELECT doc_id,
           (CASE WHEN numbered AND NOT vetoed THEN 3 ELSE 0 END
            + CASE WHEN bold THEN 2 ELSE 0 END
            + CASE WHEN allcaps THEN 2 ELSE 0 END
            + CASE WHEN appx THEN 3 ELSE 0 END) AS score,
           (CASE WHEN numbered AND NOT vetoed THEN 3 ELSE 0 END
            + CASE WHEN bold THEN 2 ELSE 0 END
            + CASE WHEN allcaps THEN 2 ELSE 0 END
            + CASE WHEN appx THEN 3 ELSE 0 END) >= 4 AS is_heading
    FROM scored
    """,
    doc="§2.9 heading scorer + §2.8 scalar/regex battery + F4/F5/F7 as a pure "
        "column-expression ladder (extractor.py:146-207)",
)
def scorer_battery(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    btext = F.concat(
        (1 + F.col("doc_id") % 3).cast("string"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(".")).otherwise(F.lit("")),
        F.lit(" "),
        F.when(F.col("doc_id") % 13 == 0, F.lit("Appendix ")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 2 == 0, F.upper(F.substring("text", 1, 40)))
         .otherwise(F.substring("text", 1, 40)),
    )
    b = d.select("doc_id", btext.alias("btext"), (F.col("doc_id") % 5 == 0).alias("bold"))
    numbered = F.col("btext").rlike(r"^\d+\.?\s+[A-Z]")
    vetoed = (F.col("btext").contains("required") | F.col("btext").contains("amount")
              | F.col("btext").contains("pay") | F.col("btext").contains("si")
              | F.col("btext").contains("details"))
    allcaps = ((F.upper("btext") == F.col("btext")) & (F.lower("btext") != F.col("btext"))
               & (F.length("btext") < 60))
    appx = F.col("btext").rlike(r"^(Appendix|Phase)")
    score = (F.when(numbered & ~vetoed, 3).otherwise(0)
             + F.when(F.col("bold"), 2).otherwise(0)
             + F.when(allcaps, 2).otherwise(0)
             + F.when(appx, 3).otherwise(0))
    return b.select("doc_id", score.alias("score"), (score >= 4).alias("is_heading"))


U1_SQL = """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """


def u1_distinct_keys(spark, sf_dir):
    """U1 distinct key sets (extractor.py:288,319)."""
    return (t(spark, sf_dir, "events").groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n_users"),
                 F.count("*").alias("n_events")))


# populate REGISTRY with the training-data corpus operators (dedup /
# similarity / text-analysis / multimodal) — import is at the bottom so
# `register` and `t` exist when corpus.py binds them
from . import corpus  # noqa: E402,F401  (registry side-effect import)
from . import windowed  # noqa: E402,F401  (registry side-effect import)
