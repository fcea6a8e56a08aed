"""Generic AS-OF join operator (operators/asof.py): strict / non-strict
boundary semantics, deterministic tie-breaks, and a second event-type
pair on the driver fixture vs a pure-Python reference."""

import datetime as dt

from pyspark.sql import functions as F

from pdf_extractor_spark.operators.asof import asof_join

T0 = dt.datetime(2026, 3, 1, 12, 0, 0)
S = lambda s: T0 + dt.timedelta(seconds=s)

L_SCHEMA = "k bigint, ts timestamp, l_id bigint"
R_SCHEMA = "k bigint, ts timestamp, r_id bigint, tag string"


def _mk(spark):
    left = spark.createDataFrame(
        [(1, S(10), 100),   # prior right at 5 -> r1
         (1, S(5), 101),    # simultaneous right at 5: strict skips, lax takes
         (1, S(1), 102),    # nothing prior
         (2, S(20), 103)],  # two rights tied at 15 -> max r_id wins
        schema=L_SCHEMA)
    right = spark.createDataFrame(
        [(1, S(5), 200, "a"),
         (2, S(15), 201, "b"),
         (2, S(15), 202, "c")],
        schema=R_SCHEMA)
    return left, right


def test_asof_strict_inner(spark):
    left, right = _mk(spark)
    got = {(r.l_id, r.r_id_r, r.tag_r)
           for r in asof_join(left, right, "k", "ts", "r_id").collect()}
    # l101 (same-ts) and l102 (nothing prior) drop; l103 takes max-id tie
    assert got == {(100, 200, "a"), (103, 202, "c")}


def test_asof_lax_boundary(spark):
    left, right = _mk(spark)
    got = {(r.l_id, r.r_id_r)
           for r in asof_join(left, right, "k", "ts", "r_id",
                              strict=False).collect()}
    # non-strict: the exactly-simultaneous right row at S(5) now matches l101
    assert got == {(100, 200), (101, 200), (103, 202)}


def test_asof_left_keeps_unmatched(spark):
    left, right = _mk(spark)
    rows = {r.l_id: r.r_id_r
            for r in asof_join(left, right, "k", "ts", "r_id",
                               how="left").collect()}
    assert rows == {100: 200, 101: None, 102: None, 103: 202}


def test_asof_second_event_pair_vs_python(spark):
    """view -> most recent strictly-prior click, on the driver events
    fixture, vs a pure-Python scan (the generalization gate: the registry
    query hardcodes click -> purchase; the API must serve any pair)."""
    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    views = (ev.filter(F.col("event_type") == "view")
             .select("user_id", "ts", F.col("event_id").alias("view_id")))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", "ts", F.col("event_id").alias("click_id")))
    got = {(r.view_id, r.click_id_r)
           for r in asof_join(views, clicks, "user_id", "ts",
                              "click_id").collect()}

    rows = sorted(ev.select("event_id", "ts", "user_id", "event_type")
                  .collect(), key=lambda r: (r.user_id, r.ts, r.event_id))
    want = set()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for urows in by_user.values():
        for r in urows:
            if r.event_type != "view":
                continue
            best = None
            for c in urows:
                if c.event_type == "click" and c.ts < r.ts:
                    if best is None or (c.ts, c.event_id) > (best.ts, best.event_id):
                        best = c
            if best is not None:
                want.add((r.event_id, best.event_id))
    assert got == want and len(got) > 10
