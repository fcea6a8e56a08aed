"""Production derived-geometry dedup entry point (``cli.py
--dedup-embeddings``, VERDICT r3 item 4): the parquet-footer row estimate
drives ``emb_lsh_geometry`` end to end, and the dup decisions match a
brute-force all-pairs cosine oracle on a small slice."""

import json

import pyspark.sql.functions as F

from pdf_extractor_spark.corpus import (
    COS, DOT_S, PPB_DEDUP, QUANT_S, emb_lsh_geometry, estimate_parquet_rows)

SF_DIR = "/root/testdata/sf0.001"


def test_geometry_derived_from_million_row_footer(spark, tmp_path):
    """A 10^6-row input must push the derived geometry past the sf
    default: footer count -> ppb 14 (16384 buckets/band), without reading
    any column data (constant arrays keep the file tiny; the count is a
    metadata scan)."""
    p = str(tmp_path / "emb1m")
    (spark.range(10**6).select(
        F.col("id").alias("vec_id"),
        F.expr("transform(sequence(1, 64), i -> CAST(0.01 * i AS FLOAT))")
        .alias("embedding"))
     .write.parquet(p))
    n = estimate_parquet_rows(spark, p)
    assert n == 10**6
    ppb = emb_lsh_geometry(n)
    assert ppb == 14
    assert ppb > PPB_DEDUP


def _engineered_input(spark, path: str) -> None:
    """sf0.001 embeddings ∪ perturbed copies (first 8 of 64 dims x 0.9,
    the registry fixture construction whose >=0.98 pairs the recall
    property test already proves the banding recalls losslessly)."""
    e = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
         .select("vec_id",
                 F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
                 .alias("embedding")))
    dup = (e.filter(F.col("vec_id") % 4 == 0)
           .select((F.col("vec_id") + 100000).alias("vec_id"),
                   F.expr(
                       "transform(embedding, (x, i) -> CASE WHEN i < 8 "
                       "THEN (floor(x * 10000 * 0.9) + 0.5) / 10000.0 "
                       "ELSE x END)").alias("embedding")))
    e.unionByName(dup).write.mode("overwrite").parquet(path)


def _fixpoint_labels(pairs: set) -> dict:
    nodes = {v for p in pairs for v in p}
    label = {v: v for v in nodes}
    nbrs = {v: set() for v in nodes}
    for a, b in pairs:
        nbrs[a].add(b)
        nbrs[b].add(a)
    hops = 0
    changed = True
    while changed:
        changed = False
        new = dict(label)
        for v in nodes:
            m = min([label[v]] + [label[u] for u in nbrs[v]])
            if m < new[v]:
                new[v] = m
                changed = True
        label = new
        hops += changed
    return label, hops


def test_cli_decisions_match_bruteforce(spark, tmp_path, capsys):
    inp = str(tmp_path / "emb_in")
    out = str(tmp_path / "dedup_out")
    _engineered_input(spark, inp)

    from pdf_extractor_spark.cli import main
    rc = main(["--dedup-embeddings", inp, "--output", out])
    assert rc == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["mode"] == "dedup_embeddings"
    assert metrics["ppb"] == PPB_DEDUP          # small n -> sf geometry
    assert metrics["dropped_hot_buckets"] == 0  # cap inert on the slice

    # brute-force oracle: all-pairs exact quantized cosine over the SAME
    # input file and quantization
    q = (spark.read.parquet(inp)
         .select("vec_id", F.expr(QUANT_S).alias("qv"))
         .withColumn("nrm", F.expr(
             "aggregate(zip_with(qv, qv, (x, y) -> x * y), "
             "0L, (acc, v) -> acc + v)")))
    a = q.select(F.col("vec_id").alias("vec_a"), F.col("qv").alias("qa"),
                 F.col("nrm").alias("na"))
    y = q.select(F.col("vec_id").alias("vec_b"), F.col("qv").alias("qb"),
                 F.col("nrm").alias("nb"))
    brute = (a.crossJoin(y).filter(F.col("vec_a") < F.col("vec_b"))
             .withColumn("dot", F.expr(DOT_S))
             .withColumn("cos_sim", F.expr(COS))
             .filter(F.col("cos_sim") * 100 >= 98))
    want_pairs = {(r.vec_a, r.vec_b) for r in brute.collect()}
    got_pairs = {(r.vec_a, r.vec_b)
                 for r in spark.read.parquet(f"{out}/pairs").collect()}
    assert want_pairs, "fixture must contain engineered near-dup pairs"
    assert got_pairs == want_pairs
    assert metrics["pairs"] == len(want_pairs)

    # decisions: non-canonical set == fixpoint min-label over brute pairs
    # (guard: the fixture's components must converge within the CLI's 3
    # propagation hops, else raise iterations in both places)
    label, hops = _fixpoint_labels(want_pairs)
    assert hops <= 3, f"fixture diameter {hops} exceeds CLI iterations"
    want_noncanon = {v for v, l in label.items() if l != v}
    dec = spark.read.parquet(f"{out}/decisions").collect()
    got_noncanon = {r.vec_id for r in dec if not r.is_canonical}
    assert got_noncanon == want_noncanon
    assert metrics["non_canonical"] == len(want_noncanon)
