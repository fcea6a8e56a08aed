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


class TestDedupTexts:
    """Production simhash path (cli --dedup-texts): the simhash_band_bits
    seam end to end, banded signature equivalence, and decisions vs a
    brute-force hamming oracle."""

    def test_band_array_matches_registry_signature_at_15_bits(self, spark):
        """At bits=15 the 4-band array must equal the 60-bit registry
        signature's band split bit for bit (same vote rule)."""
        from pdf_extractor_spark.corpus import (
            WORDS_S, _neardup_corpus_s, _simhash_bands_from_text_s,
            _simhash_nib_from_text_s)
        corpus = (_neardup_corpus_s(spark, SF_DIR)
                  .filter(F.expr(f"size({WORDS_S}) >= 1")))
        rows = (corpus.select(
            "doc_id",
            F.expr(_simhash_nib_from_text_s(60)).alias("sig60"),
            F.expr(_simhash_bands_from_text_s(15)).alias("bands"))
            .collect())
        assert rows
        for r in rows:
            want = [(r.sig60 >> (15 * k)) & 0x7FFF for k in range(4)]
            assert list(r.bands) == want, r.doc_id

    def test_band_width_derives_from_footer(self, spark, tmp_path):
        """10^6-row footer -> 20-bit bands (> the 15-bit sf default)."""
        from pdf_extractor_spark.corpus import (estimate_parquet_rows,
                                                simhash_band_bits)
        p = str(tmp_path / "txt1m")
        (spark.range(10**6)
         .select(F.col("id").alias("doc_id"), F.lit("x y z").alias("text"))
         .write.parquet(p))
        assert simhash_band_bits(estimate_parquet_rows(spark, p)) == 20

    def test_wide_bands_double_digest_recall(self, spark, tmp_path, capsys):
        """bits > 32 switches to the doubled word digest (signature wider
        than one md5); planted exact dups must still collide in every
        band and verify at hamming 0."""
        from pdf_extractor_spark.corpus import _simhash_bands_from_text_s
        sigs = (spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
             (3, "wholly different words here")],
            "doc_id long, text string")
            .select("doc_id",
                    F.expr(_simhash_bands_from_text_s(40)).alias("bands"))
            .collect())
        by_id = {r.doc_id: list(r.bands) for r in sigs}
        assert by_id[1] == by_id[2]
        assert by_id[1] != by_id[3]
        assert all(0 <= b < (1 << 40) for b in by_id[1])

    def test_cli_decisions_match_bruteforce(self, spark, tmp_path, capsys):
        from pdf_extractor_spark.corpus import (WORDS_S, _neardup_corpus_s,
                                                _simhash_bands_from_text_s,
                                                simhash_band_bits)
        inp = str(tmp_path / "txt_in")
        out = str(tmp_path / "txt_out")
        _neardup_corpus_s(spark, SF_DIR).write.parquet(inp)

        from pdf_extractor_spark.cli import main
        rc = main(["--dedup-texts", inp, "--output", out])
        assert rc == 0
        metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert metrics["mode"] == "dedup_texts"
        assert metrics["band_bits"] == simhash_band_bits(metrics["n_est"])
        assert metrics["dropped_hot_bands"] == 0

        # brute-force oracle: all-pairs hamming over the SAME signature
        sigs = (spark.read.parquet(inp)
                .filter(F.expr(f"size({WORDS_S}) >= 1"))
                .select("doc_id", F.expr(_simhash_bands_from_text_s(
                    metrics["band_bits"])).alias("bands")))
        a = sigs.select(F.col("doc_id").alias("doc_a"),
                        F.col("bands").alias("bands_a"))
        b = sigs.select(F.col("doc_id").alias("doc_b"),
                        F.col("bands").alias("bands_b"))
        ham = F.expr("aggregate(zip_with(bands_a, bands_b, "
                     "(x, y) -> bit_count(x ^ y)), 0, (acc, v) -> acc + v)")
        brute = (a.crossJoin(b).filter(F.col("doc_a") < F.col("doc_b"))
                 .withColumn("hamming", ham.cast("int"))
                 .filter(F.col("hamming") <= 3))
        want = {(r.doc_a, r.doc_b) for r in brute.collect()}
        got = {(r.doc_a, r.doc_b)
               for r in spark.read.parquet(f"{out}/pairs").collect()}
        assert want, "fixture must contain engineered near-dup pairs"
        assert got == want
        label, hops = _fixpoint_labels(want)
        assert hops <= 3, f"fixture diameter {hops} exceeds CLI iterations"
        want_noncanon = {v for v, l in label.items() if l != v}
        dec = spark.read.parquet(f"{out}/decisions").collect()
        assert {r.doc_id for r in dec if not r.is_canonical} == want_noncanon
        assert metrics["non_canonical"] == len(want_noncanon)


class TestDedupSemantic:
    """Production SemDeDup path (cli --dedup-semantic, VERDICT r4 item 2):
    the kmeans_k derivation seam end to end, decisions pinned to a
    brute-force exact-cosine oracle, convergence surfaced."""

    def test_k_derives_from_corpus_size(self):
        from pdf_extractor_spark.corpus import (K_IVF, KMEANS_K_MAX,
                                                kmeans_k)
        assert kmeans_k(10**6) == 977          # ceil(1e6/1024)
        assert kmeans_k(10**6) > K_IVF         # past the sf default
        assert kmeans_k(1000) == K_IVF         # fixture floor
        assert kmeans_k(5) == 5                # never more cells than rows
        assert kmeans_k(10**9) == KMEANS_K_MAX  # broadcast ceiling
        assert kmeans_k(0) == K_IVF

    def test_k_derives_from_million_row_footer(self, spark, tmp_path):
        from pdf_extractor_spark.corpus import (estimate_parquet_rows,
                                                kmeans_k)
        p = str(tmp_path / "emb1m")
        (spark.range(10**6).select(
            F.col("id").alias("vec_id"),
            F.expr("transform(sequence(1, 64), i -> CAST(0.01 AS FLOAT))")
            .alias("embedding"))
         .write.parquet(p))
        assert kmeans_k(estimate_parquet_rows(spark, p)) == 977

    def test_cli_decisions_match_bruteforce(self, spark, tmp_path, capsys):
        """Engineered input: sf0.001 embeddings ∪ EXACT copies of
        vec_id%4==0 (identical qv ⇒ identical centroid cosines ⇒ the
        deterministic tie-break assigns both to the same cell, so every
        dup pair is guaranteed intra-cell).  Produced pairs must be a
        subset of the brute-force >=0.98 oracle (verify is exact) and a
        superset of the planted exact dups; decisions must equal the
        fixpoint min-label over the produced pairs."""
        from pdf_extractor_spark.corpus import kmeans_k
        inp = str(tmp_path / "sem_in")
        out = str(tmp_path / "sem_out")
        e = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
             .select("vec_id", "embedding"))
        dup = (e.filter(F.col("vec_id") % 4 == 0)
               .select((F.col("vec_id") + 100000).alias("vec_id"),
                       "embedding"))
        e.unionByName(dup).write.parquet(inp)

        from pdf_extractor_spark.cli import main
        # --target-cell-size 64 pushes the derived K past the sf floor
        # at fixture scale (the 10^6-footer test covers the big-n leg)
        rc = main(["--dedup-semantic", inp, "--output", out,
                   "--target-cell-size", "64"])
        assert rc == 0
        metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert metrics["mode"] == "dedup_semantic"
        assert metrics["k"] == kmeans_k(metrics["n_est"], 64)
        assert metrics["k"] > 8                  # derived, not pinned
        assert metrics["dropped_hot_cells"] == 0
        assert metrics["cc_converged"] is True

        q = (spark.read.parquet(inp)
             .select("vec_id", F.expr(QUANT_S).alias("qv"))
             .withColumn("nrm", F.expr(
                 "aggregate(zip_with(qv, qv, (x, y) -> x * y), "
                 "0L, (acc, v) -> acc + v)")))
        a = q.select(F.col("vec_id").alias("vec_a"),
                     F.col("qv").alias("qa"), F.col("nrm").alias("na"))
        y = q.select(F.col("vec_id").alias("vec_b"),
                     F.col("qv").alias("qb"), F.col("nrm").alias("nb"))
        brute = (a.crossJoin(y).filter(F.col("vec_a") < F.col("vec_b"))
                 .withColumn("dot", F.expr(DOT_S))
                 .withColumn("cos_sim", F.expr(COS))
                 .filter(F.col("cos_sim") >= 0.98))
        want_all = {(r.vec_a, r.vec_b) for r in brute.collect()}
        planted = {(r.vec_id, r.vec_id + 100000)
                   for r in e.filter(F.col("vec_id") % 4 == 0).collect()}
        got = {(r.vec_a, r.vec_b)
               for r in spark.read.parquet(f"{out}/pairs").collect()}
        assert planted, "fixture must plant exact duplicates"
        assert planted <= got          # same-cell guarantee for exact dups
        assert got <= want_all         # exact verify: no false positives
        assert metrics["pairs"] == len(got)

        label, _hops = _fixpoint_labels(got)
        want_noncanon = {v for v, l in label.items() if l != v}
        dec = spark.read.parquet(f"{out}/decisions").collect()
        assert {r.vec_id for r in dec if not r.is_canonical} == want_noncanon
        assert metrics["non_canonical"] == len(want_noncanon)
