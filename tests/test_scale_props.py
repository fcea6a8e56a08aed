"""Scale-safety properties of the dedup/ANN blocking plans (VERDICT r1):
prefix filtering actually shrinks posting lists without losing candidates,
and the banded embedding LSH recalls every engineered near-dup pair."""

import pyspark.sql.functions as F
import pytest

from pdf_extractor_spark.corpus import (
    SHINGLES_S, WORDS_S, _neardup_corpus_s, _prefix_filtered_candidates)
from pdf_extractor_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def shsets(spark):
    return (
        _neardup_corpus_s(spark, SF_DIR)
        .select("doc_id", F.expr(WORDS_S).alias("words"))
        .filter(F.size("words") >= 3)
        .select("doc_id", F.array_distinct(F.expr(SHINGLES_S)).alias("shset"))
    ).cache()


class TestPrefixFilter:
    def test_posting_lists_shrink(self, shsets):
        """The pruned inverted index must be strictly smaller than the full
        one (the whole point: a high-df shingle stops fanning out)."""
        inv = shsets.select("doc_id", F.explode("shset").alias("shingle"))
        full = inv.groupBy("shingle").count()
        # re-derive the prefix index exactly as _prefix_filtered_candidates does
        dfreq = inv.groupBy("shingle").agg(F.count("*").alias("df"))
        from pyspark.sql import Window as W
        wdoc = W.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("shingle"))
        inv_n = (shsets.select("doc_id", F.size("shset").alias("n"),
                               F.explode("shset").alias("shingle")))
        pref = (inv_n.join(dfreq, "shingle")
                .withColumn("rn", F.row_number().over(wdoc))
                .filter(F.col("rn") <= F.expr("n - ((30 * n + 99) div 100) + 1")))
        full_max = full.agg(F.max("count")).first()[0]
        pruned_max = (pref.groupBy("shingle").count()
                      .agg(F.max("count")).first()[0])
        assert pref.count() < inv.count()
        assert pruned_max <= full_max
        # the worst posting list must shrink materially: the most common
        # shingles rank last in almost every doc's prefix
        assert pruned_max < full_max

    @pytest.mark.parametrize("t_pct", [30, 50])
    def test_candidates_lossless_for_threshold(self, shsets, spark, t_pct):
        """Prefix + positional + size filtered candidates ⊇ all pairs with
        Jaccard >= t (prefix-filter guarantee AND the PPJoin positional
        bound must both be lossless, checked exhaustively)."""
        cand = {(r.doc_a, r.doc_b)
                for r in _prefix_filtered_candidates(shsets, t_pct).collect()}
        rows = shsets.collect()
        missed = []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                a, b = rows[i], rows[j]
                sa, sb = set(a.shset), set(b.shset)
                inter = len(sa & sb)
                union = len(sa) + len(sb) - inter
                if union and inter * 100 >= t_pct * union:
                    lo, hi = sorted((a.doc_id, b.doc_id))
                    if (lo, hi) not in cand:
                        missed.append((lo, hi))
        assert not missed, missed[:5]


class TestEmbeddingLshRecall:
    def test_engineered_pairs_all_recalled(self, spark):
        rows = REGISTRY["dedup_embedding_cosine"].spark(spark, SF_DIR).collect()
        eng = {r.vec_a for r in rows if r.vec_b == r.vec_a + 100000}
        n_expected = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
                      .filter(F.col("vec_id") % 4 == 0).count())
        assert len(eng) == n_expected


class TestSimhashBlocking:
    def test_pigeonhole_recall(self, spark):
        """Every engineered original/truncated pair within 60-bit hamming
        distance 3 must be found by the banded variant (4 disjoint 15-bit
        bands + hamming 3 => at least one band matches exactly)."""
        from pdf_extractor_spark.corpus import _simhash_nib_from_text_s
        sigs = (
            _neardup_corpus_s(spark, SF_DIR)
            .filter(F.expr(f"size({WORDS_S}) >= 1"))
            .select("doc_id",
                    F.expr(_simhash_nib_from_text_s(60)).alias("simhash"))
        )
        o, c = sigs.alias("o"), sigs.alias("c")
        eng = (o.join(c, F.col("c.doc_id") == F.col("o.doc_id") + 2000000)
               .select(F.col("o.doc_id").alias("doc_a"),
                       F.col("c.doc_id").alias("doc_b"),
                       F.expr("bit_count(o.simhash ^ c.simhash)").alias("ham")))
        want = {(r.doc_a, r.doc_b) for r in eng.collect() if r.ham <= 3}
        assert want, "fixture should contain near pairs"
        got = {(r.doc_a, r.doc_b)
               for r in REGISTRY["dedup_simhash_blocked"].spark(spark, SF_DIR)
               .collect()}
        assert want <= got, want - got


class TestComponents:
    def test_fixpoint_and_chains(self, spark):
        """3 min-label iterations must reach the fixpoint on the fixture
        (chains have diameter 2), and 3-node chains share one component."""
        rows = REGISTRY["dedup_components"].spark(spark, SF_DIR).collect()
        label = {r.doc_id: r.component for r in rows}
        # fixpoint: one more propagation step changes nothing
        from pdf_extractor_spark.corpus import _edges_s
        edges = [(r.src, r.dst) for r in _edges_s(spark, SF_DIR).collect()]
        for s, d in edges:
            assert label[s] == min(label[s], label[d]), (s, d)
        # chained components: doc 21 links to doc 0's copy, so docs
        # {0, 2000000, 21, 2000021} all carry component 0
        assert label[0] == label[2000000] == label[21] == label[2000021] == 0
        # canonical flag marks exactly the component minima
        for r in rows:
            assert r.is_canonical == (r.doc_id == r.component)


class TestLshGeometry:
    """VERDICT r2 item 5: LSH geometry derives from corpus size and a hot
    bucket cannot go quadratic silently."""

    def test_planes_grow_with_n(self):
        from pdf_extractor_spark.corpus import PPB_DEDUP, emb_lsh_geometry
        # every sf fixture keeps the static default -> oracles stay valid
        for n in (0, 100, 10_700, 16_384):
            assert emb_lsh_geometry(n) == PPB_DEDUP
        # beyond the default's occupancy envelope the bucket space grows
        assert emb_lsh_geometry(10**6) == 14   # 2^14 buckets * 64 occ
        assert emb_lsh_geometry(10**9) == 24
        prev = 0
        for exp in range(3, 12):
            cur = emb_lsh_geometry(10**exp)
            assert cur >= prev
            prev = cur
        # the invariant the rule encodes: expected occupancy <= target
        for n in (10**6, 10**9, 10**12):
            assert n / 2 ** emb_lsh_geometry(n) <= 64

    def test_simhash_band_bits_grow_with_n(self):
        from pdf_extractor_spark.corpus import simhash_band_bits
        assert simhash_band_bits(10_700) == 15   # sf default
        assert simhash_band_bits(10**9) == 30
        # band space outgrows the corpus: expected false candidates/band
        # n^2 / 2^bits stays <= n
        for n in (10**6, 10**9):
            assert n * n / 2 ** simhash_band_bits(n) <= n

    def test_hot_bucket_capped_and_reported(self, spark):
        """Adversarial identical-vector fixture: 40 copies of one vector
        land in the same (band, bucket) cell in EVERY band.  With cap=10
        the cell must be excluded (kept occupancy <= cap), its exclusion
        REPORTED, and unrelated vectors' candidates unaffected."""
        from pdf_extractor_spark.corpus import (
            QUANT_S, _bands_array_s, _bucket_capped, emb_band_candidates,
            PPB_DEDUP, N_EMB_BANDS)
        hot = [(i, [0.5] * 64) for i in range(40)]
        cold = [(100 + i, [0.01 * (i + j) for j in range(64)])
                for i in range(4)]
        df = spark.createDataFrame(
            hot + cold, "vec_id long, embedding array<double>")
        b = (df.select("vec_id", F.expr(QUANT_S).alias("qv"))
             .withColumn("bands", _bands_array_s("qv", PPB_DEDUP)))
        ex = b.select(
            "vec_id", F.posexplode("bands").alias("band_idx", "bucket"))
        kept, dropped = _bucket_capped(ex, cap=10)
        drop_rows = dropped.collect()
        assert drop_rows, "hot cell must be reported, not silently kept"
        # every reported cell contains at least the 40 identical vectors
        # (cold all-positive vectors may share a sign-bucket and ride along)
        assert all(r.bsz >= 40 for r in drop_rows)
        assert len(drop_rows) == N_EMB_BANDS  # identical vectors: every band
        max_occ = (kept.groupBy("band_idx", "bucket").count()
                   .agg(F.max("count")).first()[0])
        assert max_occ <= 10
        # candidate generation: zero pairs from the hot cell, cold pairs
        # (if bucketed together) still present and, crucially, bounded
        cand, _ = emb_band_candidates(b, cap=10)
        pairs = {(r.vec_a, r.vec_b) for r in cand.collect()}
        assert not any(a < 40 and y < 40 for a, y in pairs)

    def test_hot_cell_capped_and_reported(self, spark):
        """dedup_semantic's k-means-cell analog of the hot-bucket guard
        (VERDICT r3 item 2): 40 identical embeddings assigned to one cell
        must be excluded from the intra-cell self-join (bounded pair
        count), their exclusion REPORTED, and cold cells unaffected."""
        from pdf_extractor_spark.corpus import QUANT_S, semantic_cell_pairs
        hot = [(0, i, [0.5] * 64) for i in range(40)]
        cold = [(7, 100 + i, [0.01 * (i + j) for j in range(64)])
                for i in range(4)]
        m = (spark.createDataFrame(
                hot + cold, "cell long, vec_id long, embedding array<double>")
             .select("cell", "vec_id", F.expr(QUANT_S).alias("qv"))
             .withColumn("nrm", F.expr(
                 "aggregate(zip_with(qv, qv, (x, y) -> x * y), "
                 "0L, (acc, v) -> acc + v)")))
        pairs, dropped = semantic_cell_pairs(m, cap=10)
        drop_rows = dropped.collect()
        assert drop_rows, "hot cell must be reported, not silently kept"
        assert [(r.cell, r.bsz) for r in drop_rows] == [(0, 40)]
        got = {(r.vec_a, r.vec_b) for r in pairs.collect()}
        # zero pairs from the hot cell; cold-cell pairing bounded by 4²/2
        assert not any(a < 40 and b < 40 for a, b in got)
        assert len(got) <= 6

    def test_semantic_cap_noop_at_sf_geometry(self, spark):
        """At the default cap the sf fixture drops no cell — the guard is
        provably inert where the DuckDB oracle pins exact pairs (cells on
        the fixture are far below 4096 occupancy)."""
        # the registry row itself is the end-to-end check (oracle parity);
        # here assert the biggest possible cell: every vector in ONE cell
        # still passes through untouched below the cap
        from pdf_extractor_spark.corpus import QUANT_S, semantic_cell_pairs
        e = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
             .select(F.lit(0).alias("cell"), "vec_id",
                     F.expr(QUANT_S).alias("qv"))
             .withColumn("nrm", F.expr(
                 "aggregate(zip_with(qv, qv, (x, y) -> x * y), "
                 "0L, (acc, v) -> acc + v)")))
        _, dropped = semantic_cell_pairs(e)
        assert dropped.count() == 0

    def test_cap_noop_at_sf_geometry(self, spark):
        """At the default cap the sf fixture drops nothing — the guard is
        provably inert where the DuckDB oracle pins exact pairs."""
        from pdf_extractor_spark.corpus import (
            QUANT_S, _bands_array_s, _bucket_capped, PPB_DEDUP)
        e = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
             .select("vec_id", F.expr(QUANT_S).alias("qv"))
             .withColumn("bands", _bands_array_s("qv", PPB_DEDUP)))
        ex = e.select(
            "vec_id", F.posexplode("bands").alias("band_idx", "bucket"))
        _, dropped = _bucket_capped(ex)
        assert dropped.count() == 0


class TestMinhashBandWidth:
    def test_band_keys_are_64_bit(self, spark):
        """Widened lanes: band keys must be 16 hex chars (64 bits), not 8."""
        sig = REGISTRY["dedup_minhash_signatures"].spark(spark, SF_DIR)
        r = sig.select("band0", "band1", "band2", "band3").first()
        for k in range(4):
            assert len(r[f"band{k}"]) == 16
