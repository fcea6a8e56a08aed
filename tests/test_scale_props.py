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


class TestMinhashBandWidth:
    def test_band_keys_are_64_bit(self, spark):
        """Widened lanes: band keys must be 16 hex chars (64 bits), not 8."""
        sig = REGISTRY["dedup_minhash_signatures"].spark(spark, SF_DIR)
        r = sig.select("band0", "band1", "band2", "band3").first()
        for k in range(4):
            assert len(r[f"band{k}"]) == 16
