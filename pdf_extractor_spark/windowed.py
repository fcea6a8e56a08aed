"""Windowed / 1B-surface operators: W3 consecutive merge, B2 chunking,
B6 multi-factor ranking (SURVEY.md §2.5 / §2.11).

The extraction pipeline runs W3 inside the per-doc pandas group (greedy
pairwise scan, reference `extractor.py:574-626`); this module additionally
expresses the same greedy no-transitive-chain semantics *relationally* — a
gaps-and-islands window plan that scales as ordinary shuffles — so the
operator family is verifiable against a DuckDB oracle too.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .plans.selection import CHUNK_STRIDE, CHUNK_WORDS
# module import (not from-import): windowed.py is imported at the BOTTOM of
# queries.py, after the battery leg functions/SQL it references are defined
from . import queries
from .queries import register, t

# shared chunking fragments (Spark + DuckDB dialects), parameterized on the
# SAME constants plans/selection.py uses — retuning CHUNK_WORDS/CHUNK_STRIDE
# retunes the b2/b8 registry queries AND their oracles in one place.
# min tail: a window starts at c*STRIDE and must cover >= WORDS-STRIDE+1
# fresh words, so the last chunk index is (n_words - _TAIL) div STRIDE.
_TAIL = CHUNK_WORDS - CHUNK_STRIDE + 1
CHUNK_IDX_D = (f"unnest(range(0, greatest(0, (len(words) - {_TAIL}) "
               f"// {CHUNK_STRIDE}) + 1)) AS u(c)")
CHUNK_SLICE_D = (f"words[(u.c * {CHUNK_STRIDE} + 1):"
                 f"(u.c * {CHUNK_STRIDE} + {CHUNK_WORDS})]")
CHUNK_IDX_S = (f"sequence(0, greatest(0, (size(words) - {_TAIL}) "
               f"div {CHUNK_STRIDE}))")
CHUNK_SLICE_S = f"slice(words, chunk_idx * {CHUNK_STRIDE} + 1, {CHUNK_WORDS})"



W3_SQL = """
    WITH base AS (
      SELECT user_id, event_id, event_type, value, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS idx
      FROM events),
    flagged AS (
      SELECT *,
             (LEAD(event_type) OVER w = event_type
              AND DATEDIFF('second', ts, LEAD(ts) OVER w) < 300) AS m
      FROM base
      WINDOW w AS (PARTITION BY user_id ORDER BY idx)),
    islands AS (
      -- greedy pairwise semantics: within a run of consecutive merge flags,
      -- merges fire at run positions 0,2,4,... (one lookahead, no chains)
      SELECT user_id, idx,
             ROW_NUMBER() OVER (PARTITION BY user_id, idx - rn_true
                                ORDER BY idx) - 1 AS pos_in_run
      FROM (SELECT user_id, idx,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY idx) AS rn_true
            FROM flagged WHERE m)),
    eff AS (
      SELECT f.user_id, f.idx, f.event_id, f.event_type, f.value,
             COALESCE(i.pos_in_run % 2 = 0, FALSE) AS merge_eff,
             LEAD(f.value) OVER (PARTITION BY f.user_id ORDER BY f.idx) AS next_value,
             LEAD(f.event_id) OVER (PARTITION BY f.user_id ORDER BY f.idx)
               AS next_event_id
      FROM flagged f LEFT JOIN islands i
        ON i.user_id = f.user_id AND i.idx = f.idx),
    final AS (
      SELECT *,
             COALESCE(LAG(merge_eff) OVER (PARTITION BY user_id ORDER BY idx),
                      FALSE) AS consumed
      FROM eff)
    SELECT user_id, event_id, event_type,
           CASE WHEN merge_eff
                THEN CAST(CAST(value AS DECIMAL(18,2))
                          + CAST(next_value AS DECIMAL(18,2)) AS DOUBLE)
                ELSE CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) END AS merged_value,
           CASE WHEN merge_eff THEN next_event_id ELSE NULL END AS absorbed_event_id
    FROM final WHERE NOT consumed
    """


def w3_consecutive_merge(spark, sf_dir):
    """W3 consecutive-merge (extractor.py:574-626) as a relational plan:
    lead() merge predicate, gaps-and-islands parity for the greedy
    one-lookahead no-chain rule, lag() consume flag — window shuffles
    only, no per-row Python.  Registry leg of battery_micro_ops."""
    e = t(spark, sf_dir, "events")
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    base = e.withColumn("idx", F.row_number().over(wo))
    wi = W.partitionBy("user_id").orderBy("idx")
    flagged = base.withColumn(
        "m",
        (F.lead("event_type").over(wi) == F.col("event_type"))
        & ((F.unix_timestamp(F.lead("ts").over(wi)) - F.unix_timestamp("ts")) < 300),
    )
    trues = (flagged.filter("m")
             .withColumn("rn_true", F.row_number().over(wi))
             .withColumn("pos_in_run",
                         F.row_number().over(
                             W.partitionBy("user_id", F.col("idx") - F.col("rn_true"))
                             .orderBy("idx")) - 1)
             # rename before the self-join: trues derives from flagged, so
             # unrenamed user_id/idx would resolve to the SAME attributes and
             # the join predicate would be trivially true across users
             .select(F.col("user_id").alias("t_user_id"),
                     F.col("idx").alias("t_idx"), "pos_in_run"))
    eff = (
        flagged.join(trues,
                     (flagged.user_id == trues.t_user_id)
                     & (flagged.idx == trues.t_idx), "left")
        .drop("t_user_id", "t_idx")
        .withColumn("merge_eff", F.coalesce(F.col("pos_in_run") % 2 == 0, F.lit(False)))
        .withColumn("next_value", F.lead("value").over(wi))
        .withColumn("next_event_id", F.lead("event_id").over(wi))
    )
    final = eff.withColumn(
        "consumed", F.coalesce(F.lag("merge_eff").over(wi), F.lit(False)))
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        final.filter(~F.col("consumed"))
        .select(
            "user_id", "event_id", "event_type",
            F.when(F.col("merge_eff"), (dec("value") + dec("next_value"))
                   .cast("double"))
             .otherwise(dec("value").cast("double")).alias("merged_value"),
            F.when(F.col("merge_eff"), F.col("next_event_id"))
             .otherwise(F.lit(None).cast("bigint")).alias("absorbed_event_id"),
        )
    )


@register(
    "b2_semantic_chunking",
    sql=f"""
    WITH w AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words
      FROM documents),
    c AS (
      SELECT doc_id, len(words) AS n_words, u.c AS chunk_idx,
             array_to_string({CHUNK_SLICE_D}, ' ') AS chunk_text
      FROM w, {CHUNK_IDX_D}
      WHERE len(words) > 0)
    SELECT doc_id, chunk_idx, n_words,
           chunk_idx * {CHUNK_STRIDE} AS start_word,
           chunk_text, length(chunk_text) AS chunk_chars
    FROM c
    """,
    doc="B2 semantic chunking (README.md:108-117): sliding 60-word windows "
        "with 10-word overlap via explode(sequence) + slice — posexplode "
        "over computed offsets, no UDF, no shuffle",
)
def b2_semantic_chunking(spark, sf_dir):
    w = (t(spark, sf_dir, "documents")
         .select("doc_id",
                 F.expr("filter(split(text, ' '), x -> x <> '')").alias("words"))
         .filter(F.size("words") > 0))
    c = (w.select(
            "doc_id", F.size("words").alias("n_words"), "words",
            F.explode(F.expr(CHUNK_IDX_S)).alias("chunk_idx"))
         .withColumn("chunk_text",
                     F.expr(f"array_join({CHUNK_SLICE_S}, ' ')")))
    return c.select(
        "doc_id", "chunk_idx", "n_words",
        (F.col("chunk_idx") * CHUNK_STRIDE).alias("start_word"),
        "chunk_text", F.length("chunk_text").alias("chunk_chars"),
    )


@register(
    "tfidf_terms",
    sql="""
    WITH terms AS (
      SELECT doc_id, unnest(list_distinct(
               list_filter(string_split(text, ' '), x -> x <> ''))) AS term
      FROM documents),
    dfreq AS (SELECT term, COUNT(*) AS n_df FROM terms GROUP BY term),
    tot AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT term, n_df, n_docs,
           (CAST(n_docs AS DOUBLE) - CAST(n_df AS DOUBLE) + 0.5)
             / (CAST(n_df AS DOUBLE) + 0.5) AS idf
    FROM dfreq, tot
    """,
    doc="A7 real TF-IDF (README.md:152 initialize_tfidf): the cross-document "
        "IDF aggregate — explode distinct terms, groupBy term -> document "
        "frequency, join the corpus-size scalar.  idf is the ln-free "
        "BM25-style (N - df + 0.5)/(df + 0.5): one exact subtraction chain "
        "plus one correctly-rounded division, so both engines agree "
        "bit-for-bit (ln() rounding is libm-dependent).  One shuffle on "
        "term with map-side combine; vocabulary ~Heaps-sublinear in corpus "
        "size, so the result broadcasts to consumers",
)
def tfidf_terms(spark, sf_dir):
    words = F.expr("filter(split(text, ' '), x -> x <> '')")
    terms = (t(spark, sf_dir, "documents")
             .select("doc_id", F.explode(F.array_distinct(words)).alias("term")))
    dfreq = terms.groupBy("term").agg(F.count("*").alias("n_df"))
    tot = t(spark, sf_dir, "documents").agg(F.count("*").alias("n_docs"))
    idf = ((F.col("n_docs").cast("double") - F.col("n_df").cast("double") + F.lit(0.5))
           / (F.col("n_df").cast("double") + F.lit(0.5)))
    return (dfreq.crossJoin(F.broadcast(tot))
            .select("term", "n_df", "n_docs", idf.alias("idf")))


@register(
    "b6_multifactor_rank",
    sql="""
    WITH f AS (
      SELECT doc_id, source,
             len(list_filter(list_filter(string_split(text,' '), x -> x <> ''),
                 x -> x IN ('the','a','of','and','to','in','is','it'))) AS n_stop,
             len(list_filter(string_split(text,' '), x -> x <> '')) AS n_words,
             n_chars
      FROM documents),
    terms AS (
      SELECT doc_id, unnest(list_distinct(
               list_filter(string_split(text, ' '), x -> x <> ''))) AS term
      FROM documents),
    dfreq AS (SELECT term, COUNT(*) AS n_df FROM terms GROUP BY term),
    tot AS (SELECT COUNT(*) AS n_docs FROM documents),
    idf AS (
      SELECT term,
             CAST(floor(((CAST(n_docs AS DOUBLE) - CAST(n_df AS DOUBLE) + 0.5)
                         / (CAST(n_df AS DOUBLE) + 0.5)) * 10000) AS BIGINT) AS q_idf
      FROM dfreq, tot),
    per_doc AS (
      SELECT t.doc_id, CAST(SUM(i.q_idf) AS BIGINT) AS sum_q, COUNT(*) AS n_terms
      FROM terms t JOIN idf i ON t.term = i.term GROUP BY t.doc_id),
    s AS (
      SELECT f.doc_id, f.source,
             0.4 * (CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE))
             + 0.3 * (CAST(sum_q AS DOUBLE) / (10000.0 * CAST(n_terms AS DOUBLE)))
             + 0.15 * (1.0 / CAST(1 + f.doc_id % 4 AS DOUBLE))
             + 0.15 * (CAST(n_chars AS DOUBLE) / 600.0) AS score
      FROM f JOIN per_doc p ON p.doc_id = f.doc_id WHERE n_words > 0)
    SELECT source, importance_rank, doc_id, score FROM (
      SELECT source, doc_id, score,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY score DESC, doc_id ASC) AS importance_rank
      FROM s) WHERE importance_rank <= 5
    """,
    doc="B6/W5/K4 multi-factor importance ranking (README.md:156-172): "
        "0.4·semantic + 0.3·REAL-tfidf + 0.15·structural + 0.15·contextual "
        "weighted sum, per-source top-5 with deterministic tie-break.  The "
        "tfidf leg consumes the cross-doc IDF aggregate (tfidf_terms): "
        "per-doc mean idf over distinct terms, int64-quantized "
        "(floor(idf*1e4)) before summing so the aggregate is "
        "order-independent and hash-exact cross-engine",
)
def b6_multifactor_rank(spark, sf_dir):
    words = F.expr("filter(split(text, ' '), x -> x <> '')")
    stops = F.expr(
        "size(filter(filter(split(text,' '), x -> x <> ''), "
        "x -> x IN ('the','a','of','and','to','in','is','it')))")
    f = (t(spark, sf_dir, "documents")
         .select("doc_id", "source", "n_chars",
                 stops.alias("n_stop"),
                 F.size(words).alias("n_words"))
         .filter(F.col("n_words") > 0))
    terms = (t(spark, sf_dir, "documents")
             .select("doc_id", F.explode(F.array_distinct(words)).alias("term")))
    idf = (tfidf_terms(spark, sf_dir)
           .select("term", F.floor(F.col("idf") * 10000).cast("bigint").alias("q_idf")))
    per_doc = (terms.join(F.broadcast(idf), "term")
               .groupBy("doc_id")
               .agg(F.sum("q_idf").cast("bigint").alias("sum_q"),
                    F.count("*").alias("n_terms")))
    score = (
        F.lit(0.4) * (F.col("n_stop").cast("double") / F.col("n_words").cast("double"))
        + F.lit(0.3) * (F.col("sum_q").cast("double")
                        / (F.lit(10000.0) * F.col("n_terms").cast("double")))
        + F.lit(0.15) * (F.lit(1.0) / (1 + F.col("doc_id") % 4).cast("double"))
        + F.lit(0.15) * (F.col("n_chars").cast("double") / F.lit(600.0))
    )
    s = f.join(per_doc, "doc_id").select("doc_id", "source", score.alias("score"))
    w = W.partitionBy("source").orderBy(F.desc("score"), F.asc("doc_id"))
    return (s.withColumn("importance_rank", F.row_number().over(w))
            .filter(F.col("importance_rank") <= 5)
            .select("source", "importance_rank", "doc_id", "score"))


@register(
    "b7_diversity_topk",
    sql="""
    WITH f AS (
      SELECT doc_id, source, n_chars,
             (list_filter(string_split(text, ' '), x -> x <> ''))[1] AS lead_word
      FROM documents),
    best_per_cluster AS (
      -- diversity: at most one winner per (source, lead-word) cluster
      SELECT source, doc_id, n_chars, lead_word FROM (
        SELECT source, doc_id, n_chars, lead_word,
               ROW_NUMBER() OVER (PARTITION BY source, lead_word
                                  ORDER BY n_chars DESC, doc_id ASC) AS rc
        FROM f WHERE lead_word IS NOT NULL) WHERE rc = 1)
    SELECT source, importance_rank, doc_id, lead_word, n_chars FROM (
      SELECT source, doc_id, lead_word, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id ASC)
               AS importance_rank
      FROM best_per_cluster) WHERE importance_rank <= 5
    """,
    doc="B7 diversity selection (README.md:165-172): relational MMR "
        "approximation — cap one winner per similarity cluster (source, "
        "lead word), then per-source top-5; two window passes, no UDF",
)
def b7_diversity_topk(spark, sf_dir):
    f = (t(spark, sf_dir, "documents")
         .select("doc_id", "source", "n_chars",
                 F.expr("filter(split(text, ' '), x -> x <> '')[0]")
                 .alias("lead_word"))
         .filter(F.col("lead_word").isNotNull()))
    wc = W.partitionBy("source", "lead_word").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    best = (f.withColumn("rc", F.row_number().over(wc)).filter("rc = 1").drop("rc"))
    wr = W.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (best.withColumn("importance_rank", F.row_number().over(wr))
            .filter(F.col("importance_rank") <= 5)
            .select("source", "importance_rank", "doc_id", "lead_word", "n_chars"))


TT1_SQL = """
    WITH w AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words
      FROM documents),
    blocks AS (
      SELECT doc_id, u.i AS blk_idx,
             array_to_string(words[(u.i * 8 + 1):(u.i * 8 + 8)], ' ') AS btext
      FROM w, unnest(range(0, 10)) AS u(i)
      WHERE len(words) > u.i * 8),
    cand AS (
      SELECT doc_id, blk_idx, btext FROM blocks
      WHERE contains(upper(btext), 'RFP') OR contains(upper(btext), 'REQUEST')
         OR contains(upper(btext), 'PROPOSAL')
         OR (blk_idx < 5 AND length(btext) > 10 AND length(btext) < 100))
    SELECT doc_id, MIN(blk_idx) AS title_blk,
           MIN_BY(btext, blk_idx) AS title_text
    FROM cand GROUP BY doc_id
    """


def tt1_title_candidates(spark, sf_dir):
    """TT1 title candidate generation (extractor.py:515-546): first-10-
    block gate, keyword / position / length predicates, first match wins
    via min_by — the in-pipeline version runs in core/pdfheur.  Registry
    leg of battery_micro_ops."""
    w = (t(spark, sf_dir, "documents")
         .select("doc_id",
                 F.expr("filter(split(text, ' '), x -> x <> '')").alias("words")))
    blocks = (w.select("doc_id", "words",
                       F.explode(F.expr("sequence(0, 9)")).alias("blk_idx"))
              .filter(F.size("words") > F.col("blk_idx") * 8)
              .withColumn("btext", F.expr(
                  "array_join(slice(words, blk_idx * 8 + 1, 8), ' ')")))
    up = F.upper("btext")
    cand = blocks.filter(
        up.contains("RFP") | up.contains("REQUEST") | up.contains("PROPOSAL")
        | ((F.col("blk_idx") < 5) & F.length("btext").between(11, 99)))
    return cand.groupBy("doc_id").agg(
        F.min("blk_idx").alias("title_blk"),
        F.expr("min_by(btext, blk_idx)").alias("title_text"))


_B8_KW = ("analyze", "data", "filter", "group", "insights", "metrics",
          "performance", "query", "report", "table", "trends", "value")
_B8_KW_SQL = "[" + ", ".join(f"'{k}'" for k in _B8_KW) + "]"


@register(
    "b8_selection_output",
    sql=f"""
    WITH w AS (
      -- '.' after every 'join' gives the driver vocabulary sentence
      -- boundaries, so the refined-text <=3-sentence slice does real work
      -- in this gate (raw driver text has no periods)
      SELECT doc_id, source,
             list_filter(string_split(replace(text, ' join ', ' join. '), ' '),
                         x -> x <> '') AS words
      FROM documents),
    tot AS (SELECT COUNT(*) AS n_docs FROM documents),
    terms AS (SELECT doc_id, unnest(list_distinct(words)) AS term FROM w),
    dfreq AS (SELECT term, COUNT(*) AS n_df FROM terms GROUP BY term),
    idf AS (
      SELECT term,
             CAST(floor(((CAST(n_docs AS DOUBLE) - CAST(n_df AS DOUBLE) + 0.5)
                         / (CAST(n_df AS DOUBLE) + 0.5)) * 10000) AS BIGINT) AS q_idf
      FROM dfreq, tot),
    c AS (
      SELECT doc_id, source, u.c AS chunk_idx,
             {CHUNK_SLICE_D} AS cw
      FROM w, {CHUNK_IDX_D}
      WHERE len(words) > 0),
    ct AS (SELECT doc_id, chunk_idx, unnest(list_distinct(cw)) AS term FROM c),
    cidf AS (
      SELECT ct.doc_id, ct.chunk_idx, CAST(SUM(i.q_idf) AS BIGINT) AS sum_q,
             COUNT(*) AS n_terms
      FROM ct JOIN idf i ON ct.term = i.term GROUP BY ct.doc_id, ct.chunk_idx),
    feats AS (
      SELECT c.doc_id, c.source, c.chunk_idx, c.cw,
             array_to_string(c.cw, ' ') AS chunk_text,
             len(list_intersect(list_distinct(c.cw), {_B8_KW_SQL})) AS n_kw,
             length(array_to_string(c.cw, ' ')) AS chunk_chars,
             sum_q, n_terms
      FROM c JOIN cidf ON cidf.doc_id = c.doc_id AND cidf.chunk_idx = c.chunk_idx),
    scored AS (
      SELECT *,
             0.4 * (CAST(n_kw AS DOUBLE) / {float(len(_B8_KW))})
             + 0.3 * (CAST(sum_q AS DOUBLE) / (10000.0 * CAST(n_terms AS DOUBLE)))
             + 0.15 * (1.0 / CAST(1 + chunk_idx AS DOUBLE))
             + 0.15 * (CAST(chunk_chars AS DOUBLE) / 600.0) AS score,
             cw[1] AS lead_word
      FROM feats),
    best AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY source, lead_word
                  ORDER BY score DESC, doc_id ASC, chunk_idx ASC) AS rc
        FROM scored WHERE score >= 0.5) WHERE rc = 1),
    sel AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                  ORDER BY score DESC, doc_id ASC, chunk_idx ASC)
                  AS importance_rank
        FROM best) WHERE importance_rank <= 5)
    SELECT source, importance_rank, doc_id,
           array_to_string(cw[1:8], ' ') AS section_title,
           chunk_idx + 1 AS page_number,
           array_to_string(string_split(chunk_text, '.')[1:3], '.') AS refined_text,
           score
    FROM sel
    """,
    doc="B8 selection output (challenge1b_output.json:2-45, 1B/main.py:52-97 "
        "semantics): B2 chunks scored 0.4·keyword-coverage + 0.3·real-TFIDF + "
        "0.15·structural + 0.15·contextual, min_relevance_score 0.5 gate, "
        "diversity cap per (source, lead-word) cluster, per-collection top-5 "
        "with importance_rank, section_title = first 8 words, refined_text = "
        "first <=3 sentences (README.md:165-172); record assembly + persona "
        "config path live in plans/selection.py",
)
def b8_selection_output(spark, sf_dir):
    from .plans.selection import selection_plan
    docs = (t(spark, sf_dir, "documents")
            .select("doc_id", "source",
                    F.expr("replace(text, ' join ', ' join. ')").alias("text")))
    return selection_plan(docs, list(_B8_KW), max_sections=5, min_score=0.5)


@register(
    "html_density_classify",
    sql="""
    WITH w AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words
      FROM documents),
    blocks AS (
      SELECT doc_id, u.c AS blk_idx,
             words[(u.c * 12 + 1):(u.c * 12 + 12)] AS bw
      FROM w, unnest(range(0, greatest(0, (len(words) - 1) // 12) + 1)) AS u(c)
      WHERE len(words) > u.c * 12),
    feat AS (
      SELECT doc_id, blk_idx,
             length(array_to_string(bw, ' ')) AS n_chars,
             len(bw) AS n_words,
             -- pseudo-anchors: words whose md5 leads with hex digit 0-3 play
             -- the role of link text (deterministic in both engines);
             -- COALESCE because DuckDB's array_to_string([]) is NULL where
             -- Spark's array_join gives ''
             COALESCE(length(array_to_string(
               list_filter(bw, x -> substr(md5(x), 1, 1) IN ('0','1','2','3')),
               ' ')), 0) AS n_link_chars
      FROM blocks)
    SELECT doc_id,
           COUNT(*) AS n_blocks,
           -- CAST: DuckDB types SUM(CASE...) as HUGEINT; Spark returns bigint
           CAST(SUM(CASE WHEN n_chars >= 40 AND n_link_chars * 10 < n_chars * 3
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_content,
           CAST(SUM(CASE WHEN n_chars >= 40 AND n_link_chars * 10 < n_chars * 3
                    THEN n_chars ELSE 0 END) AS BIGINT) AS body_chars
    FROM feat GROUP BY doc_id
    """,
    doc="§2.12 HTML boilerplate strip, relational form: block text-density + "
        "link-density features (Kohlschütter WSDM'10 family) over in-engine "
        "pseudo-HTML blocks; content iff long enough AND link ratio < 0.3. "
        "The in-UDF classifier over real tag streams is core/htmlheur.py",
)
def html_density_classify(spark, sf_dir):
    w = (t(spark, sf_dir, "documents")
         .select("doc_id",
                 F.expr("filter(split(text, ' '), x -> x <> '')").alias("words")))
    blocks = (w.select("doc_id", "words",
                       F.explode(F.expr(
                           "sequence(0, greatest(0, (size(words) - 1) div 12))"))
                       .alias("blk_idx"))
              .filter(F.size("words") > F.col("blk_idx") * 12)
              .withColumn("bw", F.expr("slice(words, blk_idx * 12 + 1, 12)")))
    feat = blocks.select(
        "doc_id", "blk_idx",
        F.length(F.array_join("bw", " ")).alias("n_chars"),
        F.size("bw").alias("n_words"),
        F.length(F.array_join(F.expr(
            "filter(bw, x -> substring(md5(x), 1, 1) IN ('0','1','2','3'))"),
            " ")).alias("n_link_chars"),
    )
    is_content = (F.col("n_chars") >= 40) & (F.col("n_link_chars") * 10
                                             < F.col("n_chars") * 3)
    return feat.groupBy("doc_id").agg(
        F.count("*").alias("n_blocks"),
        F.sum(F.when(is_content, 1).otherwise(0)).alias("n_content"),
        F.sum(F.when(is_content, F.col("n_chars")).otherwise(0)).alias("body_chars"),
    )


# ---------------------------------------------------------------------------
# battery_micro_ops: U1/U2/W2/W4/TT1/W3 folded into ONE oracle-checked entry
# ---------------------------------------------------------------------------

_NS, _NB, _ND, _NF = ("CAST(NULL AS VARCHAR)", "CAST(NULL AS BIGINT)",
                      "CAST(NULL AS DOUBLE)", "CAST(NULL AS BOOLEAN)")


def _leg_sql(probe, src, k1=_NS, k2=_NS, txt=_NS, v1=_NB, v2=_NB,
             vd=_ND, flag=_NF):
    return (f"SELECT '{probe}' AS probe, {k1} AS k1, {k2} AS k2, "
            f"{txt} AS txt, CAST({v1} AS BIGINT) AS v1, "
            f"CAST({v2} AS BIGINT) AS v2, CAST({vd} AS DOUBLE) AS vd, "
            f"CAST({flag} AS BOOLEAN) AS flag FROM ({src}) q")


_BATTERY_MICRO_SQL = "\nUNION ALL\n".join([
    _leg_sql("u1", queries.U1_SQL, k1="event_type",
             v1="n_users", v2="n_events"),
    _leg_sql("u2", queries.U2_SQL, k1="CAST(doc_id AS VARCHAR)",
             v1="n_common", v2="n_words", flag="is_dup"),
    _leg_sql("w2", queries.W2_SQL, k1="CAST(user_id AS VARCHAR)",
             k2="CAST(event_id AS VARCHAR)", v1="gap_s"),
    _leg_sql("w4", queries.W4_SQL, k1="CAST(user_id AS VARCHAR)",
             k2="CAST(day AS VARCHAR)", v1="event_id"),
    _leg_sql("tt1", TT1_SQL, k1="CAST(doc_id AS VARCHAR)",
             txt="title_text", v1="title_blk"),
    _leg_sql("w3", W3_SQL, k1="CAST(user_id AS VARCHAR)",
             k2="CAST(event_id AS VARCHAR)", txt="event_type",
             v1="absorbed_event_id", vd="merged_value"),
])


def _leg_spark(probe, df, k1=None, k2=None, txt=None, v1=None, v2=None,
               vd=None, flag=None):
    c = lambda col, typ: (F.col(col).cast(typ) if col
                          else F.lit(None).cast(typ))
    return df.select(
        F.lit(probe).alias("probe"),
        c(k1, "string").alias("k1"), c(k2, "string").alias("k2"),
        c(txt, "string").alias("txt"), c(v1, "bigint").alias("v1"),
        c(v2, "bigint").alias("v2"), c(vd, "double").alias("vd"),
        c(flag, "boolean").alias("flag"))


@register(
    "battery_micro_ops",
    sql=_BATTERY_MICRO_SQL,
    doc="combined oracle entry for six micro-analog operators (SURVEY §2 "
        "ids U1 distinct keys, U2/F6 word-set overlap, W2 lookahead gap, "
        "T2/W4 per-page top-3, TT1 title candidates, W3 consecutive "
        "merge).  Each leg is the UNCHANGED standalone operator (same "
        "plan, same oracle SQL) projected onto a shared union schema with "
        "explicit casts, scorer_battery-style, so all six stay inside the "
        "driver's 50-entry correctness file.  Functions remain individually "
        "callable: queries.u1_distinct_keys/u2_word_overlap/w2_next_gap/"
        "w4_top3_per_page, windowed.tt1_title_candidates/"
        "w3_consecutive_merge",
)
def battery_micro_ops(spark, sf_dir):
    legs = [
        _leg_spark("u1", queries.u1_distinct_keys(spark, sf_dir),
                   k1="event_type", v1="n_users", v2="n_events"),
        _leg_spark("u2", queries.u2_word_overlap(spark, sf_dir),
                   k1="doc_id", v1="n_common", v2="n_words", flag="is_dup"),
        _leg_spark("w2", queries.w2_next_gap(spark, sf_dir),
                   k1="user_id", k2="event_id", v1="gap_s"),
        _leg_spark("w4", queries.w4_top3_per_page(spark, sf_dir),
                   k1="user_id", k2="day", v1="event_id"),
        _leg_spark("tt1", tt1_title_candidates(spark, sf_dir),
                   k1="doc_id", txt="title_text", v1="title_blk"),
        _leg_spark("w3", w3_consecutive_merge(spark, sf_dir),
                   k1="user_id", k2="event_id", txt="event_type",
                   v1="absorbed_event_id", vd="merged_value"),
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out
