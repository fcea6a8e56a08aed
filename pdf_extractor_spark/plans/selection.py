"""1B selection surface: persona profiles (B3), challenge-JSON input
adaptation (B9), chunk scoring + diverse selection, and the
``challenge1b_output.json`` record assembly (B8).

Reference semantics replicated (not ported):

* ``transform_challenge_format`` — ``/root/reference/1B/main.py:52-97``:
  challenge JSON → pipeline config (persona role, task, documents,
  max_sections 25, min_relevance_score 0.5).
* persona keyword expansion — ``/root/reference/README.md:120-132``: the
  six documented persona profiles; expansion here is a deterministic
  table (the sandbox has no WordNet) + task-word extraction.
* output record — ``/root/reference/1B/Collections/Collection 1/
  challenge1b_output.json:2-45``: ``metadata`` + ``extracted_sections``
  [{document, section_title, importance_rank, page_number}] +
  ``subsection_analysis`` [{document, refined_text, page_number}];
  refined text = first ≤3 sentences (``README.md:165-172``).

Scale design: the whole selection is one DataFrame plan — chunking is a
per-row explode (no shuffle), scoring joins a broadcast keyword/IDF
table, diversity + ranking are two window passes partitioned by
collection.  Nothing is collected until the per-collection record
assembly, which by construction holds ≤ max_sections rows per
collection.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

# --- B3: persona profiles (README.md:120-132) ------------------------------

PERSONA_PROFILES: dict[str, tuple[str, ...]] = {
    "researcher": ("methodology", "findings", "analysis", "data", "study",
                   "results", "evaluation", "metrics"),
    "student": ("examples", "fundamentals", "definition", "overview",
                "introduction", "basics", "summary"),
    "analyst": ("insights", "metrics", "trends", "data", "query", "table",
                "value", "report", "filter", "group"),
    "travel planner": ("destinations", "itinerary", "hotels", "restaurants",
                       "activities", "tips", "cities", "packing"),
    "hr professional": ("compliance", "procedures", "policies", "forms",
                        "onboarding", "signature", "fillable"),
    "food contractor": ("recipes", "ingredients", "menu", "dishes",
                        "vegetarian", "buffet", "dinner", "sides"),
}

_TASK_STOPS = frozenset(
    "a an the of and to in is it for with on at by from as or be this that".split())


def extract_task_keywords(task: str) -> list[str]:
    """Lowercase alpha tokens of the task minus stopwords, order-preserving
    dedup (reference ``_extract_task_keywords``)."""
    seen: list[str] = []
    for w in re.findall(r"[a-zA-Z]+", task.lower()):
        if w not in _TASK_STOPS and len(w) > 2 and w not in seen:
            seen.append(w)
    return seen


def persona_keywords(role: str, task: str) -> list[str]:
    """B3 keyword expansion: profile keywords for the role (case-insensitive;
    unknown roles fall back to 'analyst', as the reference defaults persona
    to analyst) + task keywords, deduped, deterministic order."""
    profile = PERSONA_PROFILES.get(role.lower(), PERSONA_PROFILES["analyst"])
    out = list(profile)
    for w in extract_task_keywords(task):
        if w not in out:
            out.append(w)
    return out


# --- B9: challenge-JSON input adaptation (1B/main.py:52-97) -----------------

def transform_challenge_format(challenge: dict) -> dict:
    """Challenge JSON → pipeline config.  Pure dict→dict (no filesystem leg:
    documents here are rows of the input table, not PDF paths)."""
    info = challenge.get("challenge_info", {})
    return {
        "collection_name": info.get("test_case_name", "unknown"),
        "challenge_id": info.get("challenge_id", "unknown"),
        "description": info.get("description", ""),
        "documents": [
            {"filename": d["filename"], "title": d.get("title", d["filename"])}
            for d in challenge.get("documents", [])
        ],
        "persona": challenge.get("persona", {}).get("role", "analyst"),
        "job_to_be_done": challenge.get("job_to_be_done", {}).get(
            "task", "Analyze documents"),
        "processing_config": {
            "max_sections": 25,
            "min_relevance_score": 0.5,
        },
    }


def load_collection_config(cfg: dict) -> dict:
    """Accept either challenge format or already-adapted pipeline format
    (reference ``load_collection_config``)."""
    if "challenge_info" in cfg:
        return transform_challenge_format(cfg)
    return cfg


# --- B8: chunk scoring + diverse selection as one DataFrame plan ------------

CHUNK_WORDS = 60
CHUNK_STRIDE = 50
SENT_MAX = 3            # refined text: first ≤3 sentences (README.md:165-172)
TITLE_WORDS = 8


def selection_plan(docs: DataFrame, keywords: list[str],
                   max_sections: int = 5, min_score: float = 0.0) -> DataFrame:
    """Score + select: documents(doc_id, source, text) → one row per selected
    section with (source, importance_rank, doc_id, section_title,
    page_number, refined_text, score).

    Score = 0.4·keyword-coverage (|chunk ∩ keywords| / |keywords|; the
            semantic-similarity proxy, README.md:156 40% leg)
          + 0.3·mean-IDF of chunk terms (TF-IDF leg, int64-quantized)
          + 0.15·1/(1+chunk_idx)   (structural: early sections)
          + 0.15·chunk_chars/600   (contextual: substance).
    All components are exact-arithmetic cross-engine (see corpus.py rules).
    Diversity = at most one section per (source, lead-word) cluster before
    the per-source top-k (reference select_diverse_sections).
    """
    kw = F.array(*[F.lit(k) for k in sorted(set(keywords))])
    words = F.expr("filter(split(text, ' '), x -> x <> '')")

    # cross-doc IDF over the *input* docs (A7 leg, same plan as tfidf_terms)
    terms = docs.select("doc_id", F.explode(F.array_distinct(words)).alias("term"))
    dfreq = terms.groupBy("term").agg(F.count("*").alias("n_df"))
    tot = docs.agg(F.count("*").alias("n_docs"))
    q_idf = F.floor(
        ((F.col("n_docs").cast("double") - F.col("n_df").cast("double") + F.lit(0.5))
         / (F.col("n_df").cast("double") + F.lit(0.5))) * 10000).cast("bigint")
    idf = (dfreq.crossJoin(F.broadcast(tot))
           .select("term", q_idf.alias("q_idf")))

    # B2 chunking: 60-word windows, 50-word stride (explode, no shuffle)
    w = (docs.select("doc_id", "source", words.alias("words"))
         .filter(F.size("words") > 0))
    chunks = (
        w.select(
            "doc_id", "source", "words",
            F.explode(F.expr(
                f"sequence(0, greatest(0, (size(words) - {CHUNK_WORDS - CHUNK_STRIDE + 1})"
                f" div {CHUNK_STRIDE}))")).alias("chunk_idx"))
        .withColumn("cw", F.expr(
            f"slice(words, chunk_idx * {CHUNK_STRIDE} + 1, {CHUNK_WORDS})"))
        .withColumn("chunk_text", F.array_join("cw", " "))
        .drop("words")
    )

    # per-chunk mean IDF over distinct terms (broadcast join, int64 sum)
    chunk_terms = chunks.select(
        "doc_id", "chunk_idx", F.explode(F.array_distinct("cw")).alias("term"))
    chunk_idf = (chunk_terms.join(F.broadcast(idf), "term")
                 .groupBy("doc_id", "chunk_idx")
                 .agg(F.sum("q_idf").cast("bigint").alias("sum_q"),
                      F.count("*").alias("n_terms")))

    feats = (
        chunks.join(chunk_idf, ["doc_id", "chunk_idx"])
        .withColumn("n_kw", F.size(F.array_intersect(F.array_distinct("cw"), kw)))
        .withColumn("chunk_chars", F.length("chunk_text"))
    )
    n_keywords = len(set(keywords))
    score = (
        F.lit(0.4) * (F.col("n_kw").cast("double") / F.lit(float(n_keywords)))
        + F.lit(0.3) * (F.col("sum_q").cast("double")
                        / (F.lit(10000.0) * F.col("n_terms").cast("double")))
        + F.lit(0.15) * (F.lit(1.0) / (1 + F.col("chunk_idx")).cast("double"))
        + F.lit(0.15) * (F.col("chunk_chars").cast("double") / F.lit(600.0))
    )
    scored = (feats.withColumn("score", score)
              .filter(F.col("score") >= F.lit(float(min_score)))
              .withColumn("lead_word", F.col("cw").getItem(0)))

    # diversity: best chunk per (source, lead_word) cluster, then top-k
    wc = W.partitionBy("source", "lead_word").orderBy(
        F.desc("score"), F.asc("doc_id"), F.asc("chunk_idx"))
    best = (scored.withColumn("rc", F.row_number().over(wc))
            .filter("rc = 1").drop("rc"))
    wr = W.partitionBy("source").orderBy(
        F.desc("score"), F.asc("doc_id"), F.asc("chunk_idx"))
    sel = (best.withColumn("importance_rank", F.row_number().over(wr))
           .filter(F.col("importance_rank") <= max_sections))

    refined = F.array_join(
        F.slice(F.split("chunk_text", r"\."), 1, SENT_MAX), ".")
    title = F.array_join(F.slice("cw", 1, TITLE_WORDS), " ")
    return sel.select(
        "source", "importance_rank", "doc_id",
        title.alias("section_title"),
        (F.col("chunk_idx") + 1).alias("page_number"),
        refined.alias("refined_text"),
        "score",
    )


def build_selection_records(rows: list, persona: str, task: str,
                            timestamp: str) -> dict[str, dict]:
    """Selected-section rows (as from :func:`selection_plan`, collected) →
    per-collection ``challenge1b_output.json``-shaped records.

    ``timestamp`` is passed in (the reference stamps processing time;
    determinism requires the caller to supply it).
    """
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    records: dict[str, dict] = {}
    for src, rs in sorted(by_src.items()):
        rs = sorted(rs, key=lambda r: r["importance_rank"])
        records[src] = {
            "metadata": {
                "input_documents": sorted({str(r["doc_id"]) for r in rs}),
                "persona": persona,
                "job_to_be_done": task,
                "processing_timestamp": timestamp,
            },
            "extracted_sections": [
                {"document": str(r["doc_id"]),
                 "section_title": r["section_title"],
                 "importance_rank": int(r["importance_rank"]),
                 "page_number": int(r["page_number"])}
                for r in rs
            ],
            "subsection_analysis": [
                {"document": str(r["doc_id"]),
                 "refined_text": r["refined_text"],
                 "page_number": int(r["page_number"])}
                for r in rs
            ],
        }
    return records
