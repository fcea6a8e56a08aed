"""Training-data corpus operators: dedup, similarity search, text analysis,
fingerprinting, multimodal plumbing.

These are the operations a large-scale training-data pipeline needs on top of
the extraction tier (SURVEY.md §2 + driver mandate): every operator is a
``queries()`` entry with a DuckDB oracle over the driver's ``documents`` /
``embeddings`` parquet, so the correctness gate verifies them cross-engine.

Scale design (the point is 100 TB, not 500 rows):

* **Dedup is blocking + verify.** Exact dedup is one hash groupBy (one
  shuffle, map-side partial agg).  Near-dup never does the O(n²) cross
  join: MinHash-LSH blocks by band hash (equi-join — shuffle on band
  key), the inverted-index n-gram variant blocks by shared shingle, and
  embedding near-dup blocks by random-hyperplane bucket.  Candidate
  verification (exact Jaccard / exact cosine) runs only inside blocks.
* **All hashing is md5-based and engine-portable** — the same bytes hash
  identically on a 1000-executor cluster and in the DuckDB oracle, so
  blocking decisions (hence results) are reproducible, not
  partitioning-dependent.
* **Exact cross-engine arithmetic.** Embedding math quantizes float32 →
  int64 (``floor(x*10⁴)``) before any dot product: integer dots are
  exact, and ``sqrt``/division over exact ints is correctly-rounded IEEE
  double in both engines, so even cosine *values* hash-match.  Ratio
  thresholds are cross-multiplied integers.
* **JVM-side only.** Every operator here is pure `pyspark.sql.functions`
  / Spark-SQL higher-order functions — zero Python UDFs, whole-stage
  codegen end-to-end.  The only pandas stage in the repo stays in the
  extraction operator and the multimodal decode stub (Arrow-batched).

Near-dup fixtures: the driver corpus has no natural duplicates, so dedup
queries build a deterministic working set ``documents ∪ perturbed copies``
(truncated text / scaled embeddings, derived in-engine) — the operator then
provably *finds* those engineered near-dups and the oracle agrees.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window as W
from pyspark.sql import functions as F

from .queries import register, t

# ---------------------------------------------------------------------------
# shared fragments (Spark SQL dialect + DuckDB dialect, kept side by side)
# ---------------------------------------------------------------------------

# whitespace-tokenized words, empties dropped
WORDS_S = "filter(split(text, ' '), x -> x <> '')"
WORDS_D = "list_filter(string_split(text, ' '), x -> x <> '')"


def let1(binding: str, var: str, body: str) -> str:
    """SQL let-binding: evaluate ``binding`` ONCE, bind it as lambda var
    ``var`` inside ``body``.

    Why this exists: Catalyst's CollapseProject inlines an aliased
    expression into EVERY downstream reference, and PushDownPredicate
    inlines it into filters below the projection.  For a scalar that is
    harmless; for an O(n) array expression referenced k times (or
    referenced per-element inside a higher-order lambda) it multiplies
    work by k — measured here: ``select(shingles).filter(size >= 1)``
    over sf0.1 ran 34 s vs 0.8 s without the pushed filter, because the
    word-split was re-evaluated per array element (O(n²) per row).  At
    100 TB that multiplier rides on every row, so the heavy per-row
    signature expressions below are built as one let-bound expression
    instead of chained selects.  ``transform`` evaluates its input
    exactly once and lambda-variable references are value lookups.
    """
    return f"transform(array({binding}), {var} -> {body})[0]"

# word 3-gram shingles over a `words` column (Spark arrays are 0-based,
# DuckDB 1-based; both emit shingle i = words[i..i+2] in order)
SHINGLES_S = (
    "CASE WHEN size(words) >= 3 THEN "
    "transform(sequence(0, size(words) - 3), "
    "i -> concat(words[i], ' ', words[i+1], ' ', words[i+2])) "
    "ELSE array() END"
)
SHINGLES_D = (
    "list_transform(range(1, len(words) - 1), "
    "i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])"
)

N_MINHASH = 8      # minhash lanes (two-digest variant: 32-bit md5 slices)
N_BANDS = 4        # LSH bands of 2 lanes each (64-bit band keys)

# Dedup queries persist their signature tables (referenced 3-4× in one
# plan).  The registry shares one SparkSession across 35 queries, so
# caches must not accumulate: each new persist first drains the previous
# ones — the leak is bounded to one query's working set.
_PERSISTED: list = []


def _persist(df, fresh: bool = True):
    """Persist ``df``; ``fresh=True`` (a query's FIRST persist) first drains
    every cache the previous registry query left behind.  Pass
    ``fresh=False`` for additional persists inside the same query (e.g.
    per-iteration state of an iterative algorithm)."""
    if fresh:
        while _PERSISTED:
            _PERSISTED.pop().unpersist()
    _PERSISTED.append(df.persist())
    return df


def _materialize(df):
    """Force a persisted iteration state NOW and cut the logical lineage.

    Iterative plans (label propagation, k-means) reference iteration i's
    result 2× in iteration i+1; without an eager cut the plan tree — and
    the work — doubles per round.  Persist + count is the standard Pregel
    move; at scale this is exactly where a production job would also
    checkpoint for fault-tolerance."""
    df.count()
    return df


# Few-hash minhash: hash each shingle TWICE (md5(x) ++ md5('#'+x) = 64 hex
# chars), then treat the 8 disjoint 8-hex-char slices as 8 independent
# 32-bit hash lanes and min each lane.  4x fewer digest computations than
# seeded re-hashing per lane; 32-bit lanes make band keys 64-bit, so at
# 10^9+ docs band collisions track similarity rather than the birthday
# bound (16-bit lanes gave 32-bit band keys — false-candidate sets would
# explode at corpus scale).  LSH candidates are still verified with exact
# Jaccard.  Expressions below operate on a column `hs` = array of
# per-shingle 64-hex digest concats.

HS_D = "list_transform(sh, x -> md5(x) || md5('#' || x))"


def _minhash_d(j: int) -> str:
    return f"list_min(list_transform(hs, h -> substr(h, {8 * j + 1}, 8)))"


def _band_d(b: int) -> str:
    # band key = lane-pair concat; equality on it == equality on both lanes,
    # so no extra digest is needed
    return f"{_minhash_d(2 * b)} || {_minhash_d(2 * b + 1)}"


# --- Spark-side single-pass signature expressions ---------------------------
# Each is ONE let-bound expression from `text`: words, shingles, digests and
# lanes are each evaluated exactly once per row (see let1).  The DuckDB
# oracle keeps the readable multi-CTE form — its vectorized engine doesn't
# inline-recompute, and it is the correctness gate, not the benched path.

SHINGLES_FROM_TEXT_S = let1(
    WORDS_S, "ws",
    "CASE WHEN size(ws) >= 3 THEN transform(sequence(0, size(ws) - 3), "
    "i -> concat(ws[i], ' ', ws[i+1], ' ', ws[i+2])) ELSE array() END")

# all 8 lane-mins in one pass structure over a bound `hs`
_LANES8 = (f"transform(sequence(0, {N_MINHASH - 1}), j -> "
           "array_min(transform(hs, h -> substring(h, cast(8 * j + 1 as int), 8))))")

_HS_OVER_SH = "transform(sh, x -> concat(md5(x), md5(concat('#', x))))"

MINHASH_SIG_S = let1(
    SHINGLES_FROM_TEXT_S, "sh",
    let1(_HS_OVER_SH, "hs",
         let1(_LANES8, "ln",
              "named_struct("
              "'n_shingles', size(sh), 'mh0', ln[0], 'mh1', ln[1], "
              "'band0', concat(ln[0], ln[1]), 'band1', concat(ln[2], ln[3]), "
              "'band2', concat(ln[4], ln[5]), 'band3', concat(ln[6], ln[7]))")))

MINHASH_LSH_SIG_S = let1(
    SHINGLES_FROM_TEXT_S, "sh",
    let1(_HS_OVER_SH, "hs",
         let1(_LANES8, "ln",
              "named_struct("
              "'shset', array_distinct(sh), "
              "'bands', array(concat(ln[0], ln[1]), concat(ln[2], ln[3]), "
              "concat(ln[4], ln[5]), concat(ln[6], ln[7])))")))


# near-dup document working set: every doc_id % 7 == 0 gets a copy
# (doc_id + 2000000) truncated to its first 80% of words → shingle-set
# Jaccard ≈ 0.75 vs the original, a guaranteed engineered near-dup.
TRUNC_S = ("array_join(slice(words, 1, (size(words) * 4) div 5), ' ')")
TRUNC_D = ("array_to_string(words[1:((len(words) * 4) // 5)], ' ')")

NEARDUP_CORPUS_D = f"""
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, {TRUNC_D} AS text
  FROM (SELECT doc_id, {WORDS_D} AS words FROM documents WHERE doc_id % 7 = 0))
"""


def _neardup_corpus_s(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    trunc = (
        d.filter(F.col("doc_id") % 7 == 0)
        .select("doc_id", F.expr(WORDS_S).alias("words"))
        .select((F.col("doc_id") + 2000000).alias("doc_id"),
                F.expr(TRUNC_S).alias("text"))
    )
    return d.unionByName(trunc)


# ---------------------------------------------------------------------------
# D1. Exact dedup — hash groupBy (one shuffle, partial agg map-side)
# ---------------------------------------------------------------------------

@register(
    "dedup_exact",
    sql="""
    WITH all_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0)
    SELECT md5(text) AS text_hash, COUNT(*) AS n_copies,
           MIN(doc_id) AS canonical_doc_id
    FROM all_docs GROUP BY md5(text) HAVING COUNT(*) > 1
    """,
    doc="exact dedup: md5(text) groupBy keep-min-id; scales as one shuffle "
        "with map-side combine (working set = docs ∪ exact copies of doc_id%5==0)",
)
def dedup_exact(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    copies = (d.filter(F.col("doc_id") % 5 == 0)
              .select((F.col("doc_id") + 1000000).alias("doc_id"), "text"))
    return (
        d.unionByName(copies)
        .groupBy(F.md5("text").alias("text_hash"))
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("canonical_doc_id"))
        .filter(F.col("n_copies") > 1)
    )


# ---------------------------------------------------------------------------
# D2. MinHash signatures + LSH banding
# ---------------------------------------------------------------------------

@register(
    "dedup_minhash_signatures",
    sql=f"""
    WITH w AS (SELECT doc_id, {WORDS_D} AS words FROM documents),
    s AS (SELECT doc_id, {SHINGLES_D} AS sh FROM w),
    hashed AS (
      SELECT doc_id, len(sh) AS n_shingles,
             {HS_D} AS hs
      FROM s WHERE len(sh) >= 1)
    SELECT doc_id, n_shingles,
           {_minhash_d(0)} AS mh0, {_minhash_d(1)} AS mh1,
           {_band_d(0)} AS band0, {_band_d(1)} AS band1,
           {_band_d(2)} AS band2, {_band_d(3)} AS band3
    FROM hashed
    """,
    doc="MinHash over word-3-gram shingles (one-hash variant: 8 16-bit "
        "md5-slice lanes) + 4-band LSH keys; per-row narrow compute, no shuffle",
)
def dedup_minhash_signatures(spark, sf_dir):
    # cheap pre-filter (≥3 words ⟺ ≥1 shingle) BEFORE the signature
    # projection — a pushed filter on the signature column would inline
    # and re-evaluate the whole digest chain per row (see let1)
    return (t(spark, sf_dir, "documents")
            .filter(F.expr(f"size({WORDS_S}) >= 3"))
            .select("doc_id", F.expr(MINHASH_SIG_S).alias("sig"))
            .select("doc_id", "sig.*"))


@register(
    "dedup_minhash_lsh",
    sql=f"""
    WITH {NEARDUP_CORPUS_D},
    sigs AS (
      SELECT doc_id, shset,
             [{_band_d(0)}, {_band_d(1)}, {_band_d(2)}, {_band_d(3)}] AS bands
      FROM (SELECT doc_id, list_distinct(sh) AS shset,
                   {HS_D} AS hs
            FROM (SELECT doc_id, {SHINGLES_D} AS sh
                  FROM (SELECT doc_id, {WORDS_D} AS words FROM corpus))
            WHERE len(sh) >= 1)),
    exploded AS (
      SELECT doc_id, shset, i AS band_idx, bands[i] AS band_hash
      FROM sigs, unnest(range(1, 5)) AS u(i)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.shset AS sa, b.shset AS sb
      FROM exploded a JOIN exploded b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, n_inter, n_union
    FROM (SELECT doc_a, doc_b, len(list_intersect(sa, sb)) AS n_inter,
                 len(sa) + len(sb) - len(list_intersect(sa, sb)) AS n_union
          FROM cand)
    WHERE n_inter * 2 >= n_union
    """,
    doc="MinHash-LSH near-dup pairs: band-hash equi-join blocks candidates "
        "(never O(n²)), exact shingle-Jaccard >= 0.5 verifies inside blocks; "
        "working set = docs ∪ 80%%-truncated copies of doc_id%%7==0",
)
def dedup_minhash_lsh(spark, sf_dir):
    corpus = _neardup_corpus_s(spark, sf_dir)
    # hash every shingle once (hs), then derive all 8 lanes + 4 bands from
    # the digests — one md5 pass total per document (let-bound, see let1)
    sigs = (
        corpus.filter(F.expr(f"size({WORDS_S}) >= 3"))
        .select("doc_id", F.expr(MINHASH_LSH_SIG_S).alias("sig"))
        .select("doc_id", "sig.*")
    )
    # the signature table is referenced 4× below (both self-join branches +
    # both verify re-joins); at scale you'd write it out once — here persist
    # so the minhash pass isn't recomputed per branch
    sigs = _persist(sigs)
    # candidate pairs carry bare ids only — the distinct never shuffles the
    # shingle arrays; sets are re-joined just for the verify step
    ex = sigs.select("doc_id", F.posexplode("bands").alias("band_idx", "band_hash"))
    a, b = ex.alias("a"), ex.alias("b")
    cand = (
        a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
               & (F.col("a.band_hash") == F.col("b.band_hash"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("shset").alias("sa"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("shset").alias("sb"))
    n_inter = F.size(F.array_intersect("sa", "sb"))
    return (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b", n_inter.alias("n_inter"),
                (F.size("sa") + F.size("sb") - n_inter).alias("n_union"))
        .filter(F.col("n_inter") * 2 >= F.col("n_union"))
    )


# ---------------------------------------------------------------------------
# D3. SimHash near-dup (16-bit signature, hamming distance on engineered pairs)
# ---------------------------------------------------------------------------

def _simhash_expr_d(nbits: int = 16) -> str:
    """``nbits``-bit simhash over a column `hs` = array of per-word md5 hex
    strings (md5 has 32 hex digits, so nbits <= 32).  DuckDB dialect only
    (one vectorized list pass per bit is fine in the oracle; the Spark
    side is the single-pass _simhash_from_text_s).

    Bit j votes +1/-1 on the parity of hex digit j of each word hash;
    bit set iff the vote sum is strictly positive.
    """
    terms = []
    for j in range(nbits):
        digit = f"substr(h, {j + 1}, 1)"
        nib = f"(strpos('0123456789abcdef', {digit}) - 1)"
        vote = (f"CAST(list_sum(list_transform(hs, h -> "
                f"CASE WHEN {nib} % 2 = 1 THEN 1 ELSE -1 END)) AS INT)")
        terms.append(f"(CASE WHEN {vote} > 0 THEN CAST({1 << j} AS BIGINT) "
                     f"ELSE 0 END)")
    return "CAST((" + " + ".join(terms) + ") AS BIGINT)"


def _simhash_nib_expr_d(nbits: int = 60) -> str:
    """DuckDB dialect of the WIDE simhash: bit j votes on bit (j mod 4) of
    hex digit (j div 4), so one md5 yields up to 128 usable bits.  60 bits
    keeps the signature strictly positive in a signed BIGINT so banding
    div/mod arithmetic agrees between engines (no floor-vs-truncate
    divergence on negatives)."""
    terms = []
    for j in range(nbits):
        digit = f"substr(h, {j // 4 + 1}, 1)"
        nib = f"(strpos('0123456789abcdef', {digit}) - 1)"
        vote = (f"CAST(list_sum(list_transform(hs, h -> "
                f"CASE WHEN ({nib} // {1 << (j % 4)}) % 2 = 1 THEN 1 ELSE -1 END)) "
                "AS INT)")
        terms.append(f"(CASE WHEN {vote} > 0 THEN CAST({1 << j} AS BIGINT) "
                     f"ELSE 0 END)")
    return "CAST((" + " + ".join(terms) + ") AS BIGINT)"


def _simhash_nib_from_text_s(nbits: int = 60) -> str:
    """Spark dialect of the wide simhash, single aggregate pass (see
    _simhash_from_text_s for why one pass matters).  Per word hash the
    ceil(nbits/4) hex nibbles are decoded ONCE (let-bound), then the
    nbits per-bit votes are cheap shifts — instr/substr per BIT would
    quadruple the string work in the inner loop."""
    ndigits = (nbits + 3) // 4
    nibs = (f"transform(sequence(1, {ndigits}), d -> "
            "instr('0123456789abcdef', substr(h, d, 1)) - 1)")
    bitvotes = (f"transform(sequence(1, {nbits}), j -> "
                "CASE WHEN shiftright(nb[(j - 1) div 4], (j - 1) % 4) % 2 = 1 "
                "THEN 1 ELSE -1 END)")
    votes = (f"aggregate(hs, transform(sequence(1, {nbits}), j -> 0), "
             f"(acc, h) -> zip_with(acc, {let1(nibs, 'nb', bitvotes)}, "
             "(x, y) -> x + y))")
    bits = (f"cast(aggregate(sequence(0, {nbits - 1}), cast(0 as bigint), "
            "(a, j) -> a + (CASE WHEN vt[j] > 0 "
            "THEN shiftleft(cast(1 as bigint), j) ELSE cast(0 as bigint) END)) "
            "as bigint)")
    return let1(f"transform({WORDS_S}, w -> md5(w))", "hs",
                let1(votes, "vt", bits))


# Pigeonhole band count of the production simhash signature: <= 3 flipped
# bits leave >= 1 of the 4 bands untouched, so hamming_max <= SIMHASH_BANDS-1
# is the recall guarantee dedup_texts_run enforces.
SIMHASH_BANDS = 4


def _simhash_bands_from_text_s(bits: int) -> str:
    """The PRODUCTION simhash banding: an array of 4 pigeonhole bands of
    ``bits`` bits each over a 4·bits-wide signature, in one aggregate
    pass.  Band k holds signature bits [k·bits, (k+1)·bits) under the
    same vote rule as `_simhash_nib_from_text_s` (bit j votes on bit j%4
    of word-digest hex digit j//4), so at bits=15 the 4 values equal the
    60-bit registry signature's band split exactly (pinned by a pytest).

    Because the bands PARTITION the signature, total hamming = the sum
    of per-band hammings, and the pigeonhole guarantee (<= 3 flipped
    bits -> >= 1 band untouched) holds at ANY band width — this is the
    seam `simhash_band_bits(n)` threads through: wider bands = more
    band space as the corpus grows.  Needs bits hex digits per word
    digest; beyond md5's 32 the digest doubles (md5(w) ++ md5('#'+w),
    the minhash module's trick), supporting bits <= 63 (bigint band),
    i.e. corpora to ~10^18 docs."""
    if not 1 <= bits <= 63:
        raise ValueError(f"band width {bits} outside [1, 63]")
    nbits = 4 * bits
    src = ("md5(w)" if bits <= 32
           else "concat(md5(w), md5(concat('#', w)))")
    nibs = (f"transform(sequence(1, {bits}), d -> "
            "instr('0123456789abcdef', substr(h, d, 1)) - 1)")
    bitvotes = (f"transform(sequence(1, {nbits}), j -> "
                "CASE WHEN shiftright(nb[(j - 1) div 4], (j - 1) % 4) % 2 = 1 "
                "THEN 1 ELSE -1 END)")
    votes = (f"aggregate(hs, transform(sequence(1, {nbits}), j -> 0), "
             f"(acc, h) -> zip_with(acc, {let1(nibs, 'nb', bitvotes)}, "
             "(x, y) -> x + y))")
    band = (f"transform(sequence(0, 3), k -> "
            f"cast(aggregate(sequence(k * {bits}, k * {bits} + {bits - 1}), "
            "cast(0 as bigint), (a, j) -> a + (CASE WHEN vt[j] > 0 "
            f"THEN shiftleft(cast(1 as bigint), j - k * {bits}) "
            "ELSE cast(0 as bigint) END)) as bigint))")
    return let1(f"transform({WORDS_S}, w -> {src})", "hs",
                let1(votes, "vt", band))


def _simhash_bands_batch(texts, bits: int):
    """Arrow-batch numpy replica of `_simhash_bands_from_text_s` —
    bit-identical by construction (hypothesis-fuzzed and Spark-level
    parity-tested in tests/test_sig_parity.py), ~10-40x faster per row.

    Why a Python path beats the built-in expression HERE: every
    higher-order function (transform/aggregate/zip_with) is
    CodegenFallback in Spark — the per-word/per-bit vote fold runs in
    Catalyst's row-at-a-time INTERPRETER, never whole-stage codegen
    (verified by thread-dumping a 2.4M-row production run: all 32
    executor threads inside ArrayTransform.eval/ZipWith.eval, ~19
    core-ms/row).  The rewrite keeps md5 in C (hashlib) and folds the
    votes as three numpy ops over ALL words of the batch at once
    (nibble split -> ±1 vote matrix -> per-doc reduceat), so the hot
    loop is one md5 call per word — the "UDFs are the slow path" rule
    inverts when the built-in path is an interpreted HOF chain.

    Returns a list aligned to ``texts``: array of 4 int64 band values,
    or None for word-less docs (callers filter those out beforehand)."""
    import hashlib

    import numpy as np

    need2 = bits > 32
    counts: list[int] = []
    digests: list[bytes] = []
    for t in texts:
        ws = [w for w in (t.split(" ") if t is not None else []) if w]
        counts.append(len(ws))
        for w in ws:
            b = w.encode("utf-8")
            d = hashlib.md5(b).digest()
            if need2:
                d += hashlib.md5(b"#" + b).digest()
            digests.append(d)
    out: list = [None] * len(counts)
    if not digests:
        return out
    raw = np.frombuffer(b"".join(digests), dtype=np.uint8)
    raw = raw.reshape(len(digests), 32 if need2 else 16)
    # hexdigest digit d = high nibble of byte d//2 when d is even
    nib = np.empty((raw.shape[0], raw.shape[1] * 2), np.uint8)
    nib[:, 0::2] = raw >> 4
    nib[:, 1::2] = raw & 15
    nib = nib[:, :bits]
    # vote matrix index i = 4*d + r <=> bit r of hex digit d — the same
    # flat order the SQL form's sequence(1, 4*bits) lambda walks
    bv = (nib[:, :, None] >> np.arange(4, dtype=np.uint8)) & 1
    pm = bv.reshape(bv.shape[0], 4 * bits).astype(np.int32) * 2 - 1
    nw = np.asarray(counts, dtype=np.int64)
    nz = np.flatnonzero(nw)
    offs = np.zeros(len(nz), dtype=np.int64)
    np.cumsum(nw[nz][:-1], out=offs[1:])
    votes = np.add.reduceat(pm, offs, axis=0)
    bitset = votes > 0
    weights = np.left_shift(np.int64(1), np.arange(bits, dtype=np.int64))
    bands = (bitset.reshape(-1, SIMHASH_BANDS, bits) * weights).sum(
        axis=2, dtype=np.int64)
    for row, i in zip(bands, nz):
        out[int(i)] = row
    return out


def simhash_bands_udf(bits: int):
    """`_simhash_bands_batch` as an Arrow-batched pandas UDF column —
    the production signature path (`dedup_texts_run`).  The SQL
    expression form stays as the registry/oracle reference and the
    parity gate."""
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType

    # no type hints: `from __future__ import annotations` stringifies
    # them and the lazy pandas import is not resolvable at decoration
    def _batch(texts):
        return pd.Series(_simhash_bands_batch(texts.tolist(), bits))

    return F.pandas_udf(_batch, ArrayType(LongType()))


def _simhash_from_text_s(nbits: int = 16) -> str:
    """Spark-side simhash straight from `text`, ONE pass over the word
    digests: aggregate folds every md5 into an nbits-wide vote vector
    (zip_with adds the ±1 parity votes of all bits at once), then the
    vote vector folds into the signature.  The naive per-bit form is
    nbits separate aggregates over `hs`, and Catalyst additionally
    inlines the md5 transform into each (see let1) — measured 6×
    slower at sf0.1 and O(nbits·n) per row at scale instead of O(n)."""
    votes = (f"aggregate(hs, transform(sequence(1, {nbits}), j -> 0), "
             f"(acc, h) -> zip_with(acc, transform(sequence(1, {nbits}), "
             "j -> CASE WHEN (instr('0123456789abcdef', substr(h, j, 1)) - 1) % 2 = 1 "
             "THEN 1 ELSE -1 END), (x, y) -> x + y))")
    bits = (f"cast(aggregate(sequence(0, {nbits - 1}), cast(0 as bigint), "
            "(a, j) -> a + (CASE WHEN vt[j] > 0 "
            "THEN shiftleft(cast(1 as bigint), j) ELSE cast(0 as bigint) END)) "
            "as bigint)")
    return let1(f"transform({WORDS_S}, w -> md5(w))", "hs",
                let1(votes, "vt", bits))


@register(
    "dedup_simhash",
    sql=f"""
    WITH {NEARDUP_CORPUS_D},
    sigs AS (
      SELECT doc_id, {_simhash_expr_d()} AS simhash
      FROM (SELECT doc_id, list_transform({WORDS_D}, w -> md5(w)) AS hs
            FROM corpus)
      WHERE len(hs) >= 1)
    SELECT o.doc_id AS doc_a, c.doc_id AS doc_b,
           o.simhash AS sim_a, c.simhash AS sim_b,
           bit_count(xor(o.simhash, c.simhash)) AS hamming,
           bit_count(xor(o.simhash, c.simhash)) <= 3 AS is_near
    FROM sigs o JOIN sigs c ON c.doc_id = o.doc_id + 2000000
    """,
    doc="SimHash (16-bit, hex-digit-parity votes over word md5s) + hamming "
        "distance on engineered original/truncated pairs; near iff <= 3 bits",
)
def dedup_simhash(spark, sf_dir):
    corpus = _neardup_corpus_s(spark, sf_dir)
    sigs = (
        corpus.filter(F.expr(f"size({WORDS_S}) >= 1"))
        .select("doc_id", F.expr(_simhash_from_text_s()).alias("simhash"))
    )
    sigs = _persist(sigs)   # referenced 2×: both legs of the pair join
    o, c = sigs.alias("o"), sigs.alias("c")
    ham = F.expr("bit_count(o.simhash ^ c.simhash)").cast("int")
    return (
        o.join(c, F.col("c.doc_id") == F.col("o.doc_id") + 2000000)
        .select(F.col("o.doc_id").alias("doc_a"), F.col("c.doc_id").alias("doc_b"),
                F.col("o.simhash").alias("sim_a"), F.col("c.simhash").alias("sim_b"),
                ham.alias("hamming"), (ham <= 3).alias("is_near"))
    )


@register(
    "dedup_simhash_blocked",
    sql=f"""
    WITH {NEARDUP_CORPUS_D},
    sigs AS (
      SELECT doc_id, {_simhash_nib_expr_d(60)} AS simhash
      FROM (SELECT doc_id, list_transform({WORDS_D}, w -> md5(w)) AS hs
            FROM corpus)
      WHERE len(hs) >= 1),
    ex AS (
      SELECT doc_id, simhash, i AS band_idx,
             (simhash // CASE i WHEN 1 THEN 1 WHEN 2 THEN 32768
                                WHEN 3 THEN 1073741824 ELSE 35184372088832 END)
               % 32768 AS band_bits
      FROM sigs, unnest(range(1, 5)) AS u(i)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM ex a JOIN ex b
        ON a.band_idx = b.band_idx AND a.band_bits = b.band_bits
       AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, hamming FROM (
      SELECT c.doc_a, c.doc_b,
             bit_count(xor(sa.simhash, sb.simhash)) AS hamming
      FROM cand c JOIN sigs sa ON sa.doc_id = c.doc_a
      JOIN sigs sb ON sb.doc_id = c.doc_b)
    WHERE hamming <= 3
    """,
    doc="SimHash near-dup at scale (the production pairing dedup_simhash's "
        "engineered-id join avoids): pigeonhole banding — a 60-bit "
        "signature (bit j votes on bit j%%4 of md5 hex digit j//4; 60 not "
        "64 keeps the signed-BIGINT band arithmetic positive, so both "
        "engines' div/mod agree) split into 4 disjoint 15-bit bands; any "
        "pair within hamming distance 3 must agree exactly on >= 1 band, "
        "so candidates come from an equi-join on (band_idx, band_bits) — "
        "never all-pairs — and exact bit_count verifies <= 3 inside "
        "blocks.  Band space (2^15 per band) must outgrow the corpus or "
        "random collisions degenerate the join — 8-bit bands measured "
        "~900k false candidates on the 10.7k-doc fixture vs near-zero at "
        "15 bits; at 10^9 docs widen to k+1 bands of >= 30 bits from two "
        "digests",
)
def dedup_simhash_blocked(spark, sf_dir):
    corpus = _neardup_corpus_s(spark, sf_dir)
    sigs = (
        corpus.filter(F.expr(f"size({WORDS_S}) >= 1"))
        .select("doc_id", F.expr(_simhash_nib_from_text_s(60)).alias("simhash"))
    )
    sigs = _persist(sigs)   # referenced 3x: band explode + both verify legs
    ex = (sigs.select("doc_id", "simhash",
                      F.explode(F.expr("sequence(1, 4)")).alias("band_idx"))
          .withColumn("band_bits", F.expr(
              "(simhash div CASE band_idx WHEN 1 THEN 1 WHEN 2 THEN 32768 "
              "WHEN 3 THEN 1073741824 ELSE 35184372088832 END) % 32768")))
    a, b = ex.alias("a"), ex.alias("b")
    cand = (
        a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
               & (F.col("a.band_bits") == F.col("b.band_bits"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"))
    ham = F.expr("bit_count(sim_a ^ sim_b)").cast("int")
    return (cand.join(sa, "doc_a").join(sb, "doc_b")
            .select("doc_a", "doc_b", ham.alias("hamming"))
            .filter(F.col("hamming") <= 3))


# ---------------------------------------------------------------------------
# D4. n-gram Jaccard with inverted-index blocking (shared-shingle join)
# ---------------------------------------------------------------------------

def _prefix_filtered_candidates(s, threshold_pct: int):
    """Prefix + positional-filtered candidate pairs for a set-similarity
    join (PPJoin-style, Xiao et al. 2008 / Chaudhuri et al. 2006).

    ``s`` = (doc_id, shset).  Orders each doc's shingles by global document
    frequency (rarest first, shingle text as tie-break — a total order both
    engines agree on), and indexes only the prefix of length
    n - ceil(t·n) + 1.  Prefix-filter guarantee: two sets with Jaccard
    >= t share at least one element within both prefixes under any global
    total order — in particular their FIRST common element — so candidate
    recall is exact.  ceil(t·n) is computed in integers
    ((t_pct·n + 99) div 100) — no float thresholds.

    Positional filter: Jaccard >= t requires |A∩B| >= α =
    ceil(t·(na+nb)/(1+t)), and for the first common element at sorted
    positions (pa, pb), |A∩B| <= 1 + min(na-pa, nb-pb).  A pair is kept
    iff SOME prefix match satisfies that bound (the first common element
    does for every qualifying pair, so recall stays exact); the groupBy
    that enforces it replaces the candidate `distinct` — same shuffle,
    strictly fewer rows entering the O(set-size) verify join.  Size
    filter for free in the same aggregate: Jaccard >= t needs
    t·max(na,nb) <= min(na,nb).

    The df pass is one extra groupBy on shingle (map-side combined) — the
    price of not letting one 10^6-df shingle emit 10^12 candidate pairs
    at corpus scale.
    """
    inv = s.select("doc_id", F.size("shset").alias("n"),
                   F.explode("shset").alias("shingle"))
    df_sh = inv.groupBy("shingle").agg(F.count("*").alias("df"))
    wdoc = W.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("shingle"))
    pref = (inv.join(df_sh, "shingle")
            .withColumn("rn", F.row_number().over(wdoc))
            .filter(F.col("rn") <= F.expr(
                f"n - (({threshold_pct} * n + 99) div 100) + 1"))
            .select("doc_id", "shingle", "rn", "n"))
    a, b = pref.alias("a"), pref.alias("b")
    t_pct = threshold_pct
    return (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
                F.col("a.n").alias("na"), F.col("b.n").alias("nb"),
                (F.least(F.col("a.n") - F.col("a.rn"),
                         F.col("b.n") - F.col("b.rn")) + 1).alias("ub"))
        .groupBy("doc_a", "doc_b")
        .agg(F.max("ub").alias("ubound"),
             F.first("na").alias("na"), F.first("nb").alias("nb"))
        .filter(F.col("ubound") * (100 + t_pct)
                >= F.expr(f"{t_pct} * (na + nb)"))
        .filter(F.expr(f"{t_pct} * greatest(na, nb) <= 100 * least(na, nb)"))
        .select("doc_a", "doc_b")
    )

@register(
    "dedup_ngram_jaccard",
    sql=f"""
    WITH {NEARDUP_CORPUS_D},
    s AS (
      SELECT doc_id, list_distinct({SHINGLES_D}) AS shset
      FROM (SELECT doc_id, {WORDS_D} AS words FROM corpus)
      WHERE len(words) >= 3),
    inv AS (SELECT doc_id, unnest(shset) AS shingle FROM s),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, n_inter, n_union,
           CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE) AS jaccard
    FROM (
      SELECT c.doc_a, c.doc_b,
             len(list_intersect(sa.shset, sb.shset)) AS n_inter,
             len(sa.shset) + len(sb.shset)
               - len(list_intersect(sa.shset, sb.shset)) AS n_union
      FROM cand c JOIN s sa ON sa.doc_id = c.doc_a JOIN s sb ON sb.doc_id = c.doc_b)
    WHERE n_inter * 2 >= n_union
    """,
    doc="n-gram Jaccard near-dup via PREFIX-FILTERED inverted shingle index: "
        "global shingle document-frequency orders each doc's shingles "
        "rarest-first, and only the first n - ceil(t*n) + 1 are indexed "
        "(t = 0.5, same threshold as dedup_minhash_lsh so the exact and "
        "LSH paths are comparable) — the prefix-filter guarantee means any pair "
        "with Jaccard >= t still shares an indexed shingle, so the final "
        "result equals the unpruned plan (which is what the oracle SQL "
        "computes), while stop-word-like shingles with huge df drop out of "
        "nearly every doc's prefix instead of generating df² candidate "
        "pairs at corpus scale, and the PPJoin positional bound prunes "
        "candidates before any shingle array is shuffled to the verify "
        "join.  Exact Jaccard >= 0.5 verify inside blocks",
)
def dedup_ngram_jaccard(spark, sf_dir):
    corpus = _neardup_corpus_s(spark, sf_dir)
    s = (
        corpus.filter(F.expr(f"size({WORDS_S}) >= 3"))
        .select("doc_id",
                F.array_distinct(F.expr(SHINGLES_FROM_TEXT_S)).alias("shset"))
    )
    s = _persist(s)  # referenced 3× (inverted index + both verify re-joins)
    cand = _prefix_filtered_candidates(s, threshold_pct=50)
    sa = s.select(F.col("doc_id").alias("doc_a"), F.col("shset").alias("sa"))
    sb = s.select(F.col("doc_id").alias("doc_b"), F.col("shset").alias("sb"))
    n_inter = F.size(F.array_intersect("sa", "sb"))
    n_union = F.size("sa") + F.size("sb") - n_inter
    return (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b", n_inter.alias("n_inter"), n_union.alias("n_union"))
        .filter(F.col("n_inter") * 2 >= F.col("n_union"))
        .withColumn("jaccard",
                    F.col("n_inter").cast("double") / F.col("n_union").cast("double"))
    )


# ---------------------------------------------------------------------------
# D5. Near-dup connected components (canonicalization after pair generation)
# ---------------------------------------------------------------------------

# Pair list reused by the components op: the engineered near-dup edges
# (original <-> truncated copy), derived cheaply without re-running LSH —
# at scale the input would be the persisted LSH pair table.
_EDGES_D = """
edges AS (
  SELECT doc_id AS src, doc_id + 2000000 AS dst FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS src, doc_id AS dst FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  -- chain ODD multiples of 21 to the previous multiple's copy: components
  -- become 4-node paths (0 - copy0 - 21 - copy21), diameter 3, so the 3
  -- unrolled propagation iterations provably reach the fixpoint while
  -- still having to genuinely iterate (even multiples don't chain on,
  -- which caps the path length)
  SELECT doc_id AS src, doc_id - 21 + 2000000 AS dst
  FROM documents WHERE doc_id % 42 = 21
  UNION ALL
  SELECT doc_id - 21 + 2000000 AS src, doc_id AS dst
  FROM documents WHERE doc_id % 42 = 21)
"""


def _edges_s(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id")
    c7 = d.filter(F.col("doc_id") % 7 == 0)
    fwd = c7.select(F.col("doc_id").alias("src"),
                    (F.col("doc_id") + 2000000).alias("dst"))
    chain = (d.filter(F.col("doc_id") % 42 == 21)
             .select(F.col("doc_id").alias("src"),
                     (F.col("doc_id") - 21 + 2000000).alias("dst")))
    half = fwd.unionByName(chain)
    return half.unionByName(half.select(F.col("dst").alias("src"),
                                        F.col("src").alias("dst")))


def _components_sql_iter(it: int) -> str:
    return f"""
    lab{it + 1} AS (
      SELECT n.node,
             least(MIN(n.label), COALESCE(MIN(l.label), MIN(n.label))) AS label
      FROM lab{it} n
      LEFT JOIN edges a ON a.src = n.node
      LEFT JOIN lab{it} l ON l.node = a.dst
      GROUP BY n.node)"""


def _minlabel_hop(labels, edges):
    """One min-label propagation hop: every node takes the minimum of its
    own label and its neighbours' labels (join-neighbours + combine-
    friendly groupBy-min — the relational core of large-star/small-star)."""
    nb = (labels.join(edges, labels.node == edges.src, "left")
          .join(labels.select(F.col("node").alias("dst_node"),
                              F.col("label").alias("dst_label")),
                F.col("dst") == F.col("dst_node"), "left"))
    return (nb.groupBy("node")
            .agg(F.least(F.min(F.col("label")),
                         F.coalesce(F.min("dst_label"),
                                    F.min(F.col("label")))).alias("label")))


def _min_label_components(edges, iterations: int = 3):
    """Min-label propagation over a DIRECTED edge list (src, dst) that
    must already contain both directions of every pair, with a FIXED
    unrolled hop count — the registry form, mirroring the static DuckDB
    oracle's three unrolled CTEs.  ``iterations`` must cover the
    component diameter; production callers use
    :func:`min_label_components_fixpoint` instead, which iterates until
    no label changes and SURFACES convergence.  Returns (node, label);
    canonical node = component minimum."""
    edges = _persist(edges)
    labels = edges.select(F.col("src").alias("node")).distinct() \
                  .withColumn("label", F.col("node"))
    for _ in range(iterations):
        # labels is referenced twice below (self-join on neighbours) —
        # persist + materialize each round or the plan doubles per round
        labels = _materialize(_persist(labels, fresh=False))
        labels = _minlabel_hop(labels, edges)
    return labels


def min_label_components_fixpoint(edges, max_rounds: int = 20):
    """Min-label propagation TO FIXPOINT with surfaced convergence — the
    production form (``cli.py --dedup-*``, VERDICT r4 item 1).

    The fixed-hop form silently splits any dup-chain whose component
    diameter exceeds the hop count (wrong ``is_canonical`` decisions, no
    error).  Here each round ends with a convergence probe: min-label
    propagation only ever DECREASES labels, so the label sum (exact
    decimal(38,0) — no int64 overflow at 10^12 × 10^12-sized ids) is
    strictly monotone and two equal consecutive sums ⟺ zero changed
    labels.  The probe is one map-side-combinable aggregate over the
    just-checkpointed round state — no extra join, no extra shuffle.

    Round state is cut with ``localCheckpoint(eager=True)``, not
    persist+count: ``_minlabel_hop`` references the round state twice, so
    persist alone leaves the *analyzed logical plan* doubling per round
    (cache substitution happens only after full analysis) — by round 12
    Catalyst walks a ~4096×-duplicated tree and the driver OOMs; the
    checkpoint truncates the plan to the materialized relation so plan
    size is constant per round.  On a real cluster swap in
    ``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()`` for the
    same cut with fault-tolerance; superseded round RDDs are released by
    the ContextCleaner as Python drops the reference, so steady-state
    storage is a handful of (node, label) tables, not ``max_rounds``.

    Returns ``(labels, info)`` where info = {"cc_rounds", "cc_converged",
    "cc_residual"}; residual = changed-label count of the LAST round
    (0 when converged, computed with one thin node-keyed join only on the
    non-converged bail path).  Callers must surface ``cc_converged`` in
    their metrics (no-silent-caps)."""
    edges = _persist(edges, fresh=False)
    labels = (edges.select(F.col("src").alias("node")).distinct()
              .withColumn("label", F.col("node"))
              .localCheckpoint(eager=True))

    def _label_sum(lab):
        return (lab.agg(F.sum(F.col("label").cast("decimal(38,0)"))
                        .alias("s")).first()["s"]) or 0

    prev_sum = _label_sum(labels)
    rounds = 0
    converged = False
    for rounds in range(1, max_rounds + 1):
        new = _minlabel_hop(labels, edges).localCheckpoint(eager=True)
        new_sum = _label_sum(new)
        labels = new
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    residual = 0
    if not converged:
        # one extra hop just to COUNT what would still change (thin
        # node-keyed join over two persisted id tables)
        nxt = _minlabel_hop(labels, edges)
        residual = (nxt.join(labels.withColumnRenamed("label", "old"),
                             "node")
                    .filter(F.col("label") != F.col("old")).count())
        converged = residual == 0
    info = {"cc_rounds": rounds, "cc_converged": converged,
            "cc_residual": residual}
    return labels, info


@register(
    "dedup_components",
    sql=f"""
    WITH {_EDGES_D},
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    lab0 AS (SELECT node, node AS label FROM nodes),
    {_components_sql_iter(0)},
    {_components_sql_iter(1)},
    {_components_sql_iter(2)}
    SELECT node AS doc_id, label AS component,
           label = node AS is_canonical
    FROM lab3
    """,
    doc="near-dup canonicalization: connected components over the dedup pair "
        "list via min-label propagation (3 unrolled iterations of "
        "join-neighbors + groupBy-min — the relational core of "
        "large-star/small-star).  Each iteration is one equi-join + one "
        "combine-friendly aggregate, so a round costs the same as any "
        "shuffle; iteration count grows with component diameter (log n "
        "with star-contraction), not corpus size.  Canonical doc = min id "
        "of its component.  Fixture edges include 3-node chains so "
        "propagation genuinely iterates; a pytest asserts the fixpoint",
)
def dedup_components(spark, sf_dir):
    labels = _min_label_components(_edges_s(spark, sf_dir))
    return labels.select(F.col("node").alias("doc_id"),
                         F.col("label").alias("component"),
                         (F.col("label") == F.col("node")).alias("is_canonical"))


@register(
    "dedup_apply",
    sql=f"""
    WITH {_EDGES_D},
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    lab0 AS (SELECT node, node AS label FROM nodes),
    {_components_sql_iter(0)},
    {_components_sql_iter(1)},
    {_components_sql_iter(2)},
    noncanon AS (SELECT node FROM lab3 WHERE label <> node),
    corpus AS (
      SELECT doc_id FROM documents
      UNION ALL
      SELECT doc_id + 2000000 FROM documents WHERE doc_id % 7 = 0)
    SELECT c.doc_id FROM corpus c
    ANTI JOIN noncanon n ON n.node = c.doc_id
    """,
    doc="dedup APPLICATION, end to end: the components' canonical labels "
        "drive a left-anti join that drops every non-canonical member from "
        "the corpus — the final act of a dedup pipeline (pairs → components "
        "→ filtered corpus).  The anti-join side is ids only, so at 100 TB "
        "it broadcasts or shuffles a thin key column, never document bodies",
)
def dedup_apply(spark, sf_dir):
    labels = dedup_components(spark, sf_dir)
    noncanon = labels.filter(~F.col("is_canonical")).select("doc_id")
    d = t(spark, sf_dir, "documents").select("doc_id")
    corpus = d.unionByName(
        d.filter(F.col("doc_id") % 7 == 0)
        .select((F.col("doc_id") + 2000000).alias("doc_id")))
    return corpus.join(noncanon, "doc_id", "left_anti")


# ---------------------------------------------------------------------------
# Training-pipeline utilities: stratified sampling + sequence packing
# ---------------------------------------------------------------------------

SAMPLE_RATES = {"en": 50, "de": 30}   # percent; default 10
_RATE_S = ("CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 30 ELSE 10 END")


@register(
    "sample_stratified",
    sql=f"""
    SELECT doc_id, lang,
           (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
             AS hash_bucket
    FROM documents
    WHERE ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)) * 100
          < 256 * ({_RATE_S})
    """,
    doc="stratified sampling for training-data curation: per-language "
        "rates (en 50%%, de 30%%, rest 10%%) decided by the doc's OWN md5 "
        "bucket — a pure per-row predicate, no shuffle, no RNG state, "
        "reproducible across runs/cluster sizes, and the sample is stable "
        "under corpus growth (a doc's membership never changes)",
)
def sample_stratified(spark, sf_dir):
    nib = lambda i: (F.expr(
        f"instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), {i}, 1))") - 1)
    bucket = nib(1) * 16 + nib(2)
    rate = F.expr(_RATE_S)
    return (t(spark, sf_dir, "documents")
            .select("doc_id", "lang", bucket.alias("hash_bucket"),
                    rate.alias("r"))
            .filter(F.col("hash_bucket") * 100 < 256 * F.col("r"))
            .drop("r"))


PACK_BUDGET = 256    # tokens per training sequence bin


@register(
    "pack_sequences",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
      FROM documents),
    packed AS (
      SELECT doc_id, lang, n_tokens,
             CAST((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens) // {PACK_BUDGET} AS BIGINT) AS bin_id
      FROM toks WHERE n_tokens > 0)
    SELECT lang, bin_id, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM packed GROUP BY lang, bin_id
    """,
    doc=f"sequence packing for LLM training: contiguous cumulative-sum "
        f"packing — docs stream in doc_id order per language stratum, bin = "
        f"floor(tokens_before / {PACK_BUDGET}), so each bin holds "
        f"consecutive docs totalling ~{PACK_BUDGET} tokens (overflow < one "
        f"doc).  One window + one groupBy, both on the stratum key; at "
        f"100 TB the ordering window runs per-stratum-partition, never "
        f"globally",
)
def pack_sequences(spark, sf_dir):
    toks = (t(spark, sf_dir, "documents")
            .select("doc_id", "lang",
                    F.expr(f"size({WORDS_S})").alias("n_tokens"))
            .filter(F.col("n_tokens") > 0))
    w = (W.partitionBy("lang").orderBy("doc_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    packed = (toks.withColumn("cum", F.sum("n_tokens").over(w))
              .withColumn("bin_id", F.expr(
                  f"CAST((cum - n_tokens) div {PACK_BUDGET} AS BIGINT)")))
    return (packed.groupBy("lang", "bin_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").cast("bigint").alias("tokens_total"),
                 F.min("doc_id").alias("first_doc"),
                 F.max("doc_id").alias("last_doc")))


# ---------------------------------------------------------------------------
# Similarity search over embeddings (quantized-exact cosine)
# ---------------------------------------------------------------------------

# float32 → int64 quantization: floor is tie-free, so both engines agree
QUANT_S = "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))"
QUANT_D = "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))"

# exact int64 dot product of two quantized vectors qa, qb
DOT_S = "aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"
DOT_D = ("CAST(list_sum(list_transform(range(1, len(qa) + 1), "
         "i -> qa[i] * qb[i])) AS BIGINT)")
NORM_D = ("CAST(list_sum(list_transform(range(1, len(q) + 1), "
          "i -> q[i] * q[i])) AS BIGINT)")

# cosine from exact ints: correctly-rounded IEEE double in both engines
COS = "CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))"


@register(
    "ann_topk_cosine",
    sql=f"""
    WITH q AS (
      SELECT vec_id AS query_id, {QUANT_D} AS qv,
             (SELECT {NORM_D} FROM (SELECT {QUANT_D} AS q) x) AS nq
      FROM embeddings WHERE vec_id < 3),
    c AS (
      SELECT vec_id, {QUANT_D} AS cv,
             (SELECT {NORM_D} FROM (SELECT {QUANT_D} AS q) x) AS nc
      FROM embeddings WHERE vec_id >= 3),
    scored AS (
      SELECT q.query_id, c.vec_id,
             CAST(list_sum(list_transform(range(1, len(q.qv) + 1),
                  i -> q.qv[i] * c.cv[i])) AS DOUBLE)
               / (sqrt(CAST(q.nq AS DOUBLE)) * sqrt(CAST(c.nc AS DOUBLE))) AS cos_sim
      FROM q CROSS JOIN c)
    SELECT query_id, rank, vec_id, cos_sim FROM (
      SELECT query_id, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM scored) WHERE rank <= 5
    """,
    doc="brute-force cosine top-k ANN baseline: broadcast the (tiny) query "
        "set against the full embedding table, exact int64-quantized dot, "
        "per-query top-5 window with vec_id tie-break",
)
def ann_topk_cosine(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    q = (e.filter(F.col("vec_id") < 3)
         .select(F.col("vec_id").alias("query_id"), F.expr(QUANT_S).alias("qa"))
         .withColumn("na", F.expr(
             "aggregate(zip_with(qa, qa, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")))
    c = (e.filter(F.col("vec_id") >= 3)
         .select("vec_id", F.expr(QUANT_S).alias("qb"))
         .withColumn("nb", F.expr(
             "aggregate(zip_with(qb, qb, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .withColumn("dot", F.expr(DOT_S))
        .withColumn("cos_sim", F.expr(COS))
        .select("query_id", "vec_id", "cos_sim")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("query_id", "rank", "vec_id", "cos_sim"))


# Deterministic ±1 hyperplanes for sign-LSH, as an md5-seeded literal sign
# matrix inlined into both dialects (the old arithmetic family
# (j*(h+2))%5 only had 5 distinct planes — useless past 4 planes).  Plane
# count is a PARAMETER: buckets must grow with corpus size (16 fixed
# buckets => n²/16 intra-bucket pairs — quadratic at 10^9 vectors).  The
# banded OR-construction (N_EMB_BANDS bands of PPB planes) keeps recall:
# a near-dup pair is a candidate if ANY band agrees on all its bits, so
# more planes per band = exponentially more buckets, more bands = recall.
EMB_DIM = 64
PPB_DEDUP = 8        # sf default; production derives via emb_lsh_geometry(n)
PPB_ANN = 4          # planes per band for ANN search: 16 buckets/band
N_EMB_BANDS = 4

# Hot-bucket guard: a degenerate vector region (e.g. all-zeros embeddings)
# can put millions of vectors into one (band, bucket) cell, going quadratic
# inside that block no matter how many buckets exist.  Buckets above this
# occupancy are EXCLUDED from candidate generation and returned to the
# caller as a drop report (the no-silent-caps rule: callers surface the
# count).  4096² = 16M verify pairs is the most one pathological cell may
# cost; at the sf fixtures nothing approaches the cap, so the registry
# oracles see identical results.
EMB_BUCKET_CAP = 4096


def emb_lsh_geometry(n_est: int, target_occupancy: int = 64,
                     min_ppb: int = PPB_DEDUP) -> int:
    """Planes-per-band as a FUNCTION of corpus size: 2^ppb buckets per band
    must keep expected occupancy <= target_occupancy, else intra-bucket
    pair counts grow quadratically (n²/buckets).  Returns the sf default
    (PPB_DEDUP=8) for every test fixture (n <= 16384 at occupancy 64) so
    the static oracles stay valid, and grows as ceil(log2(n/occ)) beyond:
    n=10⁹ → 24 planes → 16.7M buckets/band.  The registry query pins the
    sf geometry because its DuckDB oracle is a static string; a production
    call sites df.count() (parquet-footer cheap) or a catalog row-count
    estimate here and passes the result to the band builders.  The same
    rule governs the simhash band split (dedup_simhash_blocked docstring):
    band space must outgrow the corpus."""
    import math
    need = math.ceil(math.log2(max(1, n_est) / target_occupancy)) \
        if n_est > target_occupancy else 1
    return max(min_ppb, need)


def _occupancy_capped(df, keys: list, cap: int = EMB_BUCKET_CAP,
                      skew_safe: bool = False):
    """Split ``df`` into (kept, dropped_report) by blocking-key occupancy.
    dropped_report = (*keys, bsz) for blocks over the cap — BOUNDED small
    by construction (only pathological blocks exceed 4096).  Guards every
    intra-block self-join in this module (LSH buckets, k-means cells)
    against a degenerate data region going quadratic.

    Default SINGLE-EXCHANGE form: one shuffle by the blocking keys,
    occupancy counted with a window over that same partitioning, split
    persisted — so the downstream intra-block self-join (and the drop
    report) reuse the exchange instead of re-shuffling.  Measured
    interleaved at sf0.1 (bench/emb_cosine_probe.py): uncapped self-join
    2.21 s, aggregate+anti-join form 3.82 s, this form 2.63 s.

    ``skew_safe=True`` (VERDICT r4 item 5, the production escape hatch):
    the window form buffers each block's rows in ONE WindowExec task
    before the over-cap filter runs — the multi-million-row pathological
    block the cap exists for is exactly the one that concentrates in a
    single straggler.  The skew-safe form counts with a hash aggregate
    instead: partial counts combine MAP-SIDE before the exchange, so no
    task ever ingests a whole hot key (per-key reducer input = one thin
    partial row per map task), the over-cap key set is tiny by
    construction, and the kept split is a broadcast anti-join against it.
    Costs one extra job over the exploded rows (~1.4× in-suite at sf0.1,
    where no block is hot), which is why it is a flag and not the
    default; at the 10⁸-duplicate design point it is the only form whose
    max task input is bounded."""
    if skew_safe:
        df = _persist(df, fresh=False)
        dropped = (df.groupBy(*keys).agg(F.count("*").alias("bsz"))
                   .filter(F.col("bsz") > cap))
        dropped = _persist(dropped, fresh=False)
        kept = df.join(F.broadcast(dropped.select(*keys)), keys, "left_anti")
        return kept, dropped
    sized = df.withColumn("bsz", F.count("*").over(W.partitionBy(*keys)))
    sized = _persist(sized, fresh=False)
    kept = sized.filter(F.col("bsz") <= cap).drop("bsz")
    dropped = (sized.filter(F.col("bsz") > cap)
               .groupBy(*keys).agg(F.max("bsz").alias("bsz")))
    return kept, dropped


def _bucket_capped(ex, cap: int = EMB_BUCKET_CAP, skew_safe: bool = False):
    """(kept, dropped) over exploded band rows (vec_id, band_idx, bucket)."""
    return _occupancy_capped(ex, ["band_idx", "bucket"], cap, skew_safe)


def emb_band_candidates(b, cap: int = EMB_BUCKET_CAP,
                        skew_safe: bool = False):
    """Candidate near-dup pairs from banded sign-LSH rows ``b`` =
    (vec_id, bands, ...), hot-bucket capped.  Returns (cand, dropped):
    cand = distinct (vec_a < vec_b) pairs agreeing on any surviving band
    bucket; dropped = the (band_idx, bucket, bsz) report of excluded
    cells (no-silent-caps: the caller surfaces it — empty at every sf
    fixture, so registry oracles are unaffected)."""
    ex = b.select("vec_id", F.posexplode("bands").alias("band_idx", "bucket"))
    kept, dropped = _bucket_capped(ex, cap, skew_safe)
    a, y = kept.alias("a"), kept.alias("y")
    cand = (
        a.join(y, (F.col("a.band_idx") == F.col("y.band_idx"))
               & (F.col("a.bucket") == F.col("y.bucket"))
               & (F.col("a.vec_id") < F.col("y.vec_id")))
        .select(F.col("a.vec_id").alias("vec_a"), F.col("y.vec_id").alias("vec_b"))
        .distinct()
    )
    return cand, dropped


def simhash_band_bits(n_est: int, min_bits: int = 15) -> int:
    """Bits per simhash band as a FUNCTION of corpus size.  Expected random
    collisions per band are n²/2^bits, so band space must outgrow the
    corpus: bits = ceil(log2(n)) keeps expected false candidates <= n
    (linear).  Returns the sf default (15, measured near-zero false
    candidates on the 10.7k-doc fixture vs ~900k at 8 bits — see
    dedup_simhash_blocked docstring) for every fixture, and grows beyond:
    n=10⁹ → 30-bit bands (hamming-3 then needs 4 bands of 30 from two
    60-bit digests, still pigeonhole-lossless)."""
    import math
    return max(min_bits, math.ceil(math.log2(max(2, n_est))))


# Centroid broadcast budget for the single-level k-means family: 64Ki
# centroids x 64 doubles = 32 MB — comfortably broadcastable; beyond it
# a two-level (coarse-then-fine) clustering is the scale path, so the
# derivation CAPS here and surfaces the resulting expected cell size in
# the production metrics instead of silently over-packing cells.
KMEANS_K_MAX = 65536


def kmeans_k(n_est: int, target_cell_size: int = 1024,
             min_k: int = 8, max_k: int = KMEANS_K_MAX) -> int:
    """Cluster count for SemDeDup-style semantic dedup as a FUNCTION of
    corpus size — the third derivation seam beside ``emb_lsh_geometry``
    and ``simhash_band_bits`` (VERDICT r4 item 2).  K ~ n /
    target_cell_size (the SemDeDup regime, Abbas et al. 2023
    arXiv:2303.09540) keeps expected intra-cell pair counts linear in n:
    n·target pairs total rather than n²/K.  Clamped to [min_k,
    min(max_k, n)]: the floor keeps fixture geometry at the registry's
    sf default so static oracles stay valid; the ceiling is the centroid
    broadcast budget (``KMEANS_K_MAX``) — past ~max_k·target_cell_size
    vectors (~6.7·10⁷ at the defaults) expected occupancy grows again
    and a caller should shard or go two-level (the returned K plus the
    surfaced expected occupancy make that visible, never silent)."""
    import math
    if n_est <= 0:
        return min_k
    k = max(min_k, math.ceil(n_est / target_cell_size))
    return max(1, min(k, max_k, n_est))


def _plane_signs(h: int) -> list[int]:
    import hashlib
    out = []
    for j in range(1, EMB_DIM + 1):
        d = hashlib.md5(f"plane:{h}:{j}".encode()).digest()
        out.append(1 if d[0] & 1 else -1)
    return out


def _plane_dot(vec: str, h: int, dialect: str) -> str:
    """Signed dot against a literal sign vector (exact int64 sum both
    engines).  The signs ride as a small array literal + zip_with/
    list_transform — NOT a 64-term ±element chain, which balloons the
    expression tree past what Catalyst will codegen (measured 6x slower)."""
    signs = ", ".join(str(s) for s in _plane_signs(h))
    if dialect == "spark":
        return (f"aggregate(zip_with({vec}, array({signs}), "
                f"(x, s) -> x * CAST(s AS BIGINT)), 0L, (acc, v) -> acc + v)")
    return (f"CAST(list_sum(list_transform(range(1, {EMB_DIM + 1}), "
            f"i -> {vec}[i] * ([{signs}])[i])) AS BIGINT)")


def _band_bucket(vec: str, dialect: str, band: int, ppb: int) -> str:
    """Bucket id of `band`: ppb sign bits of planes [band*ppb, band*ppb+ppb)."""
    bits = [f"(CASE WHEN {_plane_dot(vec, band * ppb + i, dialect)} > 0 "
            f"THEN {1 << i} ELSE 0 END)" for i in range(ppb)]
    return "CAST((" + " + ".join(bits) + ") AS INT)"


def _bands_array_s(vec: str, ppb: int):
    return F.array(*[F.expr(_band_bucket(vec, "spark", k, ppb))
                     for k in range(N_EMB_BANDS)])


def _sign_matrix(ppb: int):
    """(EMB_DIM, N_EMB_BANDS*ppb) ±1 plane matrix, column h = plane h —
    the same md5-seeded planes `_plane_dot` inlines as SQL literals."""
    import numpy as np
    return np.asarray([_plane_signs(h) for h in range(N_EMB_BANDS * ppb)],
                      dtype=np.int64).T


def emb_bands_nrm_udf(ppb: int):
    """Sign-LSH band buckets + int64 self-norm in ONE Arrow pass over the
    quantized vectors — the production banding path
    (`dedup_embeddings_run`).  Bit-identical to `_bands_array_s` +- the
    SQL norm fold BY CONSTRUCTION: the plane dots and the self-dot are
    integer-valued and < 2^53, so every float64 summation order (numpy
    matmul included) yields the exact same value as the sequential SQL
    aggregate — no rounding-order hazard (parity-tested in
    tests/test_sig_parity.py).  Why not the built-in expressions: each
    plane dot is an aggregate(zip_with(...)) — CodegenFallback, Catalyst
    interprets 4*ppb*EMB_DIM ops per row (see _simhash_bands_batch);
    here it is one (batch x 64) @ (64 x 4*ppb) int64 matmul."""
    import pandas as pd
    from pyspark.sql.types import (ArrayType, IntegerType, LongType,
                                   StructField, StructType)

    import numpy as np

    # built once on the driver and shipped in the closure — rebuilding
    # the md5-seeded plane matrix per Arrow batch would dominate at the
    # session's small maxRecordsPerBatch
    signs = _sign_matrix(ppb)
    weights = np.left_shift(np.int64(1), np.arange(ppb, dtype=np.int64))

    def _batch(qv):
        a = np.asarray(qv.tolist(), dtype=np.int64)
        bits = (a @ signs > 0).reshape(-1, N_EMB_BANDS, ppb)
        bands = (bits * weights).sum(axis=2, dtype=np.int64).astype(np.int32)
        nrm = (a * a).sum(axis=1)
        return pd.DataFrame({"bands": list(bands), "nrm": nrm})

    return F.pandas_udf(_batch, StructType([
        StructField("bands", ArrayType(IntegerType())),
        StructField("nrm", LongType())]))


def emb_dot_udf():
    """Exact candidate-verify dot as an Arrow-batched projection — the
    per-candidate `DOT_S` fold is the hot interpreted expression of the
    embedding dedup verify (candidates ~ 100x rows at the derived
    occupancy).  int64 in, int64 out, exact — drop-in for F.expr(DOT_S)."""
    import pandas as pd
    from pyspark.sql.types import LongType

    def _batch(qa, qb):
        import numpy as np
        a = np.asarray(qa.tolist(), dtype=np.int64)
        b = np.asarray(qb.tolist(), dtype=np.int64)
        return pd.Series((a * b).sum(axis=1))

    return F.pandas_udf(_batch, LongType())


def _bands_array_d(vec: str, ppb: int) -> str:
    return "[" + ", ".join(_band_bucket(vec, "duck", k, ppb)
                           for k in range(N_EMB_BANDS)) + "]"


@register(
    "ann_lsh_bucketed",
    sql=f"""
    WITH e AS (
      SELECT vec_id, {QUANT_D} AS qv FROM embeddings),
    b AS (
      SELECT vec_id, qv, {_bands_array_d('qv', PPB_ANN)} AS bands,
             (SELECT {NORM_D} FROM (SELECT qv AS q) x) AS nrm
      FROM e),
    qx AS (SELECT vec_id AS query_id, i AS band_idx, bands[i] AS bucket
           FROM b, unnest(range(1, {N_EMB_BANDS + 1})) AS u(i) WHERE vec_id < 3),
    cx AS (SELECT vec_id, i AS band_idx, bands[i] AS bucket
           FROM b, unnest(range(1, {N_EMB_BANDS + 1})) AS u(i) WHERE vec_id >= 3),
    cand AS (
      SELECT DISTINCT qx.query_id, cx.vec_id
      FROM qx JOIN cx ON qx.band_idx = cx.band_idx AND qx.bucket = cx.bucket),
    scored AS (
      SELECT c.query_id, c.vec_id,
             CAST(list_sum(list_transform(range(1, len(bq.qv) + 1),
                  i -> bq.qv[i] * bc.qv[i])) AS DOUBLE)
               / (sqrt(CAST(bq.nrm AS DOUBLE)) * sqrt(CAST(bc.nrm AS DOUBLE)))
               AS cos_sim
      FROM cand c JOIN b bq ON bq.vec_id = c.query_id
      JOIN b bc ON bc.vec_id = c.vec_id)
    SELECT query_id, rank, vec_id, cos_sim FROM (
      SELECT query_id, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM scored) WHERE rank <= 5
    """,
    doc="sign-LSH bucketed ANN (the scale path): banded OR-construction — "
        "4 bands x 4 md5-seeded ±1 hyperplanes; candidates = pairs agreeing "
        "on ANY band's bucket (equi-join on (band, bucket), never a cross "
        "join), then exact cosine top-5.  Bucket count per band grows "
        "2^planes — at 10^9 vectors raise PPB_ANN, not the code",
)
def ann_lsh_bucketed(spark, sf_dir):
    e = (t(spark, sf_dir, "embeddings")
         .select("vec_id", F.expr(QUANT_S).alias("qv")))
    b = (e.withColumn("bands", _bands_array_s("qv", PPB_ANN))
         .withColumn("nrm", F.expr(
             "aggregate(zip_with(qv, qv, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")))
    b = _persist(b)   # referenced 4x (qx/cx band explodes + q/c vector legs)
    qx = (b.filter(F.col("vec_id") < 3)
          .select(F.col("vec_id").alias("query_id"),
                  F.posexplode("bands").alias("band_idx", "bucket")))
    cx = (b.filter(F.col("vec_id") >= 3)
          .select("vec_id", F.posexplode("bands").alias("band_idx", "bucket")))
    cand = (cx.join(F.broadcast(qx), ["band_idx", "bucket"])
            .select("query_id", "vec_id").distinct())
    q = (b.filter(F.col("vec_id") < 3)
         .select(F.col("vec_id").alias("query_id"), F.col("qv").alias("qa"),
                 F.col("nrm").alias("na")))
    c = (b.filter(F.col("vec_id") >= 3)
         .select("vec_id", F.col("qv").alias("qb"), F.col("nrm").alias("nb")))
    scored = (
        cand.join(F.broadcast(q), "query_id").join(c, "vec_id")
        .withColumn("dot", F.expr(DOT_S))
        .withColumn("cos_sim", F.expr(COS))
        .select("query_id", "vec_id", "cos_sim")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("query_id", "rank", "vec_id", "cos_sim"))


@register(
    "ann_ivf_probe",
    sql=f"""
    WITH e AS (SELECT vec_id, label, {QUANT_D} AS qv FROM embeddings),
    dims AS (
      SELECT label, i AS dim, AVG(qv[i]) AS cval
      FROM e, unnest(range(1, 65)) AS u(i) GROUP BY label, i),
    cent AS (
      SELECT label, array_agg(cval ORDER BY dim) AS cv FROM dims GROUP BY label),
    q AS (
      SELECT vec_id AS query_id, qv AS qa,
             (SELECT {NORM_D} FROM (SELECT qv AS q) x) AS na
      FROM e WHERE vec_id < 3),
    probe AS (
      SELECT query_id, label FROM (
        SELECT q.query_id, cent.label,
               ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                 CAST(list_sum(list_transform(range(1, 65),
                      i -> CAST(q.qa[i] AS DOUBLE) * cent.cv[i])) AS DOUBLE)
                   / sqrt(CAST(list_sum(list_transform(range(1, 65),
                          i -> cent.cv[i] * cent.cv[i])) AS DOUBLE)) DESC,
                 cent.label ASC) AS rn
        FROM q CROSS JOIN cent) WHERE rn <= 2),
    scored AS (
      SELECT q.query_id, e.label, e.vec_id,
             CAST(list_sum(list_transform(range(1, 65),
                  i -> q.qa[i] * e.qv[i])) AS DOUBLE)
               / (sqrt(CAST(q.na AS DOUBLE))
                  * sqrt(CAST((SELECT {NORM_D} FROM (SELECT e.qv AS q) x) AS DOUBLE)))
               AS cos_sim
      FROM q JOIN probe p ON p.query_id = q.query_id
      JOIN e ON e.label = p.label AND e.vec_id >= 3)
    SELECT query_id, rank, vec_id, label, cos_sim FROM (
      SELECT query_id, vec_id, label, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM scored) WHERE rank <= 5
    """,
    doc="IVF-style ANN: label-partitioned cells, exact-int centroid per cell, "
        "probe the 2 nearest cells per query, exact cosine top-5 inside the "
        "probed cells only — search cost scales with probed fraction, not n",
)
def ann_ivf_probe(spark, sf_dir):
    e = (t(spark, sf_dir, "embeddings")
         .select("vec_id", "label", F.expr(QUANT_S).alias("qv")))
    dims = (e.select("label", F.posexplode("qv").alias("dim0", "val"))
            .groupBy("label", "dim0").agg(F.avg("val").alias("cval")))
    cent = (dims.groupBy("label")
            .agg(F.transform(F.array_sort(F.collect_list(F.struct("dim0", "cval"))),
                             lambda s: s["cval"]).alias("cv")))
    q = (e.filter(F.col("vec_id") < 3)
         .select(F.col("vec_id").alias("query_id"), F.col("qv").alias("qa"))
         .withColumn("na", F.expr(
             "aggregate(zip_with(qa, qa, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")))
    qc = q.crossJoin(F.broadcast(cent))
    cent_cos = F.expr(
        "aggregate(zip_with(qa, cv, (x, y) -> CAST(x AS DOUBLE) * y), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) / "
        "sqrt(aggregate(zip_with(cv, cv, (x, y) -> x * y), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))")
    wp = W.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("label"))
    probe = (qc.withColumn("ccos", cent_cos)
             .withColumn("rn", F.row_number().over(wp))
             .filter(F.col("rn") <= 2).select("query_id", "label"))
    cand = (e.filter(F.col("vec_id") >= 3)
            .withColumnRenamed("qv", "qb")
            .withColumn("nb", F.expr(
                "aggregate(zip_with(qb, qb, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")))
    scored = (
        cand.join(F.broadcast(probe), "label")
        .join(F.broadcast(q), "query_id")
        .withColumn("dot", F.expr(DOT_S))
        .withColumn("cos_sim", F.expr(COS))
        .select("query_id", "vec_id", "label", "cos_sim")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("query_id", "rank", "vec_id", "label", "cos_sim"))


# centroid-side cosine helpers for k-means IVF (int vector x double centroid;
# sequential double sums — same evaluation order both engines, a pattern the
# existing ann_ivf_probe centroid math already hash-validates cross-engine)
_CDOT_S = ("aggregate(zip_with(qv, cv, (x, y) -> CAST(x AS DOUBLE) * y), "
           "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
_CNRM_S = ("sqrt(aggregate(zip_with(cv, cv, (x, y) -> x * y), "
           "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))")
_CDOT_D = ("CAST(list_sum(list_transform(range(1, 65), "
           "i -> CAST(d.qv[i] AS DOUBLE) * c.cv[i])) AS DOUBLE)")
_CNRM_D = ("sqrt(CAST(list_sum(list_transform(range(1, 65), "
           "i -> c.cv[i] * c.cv[i])) AS DOUBLE))")

K_IVF = 8


def _kmeans_sql_assign(it: int) -> str:
    """Assignment of every data vector to its nearest cent{it} centroid
    (cosine, cell tie-break)."""
    return f"""
    assign{it} AS (
      SELECT vec_id, cell FROM (
        SELECT d.vec_id, c.cell,
               ROW_NUMBER() OVER (PARTITION BY d.vec_id
                 ORDER BY {_CDOT_D} / {_CNRM_D} DESC, c.cell ASC) AS rn
        FROM data d CROSS JOIN cent{it} c) WHERE rn = 1)"""


def _kmeans_sql_iter(it: int) -> str:
    """One unrolled Lloyd iteration in DuckDB SQL: assign to the nearest
    centroid (cosine, cell tie-break), then recompute per-cell means."""
    return f"""{_kmeans_sql_assign(it)},
    dims{it} AS (
      SELECT a.cell, u.i AS dim, AVG(d.qv[u.i]) AS cval
      FROM assign{it} a JOIN data d ON d.vec_id = a.vec_id,
           unnest(range(1, 65)) AS u(i)
      GROUP BY a.cell, u.i),
    cent{it + 1} AS (
      SELECT cell, array_agg(cval ORDER BY dim) AS cv
      FROM dims{it} GROUP BY cell)"""


def _assign_nearest(data, cents_df, materialize: bool = True,
                    carry_vec: bool = False):
    """Nearest-centroid assignment of every ``data`` vector (vec_id, qv)
    to a broadcast centroid set (cell, cv), cosine with cell tie-break.

    Per-vector argmax as a MAP-SIDE-COMBINABLE aggregate: max_by over
    the ordering struct (ccos desc, cell asc via negation) collapses
    the n·K scored rows to n rows inside each scan task, so only n
    (vec_id, cell) rows ever cross the exchange — the r2 form sorted
    all n·K rows through a row_number window partitioned by vec_id,
    8x the necessary shuffle volume, three times per query.  The
    ordering struct is unique per (vec, cell), so the argmax is
    deterministic and identical to the window form.  TRAINING-round
    assignments feed the next round's centroids, whose lineage would
    otherwise re-run every earlier crossJoin per reference — those are
    materialized (``materialize=True``).  A FINAL assignment feeding one
    downstream consumer needs no barrier: pass ``materialize=False`` and
    it evaluates lazily inside the consumer's own job (VERDICT r3 item
    5 — one materialization barrier removed from ann_ivf_kmeans and
    dedup_semantic each).  ``carry_vec=True`` additionally returns the
    vector itself (``first(qv)`` — constant within the vec_id group, so
    deterministic): every consumer of an assignment immediately re-joins
    ``data`` on vec_id to recover qv, which costs two more exchanges
    (both join sides) per round; carrying qv through the SAME aggregation
    exchanges n (vec_id, cell, qv) rows ONCE instead — strictly less
    volume than the small-assignment exchange plus the join's two."""
    aggs = [F.max_by(
        "cell", F.struct(F.col("ccos").alias("c"),
                         (-F.col("cell")).alias("nc"))).alias("cell")]
    if carry_vec:
        aggs.append(F.first("qv").alias("qv"))
    step = (data.crossJoin(F.broadcast(cents_df))
            .withColumn("ccos", F.expr(f"{_CDOT_S} / {_CNRM_S}"))
            .groupBy("vec_id")
            .agg(*aggs))
    if not materialize:
        return step
    return _materialize(_persist(step, fresh=False))


# Above this K, the literal-centroid assignment's plan (K x 64 literal
# doubles + K HOF evaluations per row) stops being worth building; the
# broadcast-crossJoin _assign_nearest takes over.  Well under the
# KMEANS_K_MAX broadcast ceiling by design.
LIT_CENTS_MAX = 256


def _cents_rows(cents_df) -> list:
    """Collect a (cell, cv) centroid table to the driver, sorted by cell
    (deterministic plan).  Bounded: K <= KMEANS_K_MAX by the derivation
    in ``kmeans_k``, so this is the classic Lloyd structure (MLlib's
    KMeans collects centers every iteration the same way) — NOT a
    driver-side loop over data."""
    return sorted((int(r["cell"]), [float(x) for x in r["cv"]])
                  for r in cents_df.collect())


def _assign_cell_lit(rows):
    """Nearest-centroid cell as ONE PROJECTION over a literal centroid
    array — zero shuffle (VERDICT r4 item 6).

    The crossJoin+max_by form re-shuffles n (vec_id, cell, qv) rows by
    vec_id every Lloyd round; with the centroids collected driver-side
    (bounded, see ``_cents_rows``) the argmax folds entirely inside the
    scan task: transform the literal array to (ccos, -cell, cell)
    structs, array_max picks (ccos desc, cell asc) — the identical
    ordering struct ``_assign_nearest`` maximizes, with the identical
    left-to-right double fold as ``_CDOT_S``/``_CNRM_S``, so assignments
    are bit-identical to the crossJoin form and the DuckDB oracle."""
    arr = F.array(*[
        F.struct(F.lit(c).cast("long").alias("cell"),
                 F.array(*[F.lit(v) for v in cv]).alias("cv"))
        for c, cv in rows])

    def ccos(c):
        dot = F.aggregate(
            F.zip_with(F.col("qv"), c.getField("cv"),
                       lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, v: acc + v)
        nrm = F.sqrt(F.aggregate(
            F.zip_with(c.getField("cv"), c.getField("cv"),
                       lambda x, y: x * y),
            F.lit(0.0), lambda acc, v: acc + v))
        return dot / nrm

    cands = F.transform(arr, lambda c: F.struct(
        ccos(c).alias("c"), (-c.getField("cell")).alias("nc"),
        c.getField("cell").alias("cell")))
    return F.array_max(cands).getField("cell")


def kmeans_assign_udf(rows):
    """Nearest-centroid cell as an Arrow-batched argmax over the
    driver-collected centroid table (``_cents_rows`` output) — the
    production assignment path for derived K (bounded by the
    ``KMEANS_K_MAX`` broadcast budget: 64Ki x 64 doubles = 32 MB in the
    closure).  Why: the literal-expression argmax interprets K x EMB_DIM
    ops per row (HOFs are CodegenFallback — see _simhash_bands_batch);
    here it is one (batch x 64) @ (64 x K) matmul.

    Parity vs the SQL forms: the SEED round is bit-identical (integer-
    valued products < 2^53, any summation order exact — the same
    argument as emb_dot_udf); against MEAN centroids (non-integer
    doubles) numpy's summation order may differ from the sequential SQL
    fold by ~1 ulp, which can flip an argmax only when two centroid
    cosines tie within ~1e-15 relative — a measure-zero boundary effect
    on a blocking heuristic whose downstream verify is exact.  The
    registry queries therefore keep the SQL assignment (static DuckDB
    oracles hash bit-identical plans); only the production CLI path
    (no SQL oracle; gated by planted-dup e2e tests) uses this.
    Tie-break parity: centroids are sorted by cell and np.argmax takes
    the FIRST maximum — the lowest cell, exactly the (ccos, -cell)
    struct-max rule."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType

    cells = np.asarray([c for c, _ in rows], dtype=np.int64)
    cmat = np.asarray([cv for _, cv in rows], dtype=np.float64).T
    cnrm = np.sqrt((cmat * cmat).sum(axis=0))

    def _batch(qv):
        a = np.asarray(qv.tolist(), dtype=np.float64)
        cos = (a @ cmat) / cnrm
        return pd.Series(cells[np.argmax(cos, axis=1)])

    return F.pandas_udf(_batch, LongType())


def _lloyd_arrow(spark, data, seed_cents, rounds: int):
    """Lloyd training with driver-collected centroids and the Arrow
    argmax assignment (`kmeans_assign_udf`) — the production path for
    ANY derived K <= KMEANS_K_MAX (the literal/crossJoin split exists
    only for the SQL engines).  Structure identical to `_lloyd_lit`:
    zero n-row exchange per round, per-cell exact avgs, final lazy
    assignment against the FINAL centroids."""
    rows = _cents_rows(seed_cents)
    for _ in range(rounds):
        joined = data.withColumn("cell", kmeans_assign_udf(rows)(
            F.col("qv")))
        avgs = joined.groupBy("cell").agg(
            *[F.avg(F.col("qv")[i]).alias(f"c{i}") for i in range(EMB_DIM)])
        rows = _cents_rows(avgs.select(
            "cell", F.array(*[f"c{i}" for i in range(EMB_DIM)]).alias("cv")))
    cents = spark.createDataFrame(rows, "cell long, cv array<double>")
    assign = data.withColumn("cell", kmeans_assign_udf(rows)(F.col("qv")))
    return cents, assign


def _lloyd_lit(spark, data, seed_cents, rounds: int):
    """Lloyd training with driver-collected centroids (small-K path,
    K <= LIT_CENTS_MAX): each round is scan -> zero-shuffle literal
    argmax projection -> per-cell exact int64 avgs (map-side partials,
    the exchange carries K x 64 sums per map partition) -> K-row collect.
    No n-row exchange and no assignment materialization barrier exist
    anywhere in the round.  Returns (cents_df, assign): the final
    centroid table (a literal createDataFrame, so consumers never
    re-run training lineage) and the final lazy assignment
    (vec_id, qv, cell) against those FINAL centroids."""
    rows = _cents_rows(seed_cents)
    for _ in range(rounds):
        joined = data.withColumn("cell", _assign_cell_lit(rows))
        avgs = joined.groupBy("cell").agg(
            *[F.avg(F.col("qv")[i]).alias(f"c{i}") for i in range(EMB_DIM)])
        rows = _cents_rows(avgs.select(
            "cell", F.array(*[f"c{i}" for i in range(EMB_DIM)]).alias("cv")))
    cents = spark.createDataFrame(rows, "cell long, cv array<double>")
    assign = data.withColumn("cell", _assign_cell_lit(rows))
    return cents, assign


@register(
    "ann_ivf_kmeans",
    sql=f"""
    WITH e AS (SELECT vec_id, {QUANT_D} AS qv FROM embeddings),
    data AS (SELECT vec_id, qv FROM e WHERE vec_id >= 3),
    cent0 AS (
      SELECT vec_id - 3 AS cell, list_transform(qv, x -> CAST(x AS DOUBLE)) AS cv
      FROM e WHERE vec_id >= 3 AND vec_id < {3 + K_IVF}),
    {_kmeans_sql_iter(0)},
    {_kmeans_sql_iter(1)},
    {_kmeans_sql_assign(2)},
    q AS (
      SELECT vec_id AS query_id, qv,
             (SELECT {NORM_D} FROM (SELECT qv AS q) x) AS na
      FROM e WHERE vec_id < 3),
    probe AS (
      SELECT query_id, cell FROM (
        SELECT d.query_id, c.cell,
               ROW_NUMBER() OVER (PARTITION BY d.query_id
                 ORDER BY {_CDOT_D} / {_CNRM_D} DESC, c.cell ASC) AS rn
        FROM (SELECT query_id, qv FROM q) d CROSS JOIN cent2 c) WHERE rn <= 2),
    scored AS (
      SELECT q.query_id, a.cell, d.vec_id,
             CAST(list_sum(list_transform(range(1, 65),
                  i -> q.qv[i] * d.qv[i])) AS DOUBLE)
               / (sqrt(CAST(q.na AS DOUBLE))
                  * sqrt(CAST((SELECT {NORM_D} FROM (SELECT d.qv AS q) x) AS DOUBLE)))
               AS cos_sim
      FROM q JOIN probe p ON p.query_id = q.query_id
      JOIN assign2 a ON a.cell = p.cell
      JOIN data d ON d.vec_id = a.vec_id)
    SELECT query_id, rank, vec_id, cell, cos_sim FROM (
      SELECT query_id, vec_id, cell, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM scored) WHERE rank <= 5
    """,
    doc="IVF-ANN with LEARNED centroids: deterministic k-means (seed = the "
        f"{K_IVF} lowest corpus vec_ids, 2 unrolled Lloyd iterations — "
        "assign via broadcast cross join + map-side max_by argmax "
        "(shuffles n rows, not n·K), means via per-dimension avg "
        "aggregates over the intact array (no posexplode)), then probe "
        "the 2 nearest learned cells per query and exact-cosine top-5 "
        "inside them.  Replaces ann_ivf_probe's label-as-centroid "
        "shortcut with the production construction; search cost still "
        "scales with the probed fraction, training is O(iters * K * n) "
        "map-side with only n-row exchanges",
)
def ann_ivf_kmeans(spark, sf_dir):
    e = (t(spark, sf_dir, "embeddings")
         .select("vec_id", F.expr(QUANT_S).alias("qv")))
    data = e.filter(F.col("vec_id") >= 3)
    data = _persist(data)
    seeds = (e.filter((F.col("vec_id") >= 3) & (F.col("vec_id") < 3 + K_IVF))
             .select((F.col("vec_id") - 3).alias("cell"),
                     F.expr("transform(qv, x -> CAST(x AS DOUBLE))").alias("cv")))
    # Driver-collected literal-centroid Lloyd (VERDICT r4 item 6): K=8
    # is far under LIT_CENTS_MAX, so each round is a zero-shuffle argmax
    # projection + per-cell exact int64 avgs (map-side partials; the one
    # exchange carries K·64 sums per map partition) + a K-row collect —
    # the crossJoin form's n-row assignment exchange and per-round
    # materialization barrier are both gone.  The FINAL assignment is
    # against the FINAL centroids (the probe ranks cells by cent2
    # geometry, so membership must use the same centroids) and stays
    # lazy: its sole consumer is the scorer.
    cents, assign_last = _lloyd_lit(spark, data, seeds, rounds=2)
    q = (e.filter(F.col("vec_id") < 3)
         .select(F.col("vec_id").alias("query_id"), F.col("qv").alias("qa"))
         .withColumn("na", F.expr(
             "aggregate(zip_with(qa, qa, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")))
    wp = W.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("cell"))
    probe = (q.select("query_id", F.col("qa").alias("qv"))
             .crossJoin(F.broadcast(cents))
             .withColumn("ccos", F.expr(f"{_CDOT_S} / {_CNRM_S}"))
             .withColumn("rn", F.row_number().over(wp))
             .filter(F.col("rn") <= 2).select("query_id", "cell"))
    cand = (assign_last
            .withColumnRenamed("qv", "qb")
            .withColumn("nb", F.expr(
                "aggregate(zip_with(qb, qb, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")))
    scored = (
        cand.join(F.broadcast(probe), "cell")
        .join(F.broadcast(q), "query_id")
        .withColumn("dot", F.expr(DOT_S))
        .withColumn("cos_sim", F.expr(COS))
        .select("query_id", "vec_id", "cell", "cos_sim")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("query_id", "rank", "vec_id", "cell", "cos_sim"))


@register(
    "dedup_embedding_cosine",
    sql=f"""
    WITH base AS (
      SELECT vec_id, {QUANT_D} AS qv FROM embeddings
      UNION ALL
      SELECT vec_id + 100000 AS vec_id,
             list_transform(range(1, 65),
               i -> CASE WHEN i <= 8
                    THEN CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000 * 0.9)
                              AS BIGINT)
                    ELSE CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT)
                    END) AS qv
      FROM embeddings WHERE vec_id % 4 = 0),
    b AS (
      SELECT vec_id, qv, {_bands_array_d('qv', PPB_DEDUP)} AS bands,
             (SELECT {NORM_D} FROM (SELECT qv AS q) x) AS nrm
      FROM base),
    ex AS (SELECT vec_id, i AS band_idx, bands[i] AS bucket
           FROM b, unnest(range(1, {N_EMB_BANDS + 1})) AS u(i)),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, y.vec_id AS vec_b
      FROM ex a JOIN ex y
        ON a.band_idx = y.band_idx AND a.bucket = y.bucket
       AND a.vec_id < y.vec_id)
    SELECT vec_a, vec_b, cos_sim FROM (
      SELECT c.vec_a, c.vec_b,
             CAST(list_sum(list_transform(range(1, 65),
                  i -> ba.qv[i] * bb.qv[i])) AS DOUBLE)
               / (sqrt(CAST(ba.nrm AS DOUBLE)) * sqrt(CAST(bb.nrm AS DOUBLE))) AS cos_sim
      FROM cand c JOIN b ba ON ba.vec_id = c.vec_a JOIN b bb ON bb.vec_id = c.vec_b)
    WHERE cos_sim >= 0.98
    """,
    doc="embedding-cosine near-dup: banded sign-LSH blocking (4 bands x 8 "
        "md5-seeded hyperplanes = 256 buckets per band, OR across bands for "
        "recall) then exact quantized cosine >= 0.98 inside blocks; working "
        "set = embeddings ∪ slightly-perturbed copies (first 8 dims × 0.9) "
        "of vec_id%%4==0.  Bucket count scales 2^PPB_DEDUP — grow it with "
        "corpus size so intra-bucket pair counts stay linear",
)
def dedup_embedding_cosine(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    perturbed = F.expr(
        "transform(sequence(1, 64), i -> CASE WHEN i <= 8 "
        "THEN CAST(floor(CAST(element_at(embedding, i) AS DOUBLE) * 10000 * 0.9) AS BIGINT) "
        "ELSE CAST(floor(CAST(element_at(embedding, i) AS DOUBLE) * 10000) AS BIGINT) END)")
    base = (
        e.select("vec_id", F.expr(QUANT_S).alias("qv"))
        .unionByName(
            e.filter(F.col("vec_id") % 4 == 0)
            .select((F.col("vec_id") + 100000).alias("vec_id"),
                    perturbed.alias("qv")))
    )
    b = (base.withColumn("bands", _bands_array_s("qv", PPB_DEDUP))
         .withColumn("nrm", F.expr(
             "aggregate(zip_with(qv, qv, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")))
    b = _persist(b)   # referenced 3x: band explode + both verify re-joins
    cand, _dropped = emb_band_candidates(b)
    # _dropped is provably empty at sf geometry (cap 4096 >> any fixture
    # bucket), so the oracle sees identical pairs; a production caller uses
    # emb_band_candidates directly and sinks the drop report to metrics.
    va = b.select(F.col("vec_id").alias("vec_a"), F.col("qv").alias("qa"),
                  F.col("nrm").alias("na"))
    vb = b.select(F.col("vec_id").alias("vec_b"), F.col("qv").alias("qb"),
                  F.col("nrm").alias("nb"))
    return (
        cand.join(va, "vec_a").join(vb, "vec_b")
        .withColumn("dot", F.expr(DOT_S))
        .withColumn("cos_sim", F.expr(COS))
        .filter(F.col("cos_sim") >= 0.98)
        .select("vec_a", "vec_b", "cos_sim")
    )


@register(
    "dedup_semantic",
    sql=f"""
    WITH e AS (SELECT vec_id, {QUANT_D} AS qv FROM embeddings),
    data AS (
      SELECT vec_id, qv FROM e
      UNION ALL
      SELECT vec_id + 100000 AS vec_id,
             list_transform(range(1, 65),
               i -> CASE WHEN i <= 4
                    THEN CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000 * 0.95)
                              AS BIGINT)
                    ELSE CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT)
                    END) AS qv
      FROM embeddings WHERE vec_id % 5 = 0),
    cent0 AS (
      SELECT vec_id AS cell, list_transform(qv, x -> CAST(x AS DOUBLE)) AS cv
      FROM e WHERE vec_id < {K_IVF}),
    {_kmeans_sql_iter(0)},
    {_kmeans_sql_assign(1)},
    m AS (
      SELECT a.cell, d.vec_id, d.qv,
             (SELECT {NORM_D} FROM (SELECT d.qv AS q) x) AS nrm
      FROM assign1 a JOIN data d ON d.vec_id = a.vec_id),
    pairs AS (
      SELECT a.cell, a.vec_id AS vec_a, y.vec_id AS vec_b,
             CAST(list_sum(list_transform(range(1, 65),
                  i -> a.qv[i] * y.qv[i])) AS DOUBLE)
               / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(y.nrm AS DOUBLE)))
               AS cos_sim
      FROM m a JOIN m y ON a.cell = y.cell AND a.vec_id < y.vec_id)
    SELECT cell, vec_b AS pruned, MAX(cos_sim) AS max_sim
    FROM pairs WHERE cos_sim >= 0.98
    GROUP BY cell, vec_b
    """,
    doc="SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540): "
        f"cluster embeddings with deterministic k-means (seed = the {K_IVF} "
        "lowest vec_ids, 1 Lloyd iteration via the shared map-side max_by "
        "assignment — n-row exchanges only), then prune WITHIN each cluster: "
        "any pair with exact quantized cosine >= 0.98 drops the higher "
        "vec_id (keep-first representative).  Working set = embeddings ∪ "
        "slightly-perturbed copies (first 4 dims x 0.95) of vec_id%5==0.  "
        "Unlike dedup_embedding_cosine's LSH banding, blocking here is the "
        "LEARNED cluster structure, so near-dups that straddle an LSH "
        "bucket boundary still meet.  Scale rule: K grows ~ n / "
        "target_cell_size (the paper's regime) so intra-cell pair counts "
        "stay linear — same derivation seam as emb_lsh_geometry; the "
        "registry pins K at the sf default because the DuckDB oracle is a "
        "static string.  One exchange by cluster id carries the vectors; "
        "the pairing is a per-cell self-join inside that partitioning",
)
def dedup_semantic(spark, sf_dir):
    e = (t(spark, sf_dir, "embeddings")
         .select("vec_id", F.expr(QUANT_S).alias("qv"), "embedding"))
    perturbed = F.expr(
        "transform(sequence(1, 64), i -> CASE WHEN i <= 4 "
        "THEN CAST(floor(CAST(element_at(embedding, i) AS DOUBLE) * 10000 * 0.95) AS BIGINT) "
        "ELSE CAST(floor(CAST(element_at(embedding, i) AS DOUBLE) * 10000) AS BIGINT) END)")
    data = (
        e.select("vec_id", "qv")
        .unionByName(
            e.filter(F.col("vec_id") % 5 == 0)
            .select((F.col("vec_id") + 100000).alias("vec_id"),
                    perturbed.alias("qv")))
    )
    data = _persist(data)  # read per Lloyd round + final assignment
    seeds = (e.filter(F.col("vec_id") < K_IVF)
             .select(F.col("vec_id").alias("cell"),
                     F.expr("transform(qv, x -> CAST(x AS DOUBLE))").alias("cv")))
    # 1 Lloyd iteration, driver-collected literal centroids (zero-shuffle
    # assignment; exact int64 avgs — order-independent, oracle-stable;
    # see _lloyd_lit / ann_ivf_kmeans).  The final assignment is lazy:
    # its sole consumer is semantic_cell_pairs, whose occupancy split
    # persists the cell-partitioned form both self-join sides read from.
    _cents, assigned = _lloyd_lit(spark, data, seeds, rounds=1)
    m = assigned.withColumn("nrm", F.expr(
        "aggregate(zip_with(qv, qv, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
    pairs, _dropped = semantic_cell_pairs(m)
    # _dropped is provably empty at sf geometry (cap 4096 >> any fixture
    # cell), so the DuckDB oracle sees identical pairs; a production
    # caller uses semantic_cell_pairs directly and sinks the report.
    return (pairs.groupBy("cell", F.col("vec_b").alias("pruned"))
            .agg(F.max("cos_sim").alias("max_sim")))


def estimate_parquet_rows(spark, path: str) -> int:
    """Row count of a parquet source from file metadata: Spark compiles a
    bare count() over parquet to a metadata-only scan (no column data is
    decoded), so this is footer-cheap at any corpus size."""
    return spark.read.parquet(path).count()


def dedup_embeddings_run(spark, input_path: str, output_dir: str,
                         threshold_pct: int = 98, iterations: int = 20,
                         cap: int = EMB_BUCKET_CAP,
                         skew_safe: bool = False,
                         arrow_sig: bool = True) -> dict:
    """Production embedding near-dup entry point (``cli.py
    --dedup-embeddings``): the derived-geometry seam exercised end to end.

    Unlike the registry query (which pins the sf geometry because its
    DuckDB oracle is a static string), this path estimates the corpus size
    from the parquet footers, derives planes-per-band via
    ``emb_lsh_geometry`` so bucket space grows with n, then runs banding →
    hot-bucket-capped candidate generation → exact quantized-cosine verify
    → min-label components → keep-canonical decisions.  Sinks (pairs,
    decisions, the hot-bucket drop report) land under ``output_dir`` and
    the drop count is surfaced in the returned metrics (no-silent-caps).

    ``iterations`` bounds min-label propagation (``--cc-iterations``); the
    run iterates TO FIXPOINT inside that budget and the metrics carry
    ``cc_rounds`` / ``cc_converged`` / ``cc_residual`` — a dup-chain whose
    diameter exceeds the budget is DETECTED and surfaced, never silently
    split (VERDICT r4 item 1).
    """
    import time
    t0 = time.perf_counter()
    e = spark.read.parquet(input_path)
    n_est = estimate_parquet_rows(spark, input_path)
    ppb = emb_lsh_geometry(n_est)
    q = e.select("vec_id", F.expr(QUANT_S).alias("qv"))
    if arrow_sig:
        # one Arrow pass computes all 4*ppb plane dots as a matmul plus
        # the self-norm — bit-identical to the SQL folds (integer dots
        # < 2^53; see emb_bands_nrm_udf) but not interpreter-bound
        bn = emb_bands_nrm_udf(ppb)(F.col("qv"))
        b = q.select("vec_id", "qv", bn.getField("bands").alias("bands"),
                     bn.getField("nrm").alias("nrm"))
    else:
        b = (q.withColumn("bands", _bands_array_s("qv", ppb))
             .withColumn("nrm", F.expr(
                 "aggregate(zip_with(qv, qv, (x, y) -> x * y), "
                 "0L, (acc, v) -> acc + v)")))
    b = _persist(b)   # band explode + both verify re-joins
    cand, dropped = emb_band_candidates(b, cap, skew_safe)
    va = b.select(F.col("vec_id").alias("vec_a"), F.col("qv").alias("qa"),
                  F.col("nrm").alias("na"))
    vb = b.select(F.col("vec_id").alias("vec_b"), F.col("qv").alias("qb"),
                  F.col("nrm").alias("nb"))
    dot_col = (emb_dot_udf()(F.col("qa"), F.col("qb")) if arrow_sig
               else F.expr(DOT_S))
    pairs = (cand.join(va, "vec_a").join(vb, "vec_b")
             .withColumn("dot", dot_col)
             .withColumn("cos_sim", F.expr(COS))
             .filter(F.col("cos_sim") * 100 >= threshold_pct)
             .select("vec_a", "vec_b", "cos_sim"))
    pairs = _persist(pairs)
    # min-label connected components over the pair graph (shared with
    # dedup_components), then drop every non-canonical member
    edges = (pairs.select(F.col("vec_a").alias("src"),
                          F.col("vec_b").alias("dst"))
             .unionByName(pairs.select(F.col("vec_b").alias("src"),
                                       F.col("vec_a").alias("dst"))))
    labels, cc = min_label_components_fixpoint(edges, max_rounds=iterations)
    decisions = labels.select(F.col("node").alias("vec_id"),
                              F.col("label").alias("component"),
                              (F.col("label") == F.col("node"))
                              .alias("is_canonical"))
    pairs.write.mode("overwrite").parquet(f"{output_dir}/pairs")
    decisions.write.mode("overwrite").parquet(f"{output_dir}/decisions")
    dropped.write.mode("overwrite").parquet(f"{output_dir}/dropped_buckets")
    out_pairs = spark.read.parquet(f"{output_dir}/pairs")
    out_dec = spark.read.parquet(f"{output_dir}/decisions")
    n_dropped = spark.read.parquet(f"{output_dir}/dropped_buckets").count()
    return {
        "mode": "dedup_embeddings", "n_est": n_est, "ppb": ppb,
        "bands": N_EMB_BANDS, "bucket_cap": cap,
        "sig_engine": "arrow" if arrow_sig else "sql",
        "pairs": out_pairs.count(),
        "non_canonical": out_dec.filter(~F.col("is_canonical")).count(),
        "dropped_hot_buckets": n_dropped, "skew_safe": skew_safe, **cc,
        "wall_s": round(time.perf_counter() - t0, 3),
    }


def dedup_texts_run(spark, input_path: str, output_dir: str,
                    hamming_max: int = 3, iterations: int = 20,
                    cap: int = EMB_BUCKET_CAP,
                    skew_safe: bool = False,
                    arrow_sig: bool = True) -> dict:
    """Production simhash near-dup entry point (``cli.py --dedup-texts``):
    the `simhash_band_bits` seam exercised end to end over a (doc_id,
    text) parquet.

    Corpus size is estimated from the parquet footers and the band width
    DERIVED from it, so band space outgrows the corpus (expected random
    collisions per band n²/2^bits <= n).  Pipeline: 4-band pigeonhole
    simhash (`_simhash_bands_from_text_s`) → hot-band-capped candidate
    equi-join → exact hamming <= ``hamming_max`` verify over the full
    4·bits signature (sum of per-band xor popcounts — bands partition
    the signature) → fixpoint min-label components (convergence surfaced
    in metrics) → keep-canonical decisions.  Sinks land under
    ``output_dir``; the drop report count is surfaced in the returned
    metrics (no-silent-caps).

    ``hamming_max`` is bounded by the banding recall guarantee: 4-band
    pigeonhole only promises a band collision for pairs with hamming
    <= 3 (bands - 1).  A larger threshold would pass the exact verify
    but NEVER become a candidate when its flipped bits straddle all 4
    bands — silent recall loss — so it raises instead (ADVICE r4 #2)."""
    import time
    if hamming_max > SIMHASH_BANDS - 1:
        raise ValueError(
            f"--hamming-max {hamming_max} exceeds the {SIMHASH_BANDS}-band "
            f"pigeonhole recall guarantee (max {SIMHASH_BANDS - 1}): pairs "
            "whose flipped bits straddle all bands would silently never "
            "become candidates.  Use more bands or a lower threshold.")
    t0 = time.perf_counter()
    n_est = estimate_parquet_rows(spark, input_path)
    bits = simhash_band_bits(n_est)
    d = spark.read.parquet(input_path).select("doc_id", "text")
    # Arrow-batched numpy signature by default: the SQL form's HOF chain
    # is CodegenFallback (interpreted row-at-a-time, ~19 core-ms/row
    # measured at 2.4M rows) while the batch replica is bit-identical
    # and ~10-40x faster — see _simhash_bands_batch.
    band_col = (simhash_bands_udf(bits)(F.col("text")) if arrow_sig
                else F.expr(_simhash_bands_from_text_s(bits)))
    sigs = (d.filter(F.expr(f"size({WORDS_S}) >= 1"))
            .select("doc_id", band_col.alias("bands")))
    sigs = _persist(sigs)   # band explode + both verify legs
    ex = sigs.select(
        "doc_id", F.posexplode("bands").alias("band_idx", "band_bits"))
    kept, dropped = _occupancy_capped(ex, ["band_idx", "band_bits"],
                                      cap, skew_safe)
    a, b = kept.alias("a"), kept.alias("b")
    cand = (a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
                   & (F.col("a.band_bits") == F.col("b.band_bits"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())
    sa = sigs.select(F.col("doc_id").alias("doc_a"),
                     F.col("bands").alias("bands_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"),
                     F.col("bands").alias("bands_b"))
    ham = F.expr("aggregate(zip_with(bands_a, bands_b, "
                 "(x, y) -> bit_count(x ^ y)), 0, (acc, v) -> acc + v)")
    pairs = (cand.join(sa, "doc_a").join(sb, "doc_b")
             .withColumn("hamming", ham.cast("int"))
             .filter(F.col("hamming") <= hamming_max)
             .select("doc_a", "doc_b", "hamming"))
    pairs = _persist(pairs, fresh=False)
    edges = (pairs.select(F.col("doc_a").alias("src"),
                          F.col("doc_b").alias("dst"))
             .unionByName(pairs.select(F.col("doc_b").alias("src"),
                                       F.col("doc_a").alias("dst"))))
    labels, cc = min_label_components_fixpoint(edges, max_rounds=iterations)
    decisions = labels.select(F.col("node").alias("doc_id"),
                              F.col("label").alias("component"),
                              (F.col("label") == F.col("node"))
                              .alias("is_canonical"))
    pairs.write.mode("overwrite").parquet(f"{output_dir}/pairs")
    decisions.write.mode("overwrite").parquet(f"{output_dir}/decisions")
    dropped.write.mode("overwrite").parquet(f"{output_dir}/dropped_bands")
    out_pairs = spark.read.parquet(f"{output_dir}/pairs")
    out_dec = spark.read.parquet(f"{output_dir}/decisions")
    n_dropped = spark.read.parquet(f"{output_dir}/dropped_bands").count()
    return {
        "mode": "dedup_texts", "n_est": n_est, "band_bits": bits,
        "signature_bits": 4 * bits, "hamming_max": hamming_max,
        "sig_engine": "arrow" if arrow_sig else "sql",
        "band_cap": cap,
        "pairs": out_pairs.count(),
        "non_canonical": out_dec.filter(~F.col("is_canonical")).count(),
        "dropped_hot_bands": n_dropped, "skew_safe": skew_safe, **cc,
        "wall_s": round(time.perf_counter() - t0, 3),
    }


def semantic_cell_pairs(m, cap: int = EMB_BUCKET_CAP,
                        threshold: float = 0.98,
                        skew_safe: bool = False,
                        arrow_dot: bool = False):
    """Intra-cell >=``threshold`` cosine pairing over assigned rows ``m`` =
    (cell, vec_id, qv, nrm), hot-cell capped.  A dense embedding mode —
    boilerplate pages are common in web data — can land millions of
    vectors in ONE k-means cell, going quadratic in the self-join below
    no matter what K is; cells over the cap are excluded from pairing and
    RETURNED as (cell, bsz) (the no-silent-caps rule: callers surface the
    report).  Same guard as the sibling LSH path's _bucket_capped.

    ``arrow_dot``: verify with the Arrow-batched exact int64 dot
    (`emb_dot_udf` — bit-identical, see there) instead of the
    interpreted DOT_S fold; the production path sets it, the registry
    query keeps the SQL form so its static plan/oracle stay pinned."""
    kept, dropped = _occupancy_capped(m, ["cell"], cap, skew_safe)
    a = kept.select("cell", F.col("vec_id").alias("vec_a"),
                    F.col("qv").alias("qa"), F.col("nrm").alias("na"))
    y = kept.select("cell", F.col("vec_id").alias("vec_b"),
                    F.col("qv").alias("qb"), F.col("nrm").alias("nb"))
    dot_col = (emb_dot_udf()(F.col("qa"), F.col("qb")) if arrow_dot
               else F.expr(DOT_S))
    pairs = (a.join(y, "cell")
             .filter(F.col("vec_a") < F.col("vec_b"))
             .withColumn("dot", dot_col)
             .withColumn("cos_sim", F.expr(COS))
             .filter(F.col("cos_sim") >= threshold))
    return pairs, dropped


def dedup_semantic_run(spark, input_path: str, output_dir: str,
                       threshold_pct: int = 98, lloyd_iters: int = 1,
                       iterations: int = 20, target_cell_size: int = 1024,
                       cap: int = EMB_BUCKET_CAP,
                       skew_safe: bool = False,
                       arrow_sig: bool = True) -> dict:
    """Production SemDeDup entry point (``cli.py --dedup-semantic``,
    VERDICT r4 item 2): the ``kmeans_k`` derivation seam exercised end to
    end over a (vec_id, embedding array<float/double>) parquet.

    The registry's ``dedup_semantic`` pins K at the sf default because
    its DuckDB oracle is a static string; at real corpus sizes K=8 puts
    every cell over the hot-cell cap and the guard would drop the whole
    corpus.  Here K is DERIVED from the parquet-footer row estimate
    (K ~ n / target_cell_size, broadcast-capped — see ``kmeans_k``), so
    expected cell occupancy stays ~target_cell_size regardless of n.

    Pipeline: footer n → derived K → deterministic seeds (the K lowest
    vec_ids) → ``lloyd_iters`` Lloyd rounds (broadcast crossJoin +
    map-side max_by assignment carrying the vector, exact int64 per-dim
    avg means) → final assignment against the FINAL centroids →
    hot-cell-capped intra-cell exact-cosine pairing → fixpoint min-label
    components (convergence surfaced) → keep-canonical decisions.  Sinks
    (pairs, decisions, dropped_cells) land under ``output_dir``; derived
    K, expected occupancy, the drop count and the component convergence
    metrics are all returned (no-silent-caps)."""
    import time
    t0 = time.perf_counter()
    n_est = estimate_parquet_rows(spark, input_path)
    k = kmeans_k(n_est, target_cell_size)
    data = (spark.read.parquet(input_path)
            .select("vec_id", F.expr(QUANT_S).alias("qv")))
    data = _persist(data)   # read per Lloyd round + final assignment
    # deterministic seeds: the K lowest vec_ids (TakeOrdered — no full
    # sort); cell id = the seed's vec_id, as in the registry query
    seeds = (data.orderBy("vec_id").limit(k)
             .select(F.col("vec_id").alias("cell"),
                     F.expr("transform(qv, x -> CAST(x AS DOUBLE))")
                     .alias("cv")))
    if arrow_sig:
        # Arrow argmax covers any derived K under the broadcast budget
        # in one branch (the literal/crossJoin split below only matters
        # for the SQL engines) — see kmeans_assign_udf for the parity
        # contract
        _cents, assigned = _lloyd_arrow(spark, data, seeds, lloyd_iters)
    elif k <= LIT_CENTS_MAX:
        # small derived K: driver-collected literal centroids, zero-
        # shuffle assignment per round (see _lloyd_lit)
        _cents, assigned = _lloyd_lit(spark, data, seeds, lloyd_iters)
    else:
        # large derived K: broadcast-crossJoin assignment (map-side
        # max_by carrying the vector, one n-row exchange per round) —
        # a K x 64-double literal plan stops being worth building here
        cents = seeds
        for _ in range(lloyd_iters):
            joined = _assign_nearest(data, cents, carry_vec=True)
            avgs = joined.groupBy("cell").agg(
                *[F.avg(F.col("qv")[i]).alias(f"c{i}")
                  for i in range(EMB_DIM)])
            cents = avgs.select(
                "cell",
                F.array(*[f"c{i}" for i in range(EMB_DIM)]).alias("cv"))
        assigned = _assign_nearest(data, cents, materialize=False,
                                   carry_vec=True)
    nrm_col = (emb_dot_udf()(F.col("qv"), F.col("qv")) if arrow_sig
               else F.expr("aggregate(zip_with(qv, qv, (x, y) -> x * y), "
                           "0L, (acc, v) -> acc + v)"))
    m = assigned.withColumn("nrm", nrm_col)
    pairs, dropped = semantic_cell_pairs(m, cap, threshold_pct / 100.0,
                                         skew_safe, arrow_dot=arrow_sig)
    pairs = _persist(pairs.select("vec_a", "vec_b", "cos_sim"), fresh=False)
    edges = (pairs.select(F.col("vec_a").alias("src"),
                          F.col("vec_b").alias("dst"))
             .unionByName(pairs.select(F.col("vec_b").alias("src"),
                                       F.col("vec_a").alias("dst"))))
    labels, cc = min_label_components_fixpoint(edges, max_rounds=iterations)
    decisions = labels.select(F.col("node").alias("vec_id"),
                              F.col("label").alias("component"),
                              (F.col("label") == F.col("node"))
                              .alias("is_canonical"))
    pairs.write.mode("overwrite").parquet(f"{output_dir}/pairs")
    decisions.write.mode("overwrite").parquet(f"{output_dir}/decisions")
    dropped.write.mode("overwrite").parquet(f"{output_dir}/dropped_cells")
    out_pairs = spark.read.parquet(f"{output_dir}/pairs")
    out_dec = spark.read.parquet(f"{output_dir}/decisions")
    n_dropped = spark.read.parquet(f"{output_dir}/dropped_cells").count()
    return {
        "mode": "dedup_semantic", "n_est": n_est, "k": k,
        "target_cell_size": target_cell_size,
        "expected_occupancy": (round(n_est / k, 1) if k else None),
        "lloyd_iters": lloyd_iters, "cell_cap": cap,
        "threshold_pct": threshold_pct,
        "sig_engine": "arrow" if arrow_sig else "sql",
        "pairs": out_pairs.count(),
        "non_canonical": out_dec.filter(~F.col("is_canonical")).count(),
        "dropped_hot_cells": n_dropped, "skew_safe": skew_safe, **cc,
        "wall_s": round(time.perf_counter() - t0, 3),
    }


# ---------------------------------------------------------------------------
# Text analysis: language-ID, quality score, token counts, fingerprint
# ---------------------------------------------------------------------------

STOPS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "la", "y", "es", "un", "los"),
    "fr": ("le", "et", "est", "une", "les", "dans"),
}


def _hits(lang: str, dialect: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPS[lang])
    if dialect == "spark":
        return f"size(filter(words, x -> x IN ({lst})))"
    return f"len(list_filter(words, x -> x IN ({lst})))"


@register(
    "text_lang_id",
    sql=f"""
    WITH w AS (SELECT doc_id, lang, {WORDS_D} AS words FROM documents),
    h AS (SELECT doc_id, lang, len(words) AS n_words,
                 {_hits('en', 'duck')} AS en_hits, {_hits('de', 'duck')} AS de_hits,
                 {_hits('es', 'duck')} AS es_hits, {_hits('fr', 'duck')} AS fr_hits
          FROM w)
    SELECT doc_id, lang, n_words, en_hits, de_hits, es_hits, fr_hits,
           CASE WHEN en_hits >= de_hits AND en_hits >= es_hits
                     AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
                WHEN de_hits >= es_hits AND de_hits >= fr_hits
                     AND de_hits > 0 THEN 'de'
                WHEN es_hits >= fr_hits AND es_hits > 0 THEN 'es'
                WHEN fr_hits > 0 THEN 'fr'
                ELSE 'unknown' END AS pred_lang
    FROM h
    """,
    doc="language-ID heuristic: per-language stopword occurrence counts with "
        "a deterministic argmax ladder; narrow per-row compute, no shuffle",
)
def text_lang_id(spark, sf_dir):
    d = (t(spark, sf_dir, "documents")
         .select("doc_id", "lang", F.expr(WORDS_S).alias("words")))
    h = d.select(
        "doc_id", "lang", F.size("words").alias("n_words"),
        F.expr(_hits("en", "spark")).alias("en_hits"),
        F.expr(_hits("de", "spark")).alias("de_hits"),
        F.expr(_hits("es", "spark")).alias("es_hits"),
        F.expr(_hits("fr", "spark")).alias("fr_hits"),
    )
    en, de, es, fr = [F.col(f"{x}_hits") for x in ("en", "de", "es", "fr")]
    pred = (F.when((en >= de) & (en >= es) & (en >= fr) & (en > 0), "en")
            .when((de >= es) & (de >= fr) & (de > 0), "de")
            .when((es >= fr) & (es > 0), "es")
            .when(fr > 0, "fr")
            .otherwise("unknown"))
    return h.withColumn("pred_lang", pred)


@register(
    "text_quality_score",
    sql=f"""
    WITH w AS (SELECT doc_id, text, {WORDS_D} AS words FROM documents)
    SELECT doc_id, n_chars, n_words, n_stop, n_punct,
           CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) AS stop_ratio,
           CAST(n_alpha AS DOUBLE) / CAST(n_chars AS DOUBLE) AS alpha_ratio,
           (n_words >= 5 AND n_chars >= 40
            AND n_stop * 100 >= 2 * n_words
            AND n_punct * 10 <= n_words) AS is_quality
    FROM (
      SELECT doc_id, length(text) AS n_chars, len(words) AS n_words,
             {_hits('en', 'duck')} AS n_stop,
             length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
             length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha
      FROM w) WHERE n_words > 0 AND n_chars > 0
    """,
    doc="quality scoring: length / stopword-ratio / punctuation-density / "
        "alpha-ratio features with integer cross-multiplied gates",
)
def text_quality_score(spark, sf_dir):
    d = (t(spark, sf_dir, "documents")
         .select("doc_id", "text", F.expr(WORDS_S).alias("words")))
    feats = d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size("words").alias("n_words"),
        F.expr(_hits("en", "spark")).alias("n_stop"),
        F.length(F.regexp_replace("text", r"[^.,;:!?]", "")).alias("n_punct"),
        F.length(F.regexp_replace("text", r"[^a-zA-Z]", "")).alias("n_alpha"),
    ).filter((F.col("n_words") > 0) & (F.col("n_chars") > 0))
    return feats.select(
        "doc_id", "n_chars", "n_words", "n_stop", "n_punct",
        (F.col("n_stop").cast("double") / F.col("n_words").cast("double")
         ).alias("stop_ratio"),
        (F.col("n_alpha").cast("double") / F.col("n_chars").cast("double")
         ).alias("alpha_ratio"),
        ((F.col("n_words") >= 5) & (F.col("n_chars") >= 40)
         & (F.col("n_stop") * 100 >= 2 * F.col("n_words"))
         & (F.col("n_punct") * 10 <= F.col("n_words"))).alias("is_quality"),
    )


# PII patterns shared verbatim by both engines (Java regex and RE2 agree on
# this subset: char classes, bounded reps, alternation — no lookaround)
PII_EMAIL = r"[A-Za-z0-9._]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PII_URL = r"https?://[A-Za-z0-9./_-]+"
PII_PHONE = r"[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]"

# engineered PII working set: the driver vocabulary contains no PII, so
# deterministic contact strings are appended in-engine for some docs
PII_TEXT_S = (
    "concat(text,"
    " CASE WHEN doc_id % 11 = 0 THEN concat(' mail user', doc_id, '@example.com') ELSE '' END,"
    " CASE WHEN doc_id % 13 = 0 THEN concat(' see https://example.org/d/', doc_id) ELSE '' END,"
    " CASE WHEN doc_id % 17 = 0 THEN ' call 555-123-4567' ELSE '' END)")
PII_TEXT_D = (
    "text ||"
    " (CASE WHEN doc_id % 11 = 0 THEN ' mail user' || doc_id || '@example.com' ELSE '' END) ||"
    " (CASE WHEN doc_id % 13 = 0 THEN ' see https://example.org/d/' || doc_id ELSE '' END) ||"
    " (CASE WHEN doc_id % 17 = 0 THEN ' call 555-123-4567' ELSE '' END)")


@register(
    "text_pii_redact",
    sql=f"""
    WITH p AS (SELECT doc_id, {PII_TEXT_D} AS ptext FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(ptext, '{PII_EMAIL}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(ptext, '{PII_URL}')) AS INT) AS n_urls,
           CAST(len(regexp_extract_all(ptext, '{PII_PHONE}')) AS INT) AS n_phones,
           length(regexp_replace(regexp_replace(regexp_replace(ptext,
                  '{PII_EMAIL}', '<EMAIL>', 'g'),
                  '{PII_URL}', '<URL>', 'g'),
                  '{PII_PHONE}', '<PHONE>', 'g')) AS redacted_chars,
           md5(regexp_replace(regexp_replace(regexp_replace(ptext,
                  '{PII_EMAIL}', '<EMAIL>', 'g'),
                  '{PII_URL}', '<URL>', 'g'),
                  '{PII_PHONE}', '<PHONE>', 'g')) AS redacted_md5
    FROM p
    """,
    doc="PII scan + redaction (training-data hygiene pass): email / URL / "
        "phone pattern counts and the md5 of the fully-redacted text, all "
        "per-row JVM regex — no shuffle, no UDF.  Patterns restricted to "
        "the Java-regex ∩ RE2 subset so the DuckDB oracle behaves "
        "identically; redaction correctness is pinned by hashing the "
        "redacted text itself.  Working set appends deterministic contact "
        "strings (driver vocab has no natural PII)",
)
def text_pii_redact(spark, sf_dir):
    p = (t(spark, sf_dir, "documents")
         .select("doc_id", F.expr(PII_TEXT_S).alias("ptext")))
    # F.lit keeps backslash-free patterns intact; regexp_replace in Spark
    # is global by default (DuckDB needs the explicit 'g' flag)
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("ptext", F.lit(PII_EMAIL), F.lit("<EMAIL>")),
            F.lit(PII_URL), F.lit("<URL>")),
        F.lit(PII_PHONE), F.lit("<PHONE>"))
    return p.select(
        "doc_id",
        F.regexp_count("ptext", F.lit(PII_EMAIL)).alias("n_emails"),
        F.regexp_count("ptext", F.lit(PII_URL)).alias("n_urls"),
        F.regexp_count("ptext", F.lit(PII_PHONE)).alias("n_phones"),
        F.length(red).alias("redacted_chars"),
        F.md5(red).alias("redacted_md5"),
    )


BPE_PAT = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


TOKEN_COUNT_SQL = f"""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_ws_tokens,
           len(regexp_extract_all(text, '{BPE_PAT}')) AS n_bpe_tokens,
           octet_length(encode(text)) AS n_bytes
    FROM documents
    """


def text_token_count(spark, sf_dir):
    """Token counting: whitespace tokens + BPE-ish regex tokens (alpha
    runs / digit runs / single punctuation) + utf8 byte length.  Registry
    leg of text_tokens_fingerprint."""
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"size({WORDS_S})").alias("n_ws_tokens"),
        # F.lit avoids SQL-literal backslash escaping (\s must reach the regex)
        F.regexp_count("text", F.lit(BPE_PAT)).alias("n_bpe_tokens"),
        F.octet_length("text").alias("n_bytes"),
    )


FINGERPRINT_SQL = f"""
    WITH w AS (SELECT doc_id, {WORDS_D} AS words FROM documents),
    kg AS (
      SELECT doc_id,
             list_transform(range(1, len(words) - 2),
               i -> md5(words[i] || ' ' || words[i+1] || ' '
                        || words[i+2] || ' ' || words[i+3])) AS kh
      FROM w WHERE len(words) >= 6),
    fp AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(kh) - 1),
               i -> least(kh[i], kh[i+1], kh[i+2]))) AS fps
      FROM kg)
    SELECT doc_id, len(fps) AS n_fps,
           list_min(fps) AS fp_min, list_max(fps) AS fp_max
    FROM fp
    """


def text_fingerprint(spark, sf_dir):
    """Document fingerprinting (winnowing): word-4-gram rolling md5
    hashes, min per sliding window of 3, distinct fingerprint set — the
    standard near-copy sketch; per-row compute only.  Registry leg of
    text_tokens_fingerprint."""
    kh = ("CASE WHEN size(words) >= 6 THEN "
          "transform(sequence(0, size(words) - 4), "
          "i -> md5(concat(words[i], ' ', words[i+1], ' ', words[i+2], ' ', words[i+3]))) "
          "ELSE array() END")
    fps = ("array_distinct(transform(sequence(0, size(kh) - 3), "
           "i -> least(kh[i], kh[i+1], kh[i+2])))")
    return (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.expr(WORDS_S).alias("words"))
        .filter(F.size("words") >= 6)
        .select("doc_id", F.expr(kh).alias("kh"))
        .select("doc_id", F.expr(fps).alias("fps"))
        .select("doc_id", F.size("fps").alias("n_fps"),
                F.array_min("fps").alias("fp_min"), F.array_max("fps").alias("fp_max"))
    )


@register(
    "text_tokens_fingerprint",
    sql=f"""
    WITH tc AS ({TOKEN_COUNT_SQL}), fp AS ({FINGERPRINT_SQL})
    SELECT tc.doc_id, tc.n_ws_tokens, tc.n_bpe_tokens, tc.n_bytes,
           CAST(fp.n_fps AS BIGINT) AS n_fps, fp.fp_min, fp.fp_max
    FROM tc LEFT JOIN fp ON fp.doc_id = tc.doc_id
    """,
    doc="combined oracle entry for the per-document text-accounting pair: "
        "text_token_count (whitespace + BPE-ish regex tokens + bytes) and "
        "text_fingerprint (winnowing sketch; LEFT JOIN — docs under 6 "
        "words have no fingerprint).  Same per-row plans joined on the "
        "shared doc_id grain so both stay inside the driver's 50-entry "
        "correctness file",
)
def text_tokens_fingerprint(spark, sf_dir):
    tc = text_token_count(spark, sf_dir)
    fp = (text_fingerprint(spark, sf_dir)
          .select("doc_id", F.col("n_fps").cast("bigint").alias("n_fps"),
                  "fp_min", "fp_max"))
    return tc.join(fp, "doc_id", "left")


# ---------------------------------------------------------------------------
# Multimodal: opaque binary columns + typed metadata (relational leg)
# ---------------------------------------------------------------------------

MEDIA_METADATA_SQL = """
    SELECT doc_id,
           'media://' || md5(text) AS media_ref,
           octet_length(encode(text)) AS n_bytes,
           1 + (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) % 4
             AS width_class,
           1 + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) % 3
             AS height_class
    FROM documents
    """


def media_metadata(spark, sf_dir):
    """Multimodal metadata projection: content-addressed media_ref + byte
    length + typed size classes derived from the blob digest; the binary
    decode itself is the Arrow-batched stub in operators/multimodal.py.
    Registry leg of multimodal_meta_features."""
    h = F.md5("text")
    nib = lambda i: (F.expr(f"instr('0123456789abcdef', substr(md5(text), {i}, 1))") - 1)
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("media://"), h).alias("media_ref"),
        F.octet_length("text").alias("n_bytes"),
        (1 + nib(1) % 4).alias("width_class"),
        (1 + nib(2) % 3).alias("height_class"),
    )


# ---------------------------------------------------------------------------
# Rows-only entries (non-SQL-expressible: Arrow-batched pandas stages)
# ---------------------------------------------------------------------------

def _sha_feature_sql(i: int) -> str:
    """DuckDB expression for fake-decode feature i: bytes 4i..4i+3 of
    sha256(kind|text) as a little-endian uint32, /2^32, rounded to float32
    (decode_fake's exact arithmetic — astype(float32) == CAST AS FLOAT,
    both round-to-nearest-even)."""
    def byte(j: int) -> str:
        n0 = f"(strpos('0123456789abcdef', substr(h, {2 * j + 1}, 1)) - 1)"
        n1 = f"(strpos('0123456789abcdef', substr(h, {2 * j + 2}, 1)) - 1)"
        return f"({n0} * 16 + {n1})"
    le = (f"({byte(4 * i)} + 256 * {byte(4 * i + 1)} + 65536 * {byte(4 * i + 2)}"
          f" + 16777216 * {byte(4 * i + 3)})")
    return f"CAST(CAST({le} AS DOUBLE) / 4294967296 AS FLOAT)"


_FEAT_SQ_SUM = " + ".join(
    f"CAST({_sha_feature_sql(i)} AS DOUBLE) * CAST({_sha_feature_sql(i)} AS DOUBLE)"
    for i in range(8))


MULTIMODAL_FEATURES_SQL = f"""
    WITH m AS (
      SELECT doc_id,
             'media://' || md5(text) AS media_ref,
             octet_length(encode(text)) AS n_bytes,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_kind,
             sha256(CASE WHEN doc_id % 3 = 0 THEN 'image'
                         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END
                    || '|' || text) AS h
      FROM documents)
    SELECT doc_id, media_ref, n_bytes, media_kind,
           sqrt({_FEAT_SQ_SUM}) AS feat_norm
    FROM m
    """


def multimodal_features(spark, sf_dir):
    """Multimodal decode plumbing: binary blob + kind → Arrow-batched
    feature extraction (operators/multimodal.py); decode stubbed
    deterministically (sha256-based fake), Spark plumbing real.  The fake
    is reproduced in DuckDB SQL (sha256 hex → 8 LE-uint32 float32
    features → sequential sum of squares) so even feat_norm is
    hash-checked cross-engine.  Registry leg of multimodal_meta_features."""
    from .operators.multimodal import documents_as_media, media_features
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return media_features(documents_as_media(docs)).drop("feat")


@register(
    "multimodal_meta_features",
    sql=f"""
    WITH mm AS ({MEDIA_METADATA_SQL}), mf AS ({MULTIMODAL_FEATURES_SQL})
    SELECT mm.doc_id, mm.media_ref, mm.n_bytes, mm.width_class,
           mm.height_class, mf.media_kind, mf.feat_norm
    FROM mm JOIN mf ON mf.doc_id = mm.doc_id
    """,
    doc="combined oracle entry for the multimodal metadata pair: "
        "media_metadata (content-addressed ref + typed size classes, pure "
        "relational) and multimodal_features (the Arrow-batched decode "
        "plumbing with the sha256 deterministic fake, feat_norm "
        "value-checked cross-engine).  Joined on the shared per-media "
        "doc_id grain so both stay inside the driver's 50-entry "
        "correctness file",
)
def multimodal_meta_features(spark, sf_dir):
    mm = media_metadata(spark, sf_dir)
    mf = (multimodal_features(spark, sf_dir)
          .select("doc_id", "media_kind", "feat_norm"))
    return mm.join(mf, "doc_id")


@register(
    "extract_pipeline",
    # The per-doc heuristic chain is not SQL-expressible, so the DuckDB
    # oracle is a PERSISTED GOLDEN: the pure-Python oracle's span output
    # over every driver documents row (regen: tests/gen_extract_golden.py),
    # keyed by (src_doc_id, md5(text)) because spans are a pure function of
    # that pair and doc_ids collide across scales with different texts.
    # Exact north-rule parity is additionally enforced by
    # tests/test_extract_spark.py against the same pure-Python oracle.
    sql="""
    SELECT g.doc_id, g.kind, g.text, g.media_ref, g.offset
    FROM read_parquet('/root/repo/tests/golden/extract_spans.parquet') g
    JOIN documents d
      ON d.doc_id = g.src_doc_id
     AND md5(COALESCE(d.text, '')) = g.text_md5
    """,
    doc="flagship: full interleaved-document extraction (SURVEY.md §2.2-§2.10 "
        "chain inside one Arrow-batched stage, skew-salted, one shuffle); "
        "corpus derived deterministically from the driver documents parquet; "
        "oracle = persisted pure-Python-oracle golden (VERDICT r4 item 3)",
)
def extract_pipeline(spark, sf_dir):
    from .operators.extraction import INPUT_SCHEMA, extract_operator

    from . import gen

    def derive(it):
        import pandas as pd
        for pdf in it:
            rows = [gen.doc_from_driver_row(i, txt)
                    for i, txt in zip(pdf["doc_id"], pdf["text"])]
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    docs = (t(spark, sf_dir, "documents").select("doc_id", "text")
            .mapInPandas(derive, schema=INPUT_SCHEMA))
    out = extract_operator(docs)
    return (out.select("doc_id", F.posexplode("spans").alias("pos", "s"))
            .select("doc_id", F.col("s.kind").alias("kind"),
                    F.col("s.text").alias("text"),
                    F.col("s.media_ref").alias("media_ref"),
                    F.col("s.offset").alias("offset")))


# ---------------------------------------------------------------------------
# Repetition-based quality signals (Gopher-style, Rae et al. 2021 §A1.1)
# ---------------------------------------------------------------------------

@register(
    "quality_repetition",
    sql="""
    WITH w AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words
      FROM documents),
    uni AS (
      SELECT doc_id, len(words) AS n_words, unnest(words) AS word
      FROM w WHERE len(words) > 0),
    wc AS (
      SELECT doc_id, MAX(n_words) AS n_words,
             CAST(MAX(cnt) AS BIGINT) AS top_word_cnt,
             CAST(COUNT(*) AS BIGINT) AS n_distinct
      FROM (SELECT doc_id, n_words, word, COUNT(*) AS cnt
            FROM uni GROUP BY doc_id, n_words, word)
      GROUP BY doc_id),
    big AS (
      SELECT doc_id, u.i AS pos, words[u.i] || ' ' || words[u.i + 1] AS bg
      FROM w, unnest(range(1, len(words))) AS u(i)
      WHERE len(words) >= 2),
    bc AS (
      SELECT doc_id, CAST(MAX(cnt) AS BIGINT) AS top_bigram_cnt,
             CAST(SUM(cnt) AS BIGINT) AS n_bigrams
      FROM (SELECT doc_id, bg, COUNT(*) AS cnt FROM big GROUP BY doc_id, bg)
      GROUP BY doc_id)
    SELECT wc.doc_id, wc.n_words, wc.n_distinct, wc.top_word_cnt,
           COALESCE(bc.top_bigram_cnt, 0) AS top_bigram_cnt,
           COALESCE(bc.n_bigrams, 0) AS n_bigrams,
           CAST(wc.n_words - wc.n_distinct AS DOUBLE)
             / CAST(wc.n_words AS DOUBLE) AS frac_dup_words,
           CAST(wc.top_word_cnt AS DOUBLE)
             / CAST(wc.n_words AS DOUBLE) AS frac_top_word,
           (wc.top_word_cnt * 10 > wc.n_words
            OR COALESCE(bc.top_bigram_cnt * 100 > bc.n_bigrams * 18, FALSE)
            OR (wc.n_words - wc.n_distinct) * 10 > wc.n_words * 6)
             AS is_repetitive
    FROM wc LEFT JOIN bc ON bc.doc_id = wc.doc_id
    """,
    doc="Gopher-style repetition filters (Rae et al. 2021): duplicate-word "
        "fraction, top-word fraction, top-bigram fraction, gated with "
        "integer cross-multiplication (top word > 10%%, top 2-gram > 18%%, "
        "dup words > 60%% => repetitive).  Relational form — explode + "
        "groupBy(doc, token) with map-side combine — NOT a per-row "
        "O(n·distinct) array scan, so a 10^5-token doc costs O(n log n) "
        "shuffle like everything else; keys are (doc_id, token), so no "
        "hot-key skew at corpus scale",
)
def quality_repetition(spark, sf_dir):
    w = (t(spark, sf_dir, "documents")
         .select("doc_id", F.expr(WORDS_S).alias("words")))
    uni = (w.filter(F.size("words") > 0)
           .select("doc_id", F.size("words").alias("n_words"),
                   F.explode("words").alias("word")))
    wc = (uni.groupBy("doc_id", "n_words", "word").count()
          .groupBy("doc_id")
          .agg(F.max("n_words").alias("n_words"),
               F.max("count").alias("top_word_cnt"),
               F.count("*").alias("n_distinct")))
    big = (w.filter(F.size("words") >= 2)
           .select("doc_id", F.explode(F.expr(
               "transform(sequence(1, size(words) - 1), "
               "i -> concat(words[i - 1], ' ', words[i]))")).alias("bg")))
    bc = (big.groupBy("doc_id", "bg").count()
          .groupBy("doc_id")
          .agg(F.max("count").alias("top_bigram_cnt"),
               F.sum("count").alias("n_bigrams")))
    rep = (F.col("top_word_cnt") * 10 > F.col("n_words")) \
        | F.coalesce(F.col("top_bigram_cnt") * 100 > F.col("n_bigrams") * 18,
                     F.lit(False)) \
        | ((F.col("n_words") - F.col("n_distinct")) * 10 > F.col("n_words") * 6)
    return (wc.join(bc, "doc_id", "left")
            .select("doc_id", "n_words", "n_distinct", "top_word_cnt",
                    F.coalesce("top_bigram_cnt", F.lit(0)).alias("top_bigram_cnt"),
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                    ((F.col("n_words") - F.col("n_distinct")).cast("double")
                     / F.col("n_words").cast("double")).alias("frac_dup_words"),
                    (F.col("top_word_cnt").cast("double")
                     / F.col("n_words").cast("double")).alias("frac_top_word"),
                    rep.alias("is_repetitive")))


# ---------------------------------------------------------------------------
# Sub-document (chunk-level) exact dedup — the paragraph-dedup analog
# ---------------------------------------------------------------------------

@register(
    "dedup_chunks",
    sql="""
    WITH all_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0),
    w AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words
      FROM all_docs),
    chunks AS (
      SELECT doc_id, u.c AS chunk_idx,
             md5(array_to_string(words[(u.c * 50 + 1):(u.c * 50 + 50)], ' '))
               AS chunk_hash
      FROM w, unnest(range(0, greatest(1, (len(words) + 49) // 50))) AS u(c)
      WHERE len(words) > 0)
    SELECT chunk_hash, CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           MIN(doc_id) AS canonical_doc_id
    FROM chunks GROUP BY chunk_hash HAVING COUNT(*) > 1
    """,
    doc="sub-document exact dedup (the paragraph-dedup of CCNet/C4, tiled "
        "here as 50-word chunks because the corpus has no newlines): tile, "
        "md5 each tile, one groupBy(chunk_hash) with map-side combine -> "
        "copy counts + canonical owner.  The hash table never holds text — "
        "16-byte digests only — so at 100 TB the shuffle is ~0.3%% of "
        "corpus bytes; apply-side is an anti-join on (doc_id, chunk_idx) "
        "exactly like dedup_apply.  Working set = docs ∪ exact copies of "
        "doc_id%%5==0 so cross-document duplicate chunks exist",
)
def dedup_chunks(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    alldocs = d.unionByName(
        d.filter(F.col("doc_id") % 5 == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text"))
    chunks = (alldocs
              .select("doc_id", F.expr(WORDS_S).alias("words"))
              .filter(F.size("words") > 0)
              .select("doc_id", F.explode(F.expr(
                  "sequence(0, greatest(1, (size(words) + 49) div 50) - 1)"))
                  .alias("chunk_idx"), "words")
              .select("doc_id", F.expr(
                  "md5(array_join(slice(words, chunk_idx * 50 + 1, 50), ' '))")
                  .alias("chunk_hash")))
    return (chunks.groupBy("chunk_hash")
            .agg(F.count("*").alias("n_copies"),
                 F.countDistinct("doc_id").alias("n_docs"),
                 F.min("doc_id").alias("canonical_doc_id"))
            .filter(F.col("n_copies") > 1))


# ---------------------------------------------------------------------------
# Incremental dedup: new batch vs a STORED signature index (continuous ingest)
# ---------------------------------------------------------------------------

@register(
    "dedup_incremental",
    sql=f"""
    WITH corpus AS (
      SELECT doc_id, text, 'index' AS side FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, text, 'batch' AS side FROM documents WHERE doc_id % 2 = 1
      UNION ALL
      SELECT doc_id + 3000000 AS doc_id, {TRUNC_D} AS text, 'batch' AS side
      FROM (SELECT doc_id, {WORDS_D} AS words FROM documents
            WHERE doc_id % 14 = 0)),
    sigs AS (
      SELECT doc_id, side, shset,
             [{_band_d(0)}, {_band_d(1)}, {_band_d(2)}, {_band_d(3)}] AS bands
      FROM (SELECT doc_id, side, list_distinct(sh) AS shset, {HS_D} AS hs
            FROM (SELECT doc_id, side, {SHINGLES_D} AS sh
                  FROM (SELECT doc_id, side, {WORDS_D} AS words FROM corpus))
            WHERE len(sh) >= 1)),
    ex AS (
      SELECT doc_id, side, shset, i AS band_idx, bands[i] AS band_hash
      FROM sigs, unnest(range(1, 5)) AS u(i)),
    cand AS (
      SELECT DISTINCT b.doc_id AS new_doc, ix.doc_id AS index_doc,
             b.shset AS sb, ix.shset AS si
      FROM ex b JOIN ex ix
        ON b.band_idx = ix.band_idx AND b.band_hash = ix.band_hash
       AND b.side = 'batch' AND ix.side = 'index')
    SELECT new_doc, index_doc, n_inter, n_union
    FROM (SELECT new_doc, index_doc,
                 len(list_intersect(sb, si)) AS n_inter,
                 len(sb) + len(si) - len(list_intersect(sb, si)) AS n_union
          FROM cand)
    WHERE n_inter * 2 >= n_union
    """,
    doc="incremental near-dup for continuous ingest: an incoming batch's "
        "MinHash band keys equi-join a PERSISTED signature index (docs "
        "doc_id%%2==0 stand in for the stored side; the batch is the odd "
        "docs plus 80%%-truncated copies of doc_id%%14==0, so true "
        "batch-vs-index near-dups exist).  This is the 100 TB steady "
        "state: corpus signatures are computed once at ingest and stored "
        "(here: persisted), each new batch only hashes ITS OWN docs and "
        "probes the band index — shuffle cost scales with the batch, not "
        "the corpus.  Exact-Jaccard >= 0.5 verify inside blocks as in "
        "dedup_minhash_lsh",
)
def dedup_incremental(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    index_docs = d.filter(F.col("doc_id") % 2 == 0)
    trunc = (d.filter(F.col("doc_id") % 14 == 0)
             .select("doc_id", F.expr(WORDS_S).alias("words"))
             .select((F.col("doc_id") + 3000000).alias("doc_id"),
                     F.expr(TRUNC_S).alias("text")))
    batch_docs = d.filter(F.col("doc_id") % 2 == 1).unionByName(trunc)

    def sigs(docs):
        return (docs.filter(F.expr(f"size({WORDS_S}) >= 3"))
                .select("doc_id", F.expr(MINHASH_LSH_SIG_S).alias("sig"))
                .select("doc_id", "sig.*"))

    # the index side is the stored table of a continuous-ingest pipeline —
    # persisted once, reused across batches (and across the two references
    # below: band probe + verify re-join)
    index_sigs = _persist(sigs(index_docs))
    batch_sigs = _persist(sigs(batch_docs), fresh=False)
    ix = index_sigs.select("doc_id",
                           F.posexplode("bands").alias("band_idx", "band_hash"))
    bx = batch_sigs.select("doc_id",
                           F.posexplode("bands").alias("band_idx", "band_hash"))
    cand = (bx.alias("b")
            .join(ix.alias("i"), ["band_idx", "band_hash"])
            .select(F.col("b.doc_id").alias("new_doc"),
                    F.col("i.doc_id").alias("index_doc"))
            .distinct())
    sb = batch_sigs.select(F.col("doc_id").alias("new_doc"),
                           F.col("shset").alias("sb"))
    si = index_sigs.select(F.col("doc_id").alias("index_doc"),
                           F.col("shset").alias("si"))
    n_inter = F.size(F.array_intersect("sb", "si"))
    return (cand.join(sb, "new_doc").join(si, "index_doc")
            .select("new_doc", "index_doc", n_inter.alias("n_inter"),
                    (F.size("sb") + F.size("si") - n_inter).alias("n_union"))
            .filter(F.col("n_inter") * 2 >= F.col("n_union")))


# ---------------------------------------------------------------------------
# End-to-end curation funnel: quality gate -> exact dedup -> stratified sample
# ---------------------------------------------------------------------------

@register(
    "corpus_curation",
    sql=f"""
    WITH w AS (SELECT doc_id, lang, text, {WORDS_D} AS words FROM documents),
    feats AS (
      SELECT doc_id, lang, text, length(text) AS n_chars, len(words) AS n_words,
             {_hits('en', 'duck')} AS n_stop,
             length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct
      FROM w WHERE len(words) > 0 AND length(text) > 0),
    quality AS (
      SELECT doc_id, lang, text FROM feats
      WHERE n_words >= 5 AND n_chars >= 40
        AND n_stop * 100 >= 2 * n_words AND n_punct * 10 <= n_words),
    canon AS (
      SELECT MIN(doc_id) AS doc_id FROM quality GROUP BY md5(text)),
    nondup AS (
      SELECT q.doc_id, q.lang FROM quality q
      JOIN canon c ON c.doc_id = q.doc_id),
    sampled AS (
      SELECT doc_id FROM nondup
      WHERE ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)) * 100
            < 256 * ({_RATE_S}))
    SELECT * FROM (
      SELECT 0 AS stage_idx, 'raw' AS stage,
             CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs
      UNION ALL SELECT 1, 'quality',
             CAST((SELECT COUNT(*) FROM quality) AS BIGINT)
      UNION ALL SELECT 2, 'nondup',
             CAST((SELECT COUNT(*) FROM nondup) AS BIGINT)
      UNION ALL SELECT 3, 'sampled',
             CAST((SELECT COUNT(*) FROM sampled) AS BIGINT))
    """,
    doc="the curation funnel a training-data pipeline actually ships: "
        "quality gates (text_quality_score's exact predicates) -> exact "
        "dedup keep-min-id (dedup_exact's groupBy on md5, applied as a "
        "semi-join of canonical ids — ids only cross the shuffle) -> "
        "per-language stratified hash sample (sample_stratified's "
        "deterministic md5-bucket predicate).  Output is the per-stage "
        "survivor count funnel.  Each stage is one shuffle-free filter or "
        "one thin-key shuffle; nothing rescans upstream stages",
)
def corpus_curation(spark, sf_dir):
    d = (t(spark, sf_dir, "documents")
         .select("doc_id", "lang", "text", F.expr(WORDS_S).alias("words")))
    feats = d.select(
        "doc_id", "lang", "text",
        F.length("text").alias("n_chars"), F.size("words").alias("n_words"),
        F.expr(_hits("en", "spark")).alias("n_stop"),
        F.length(F.regexp_replace("text", r"[^.,;:!?]", "")).alias("n_punct"),
    ).filter((F.col("n_words") > 0) & (F.col("n_chars") > 0))
    quality = (feats.filter(
        (F.col("n_words") >= 5) & (F.col("n_chars") >= 40)
        & (F.col("n_stop") * 100 >= 2 * F.col("n_words"))
        & (F.col("n_punct") * 10 <= F.col("n_words")))
        .select("doc_id", "lang", "text"))
    quality = _persist(quality)   # feeds canon + the semi-join left side
    canon = (quality.groupBy(F.md5("text").alias("h"))
             .agg(F.min("doc_id").alias("doc_id")).select("doc_id"))
    nondup = quality.join(canon, "doc_id", "left_semi").select("doc_id", "lang")
    nondup = _persist(nondup, fresh=False)
    nib = lambda i: (F.expr(
        f"instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), {i}, 1))") - 1)
    sampled = nondup.filter(
        (nib(1) * 16 + nib(2)) * 100 < 256 * F.expr(_RATE_S))

    def stage(idx, name, df):
        return df.groupBy().agg(F.count("*").cast("bigint").alias("n_docs")) \
                 .select(F.lit(idx).alias("stage_idx"), F.lit(name).alias("stage"),
                         "n_docs")

    raw = t(spark, sf_dir, "documents").select("doc_id")
    return (stage(0, "raw", raw)
            .unionByName(stage(1, "quality", quality))
            .unionByName(stage(2, "nondup", nondup))
            .unionByName(stage(3, "sampled", sampled)))


# ---------------------------------------------------------------------------
# Training-mix statistics: per-(source, lang) token budgets + sampling weights
# ---------------------------------------------------------------------------

@register(
    "corpus_mix",
    sql=f"""
    WITH toks AS (
      SELECT source, lang, doc_id,
             len({WORDS_D}) AS n_tokens
      FROM documents),
    per AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS tokens_total
      FROM toks GROUP BY source, lang),
    tot AS (SELECT CAST(SUM(tokens_total) AS BIGINT) AS corpus_tokens FROM per)
    SELECT source, lang, n_docs, tokens_total, corpus_tokens,
           CAST(tokens_total AS DOUBLE) / CAST(corpus_tokens AS DOUBLE)
             AS token_share
    FROM per, tot
    """,
    doc="training-mix accounting: per-(source, lang) document and token "
        "totals plus each stratum's share of the corpus token budget — the "
        "table a data-mixing stage reads to set per-source sampling "
        "weights.  One groupBy with map-side combine; the totals scalar "
        "joins back as a broadcast (cross join with a 1-row side).  "
        "Grouping keys are low-cardinality, so at 100 TB the partial "
        "aggregates collapse to ~|sources|x|langs| rows before the shuffle",
)
def corpus_mix(spark, sf_dir):
    toks = (t(spark, sf_dir, "documents")
            .select("source", "lang",
                    F.expr(f"size({WORDS_S})").alias("n_tokens")))
    per = (toks.groupBy("source", "lang")
           .agg(F.count("*").alias("n_docs"),
                F.sum("n_tokens").cast("bigint").alias("tokens_total")))
    tot = per.groupBy().agg(
        F.sum("tokens_total").cast("bigint").alias("corpus_tokens"))
    return (per.crossJoin(F.broadcast(tot))
            .select("source", "lang", "n_docs", "tokens_total", "corpus_tokens",
                    (F.col("tokens_total").cast("double")
                     / F.col("corpus_tokens").cast("double")).alias("token_share")))


# ---------------------------------------------------------------------------
# Eval-set decontamination: n-gram collision scan against a benchmark set
# ---------------------------------------------------------------------------

@register(
    "decontaminate",
    sql=f"""
    WITH evalset AS (
      SELECT doc_id AS eval_id, {WORDS_D} AS words
      FROM documents WHERE doc_id % 97 = 0),
    corpus AS (
      SELECT doc_id, {WORDS_D} AS words
      FROM documents WHERE doc_id % 97 <> 0),
    eg AS (
      SELECT DISTINCT eval_id, sh FROM (
        SELECT eval_id, unnest({SHINGLES_D}) AS sh FROM evalset
        WHERE len(words) >= 3)),
    cg AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, unnest({SHINGLES_D}) AS sh FROM corpus
        WHERE len(words) >= 3))
    SELECT doc_id, CAST(COUNT(DISTINCT sh) AS BIGINT) AS n_hit_ngrams,
           CAST(COUNT(DISTINCT eval_id) AS BIGINT) AS n_eval_docs,
           MIN(eval_id) AS first_eval_id
    FROM (SELECT cg.doc_id, cg.sh, eg.eval_id
          FROM cg JOIN eg ON eg.sh = cg.sh)
    GROUP BY doc_id
    """,
    doc="benchmark decontamination (GPT-3 appx C / PaLM style): training "
        "docs sharing any word 3-gram with the eval set (docs "
        "doc_id%%97==0 stand in for the benchmark) are reported with hit "
        "counts.  The eval side is tiny and its distinct n-gram index "
        "BROADCASTS — the corpus side is a map-side hash probe, no "
        "corpus-keyed shuffle until the per-doc aggregate; at 100 TB "
        "that aggregate is the only exchange and it carries ids + counts "
        "only.  (Real pipelines use 8-13-gram windows; the fixture corpus "
        "is 50-word docs, so 3-grams keep the working set meaningful.)",
)
def decontaminate(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    def grams(df, idcol):
        return (df.filter(F.expr(f"size({WORDS_S}) >= 3"))
                .select(F.col("doc_id").alias(idcol),
                        F.explode(F.array_distinct(
                            F.expr(SHINGLES_FROM_TEXT_S))).alias("sh")))
    eg = grams(d.filter(F.col("doc_id") % 97 == 0), "eval_id")
    cg = grams(d.filter(F.col("doc_id") % 97 != 0), "doc_id")
    return (cg.join(F.broadcast(eg), "sh")
            .groupBy("doc_id")
            .agg(F.countDistinct("sh").alias("n_hit_ngrams"),
                 F.countDistinct("eval_id").alias("n_eval_docs"),
                 F.min("eval_id").alias("first_eval_id")))


# ---------------------------------------------------------------------------
# Corpus length distribution: EXACT per-stratum quantiles, relationally
# ---------------------------------------------------------------------------

LENGTH_STATS_SQL = f"""
    WITH toks AS (
      SELECT lang, doc_id, len({WORDS_D}) AS n_tokens FROM documents),
    ranked AS (
      SELECT lang, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n_tokens, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM toks)
    SELECT lang, CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(MIN(CASE WHEN rn * 2 >= n THEN n_tokens END) AS BIGINT)
             AS p50_tokens,
           CAST(MIN(CASE WHEN rn * 10 >= n * 9 THEN n_tokens END) AS BIGINT)
             AS p90_tokens
    FROM ranked GROUP BY lang
    """


def corpus_length_stats(spark, sf_dir):
    """Per-language token-length distribution with EXACT p50/p90 — no
    percentile_approx sketch (whose centroids are engine- and
    merge-order-dependent, so it can't be oracle-checked and its error is
    unbounded on skewed corpora).  Quantile = first value whose rank
    crosses the target fraction, computed with one per-stratum window +
    one groupBy; the window sorts WITHIN each language partition only —
    there is no global sort, so at 100 TB each stratum sorts in parallel
    and the skew ceiling is the largest single language, which is exactly
    the partition a sampler would need to scan anyway.  Ties broken by
    doc_id so both engines rank identically.  Registry leg of
    battery_vocab_stats."""
    toks = (t(spark, sf_dir, "documents")
            .select("lang", "doc_id",
                    F.expr(f"size({WORDS_S})").alias("n_tokens")))
    wr = W.partitionBy("lang").orderBy("n_tokens", "doc_id")
    wn = W.partitionBy("lang")
    ranked = (toks.withColumn("rn", F.row_number().over(wr))
              .withColumn("n", F.count("*").over(wn)))
    return (ranked.groupBy("lang")
            .agg(F.max("n").cast("bigint").alias("n_docs"),
                 F.min("n_tokens").cast("bigint").alias("min_tokens"),
                 F.max("n_tokens").cast("bigint").alias("max_tokens"),
                 F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
                 F.min(F.when(F.col("rn") * 2 >= F.col("n"), F.col("n_tokens")))
                  .cast("bigint").alias("p50_tokens"),
                 F.min(F.when(F.col("rn") * 10 >= F.col("n") * 9,
                              F.col("n_tokens")))
                  .cast("bigint").alias("p90_tokens")))


# ---------------------------------------------------------------------------
# Vocabulary heavy-hitters: exact top-k terms per language stratum
# ---------------------------------------------------------------------------

VOCAB_TOPK_SQL = f"""
    WITH toks AS (
      SELECT lang, unnest({WORDS_D}) AS term FROM documents),
    counts AS (
      SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS n
      FROM toks GROUP BY lang, term),
    ranked AS (
      SELECT lang, term, n,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n DESC, term ASC) AS rank
      FROM counts)
    SELECT lang, CAST(rank AS INT) AS rank, term, n
    FROM ranked WHERE rank <= 10
    """


def vocab_topk(spark, sf_dir):
    """Vocabulary heavy-hitters: exact top-10 terms per language with
    counts — the table a tokenizer-training or corpus-inspection stage
    reads.  One groupBy on (lang, term) with map-side combine (raw tokens
    collapse to the vocabulary inside each scan task), then the rank
    window runs on the AGGREGATED table — vocabulary is Heaps-sublinear
    in corpus size, so the window input stays small at 100 TB and no
    per-token row ever reaches a sort.  Deterministic tie-break by term.
    Registry leg of battery_vocab_stats."""
    toks = (t(spark, sf_dir, "documents")
            .select("lang", F.explode(F.expr(WORDS_S)).alias("term")))
    counts = toks.groupBy("lang", "term").agg(F.count("*").alias("n"))
    w = W.partitionBy("lang").orderBy(F.desc("n"), F.asc("term"))
    return (counts.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
            .select("lang", "rank", "term", "n"))


@register(
    "battery_vocab_stats",
    sql=f"""
    SELECT 'len' AS probe, lang, CAST(NULL AS VARCHAR) AS term,
           n_docs AS v1, min_tokens AS v2, max_tokens AS v3,
           sum_tokens AS v4, p50_tokens AS v5, p90_tokens AS v6
    FROM ({LENGTH_STATS_SQL}) ls
    UNION ALL
    SELECT 'vocab' AS probe, lang, term,
           CAST(rank AS BIGINT) AS v1, n AS v2, CAST(NULL AS BIGINT) AS v3,
           CAST(NULL AS BIGINT) AS v4, CAST(NULL AS BIGINT) AS v5,
           CAST(NULL AS BIGINT) AS v6
    FROM ({VOCAB_TOPK_SQL}) vt
    """,
    doc="combined oracle entry for the per-language corpus statistics "
        "pair: corpus_length_stats (exact p50/p90 token-length "
        "distribution) and vocab_topk (exact top-10 terms per language). "
        "Same plans, same oracle SQL, projected onto one union schema so "
        "both stay inside the driver's 50-entry correctness file "
        "(vocab_topk had no driver row in r1 OR r2)",
)
def battery_vocab_stats(spark, sf_dir):
    nb = F.lit(None).cast("bigint")
    ls = corpus_length_stats(spark, sf_dir).select(
        F.lit("len").alias("probe"), "lang",
        F.lit(None).cast("string").alias("term"),
        F.col("n_docs").alias("v1"), F.col("min_tokens").alias("v2"),
        F.col("max_tokens").alias("v3"), F.col("sum_tokens").alias("v4"),
        F.col("p50_tokens").alias("v5"), F.col("p90_tokens").alias("v6"))
    vt = vocab_topk(spark, sf_dir).select(
        F.lit("vocab").alias("probe"), "lang", "term",
        F.col("rank").cast("bigint").alias("v1"),
        F.col("n").cast("bigint").alias("v2"),
        nb.alias("v3"), nb.alias("v4"), nb.alias("v5"), nb.alias("v6"))
    return ls.unionByName(vt)


# ---------------------------------------------------------------------------
# Document rarity score: the LM-perplexity-style quality proxy, exact math
# ---------------------------------------------------------------------------

@register(
    "quality_rarity",
    sql=f"""
    WITH w AS (SELECT doc_id, {WORDS_D} AS words FROM documents),
    tot AS (SELECT COUNT(*) AS n_docs FROM documents),
    terms AS (
      SELECT doc_id, unnest(list_distinct(words)) AS term
      FROM w WHERE len(words) > 0),
    dfreq AS (SELECT term, COUNT(*) AS n_df FROM terms GROUP BY term),
    idf AS (
      SELECT term,
             CAST(floor(((CAST(n_docs AS DOUBLE) - CAST(n_df AS DOUBLE) + 0.5)
                         / (CAST(n_df AS DOUBLE) + 0.5)) * 10000) AS BIGINT)
               AS q_idf
      FROM dfreq, tot)
    SELECT doc_id, n_distinct_terms,
           CAST(sum_q AS DOUBLE) / 10000.0 AS sum_idf,
           CAST(sum_q AS DOUBLE) / 10000.0 / CAST(n_distinct_terms AS DOUBLE)
             AS mean_idf,
           sum_q * 10 > 2 * 100000 * n_distinct_terms AS is_rare
    FROM (
      SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_distinct_terms,
             CAST(SUM(i.q_idf) AS BIGINT) AS sum_q
      FROM terms t JOIN idf i ON i.term = t.term
      GROUP BY t.doc_id)
    """,
    doc="document rarity scoring — the relational stand-in for the CCNet "
        "LM-perplexity quality signal: each doc's mean corpus IDF over its "
        "distinct terms (common-language docs score low, "
        "unusual-vocabulary docs high).  Composes the same cross-doc "
        "aggregate as tfidf_terms; idf is the ln-free BM25 form so both "
        "engines agree bit-for-bit (ln() rounding is libm-dependent; a "
        "real perplexity would need an agreed log table).  The idf "
        "vocabulary is Heaps-sublinear, so at 100 TB the term join "
        "broadcasts the vocab or shuffles thin (term, idf) pairs — "
        "document text never moves; per-doc aggregation is map-side "
        "combined.  idf is quantized to int64 (floor(idf*10^4)) before "
        "summing, as b8's scorer does, so the per-doc sum is exact "
        "integer math — order-independent across partitionings and "
        "engines (a raw SUM(double) varies with reduction order)",
)
def quality_rarity(spark, sf_dir):
    w = (t(spark, sf_dir, "documents")
         .select("doc_id", F.expr(WORDS_S).alias("words"))
         .filter(F.size("words") > 0))
    terms = w.select("doc_id", F.explode(F.array_distinct("words")).alias("term"))
    tot = t(spark, sf_dir, "documents", spread=False).count()
    dfreq = terms.groupBy("term").agg(F.count("*").alias("n_df"))
    idf = dfreq.select(
        "term",
        F.floor(((F.lit(float(tot)) - F.col("n_df").cast("double") + F.lit(0.5))
                 / (F.col("n_df").cast("double") + F.lit(0.5))) * 10000)
         .cast("bigint").alias("q_idf"))
    agg = (terms.join(F.broadcast(idf), "term")
           .groupBy("doc_id")
           .agg(F.count("*").alias("n_distinct_terms"),
                F.sum("q_idf").cast("bigint").alias("sum_q")))
    return agg.select(
        "doc_id", "n_distinct_terms",
        (F.col("sum_q").cast("double") / 10000.0).alias("sum_idf"),
        (F.col("sum_q").cast("double") / 10000.0
         / F.col("n_distinct_terms").cast("double")).alias("mean_idf"),
        (F.col("sum_q") * 10 > 2 * 100000 * F.col("n_distinct_terms"))
        .alias("is_rare"))


@register(
    "multimodal_frames",
    sql="""
    SELECT doc_id,
           'media://' || md5(text) AS media_ref,
           CAST(u.k AS INT) AS frame_idx,
           CAST(1000 * u.k AS BIGINT) AS ts_ms,
           sha256('frame|' || u.k || '|' || text) AS frame_sha
    FROM documents, unnest(range(0, 4)) AS u(k)
    WHERE doc_id % 3 = 2
    """,
    doc="video frame sampling plumbing, gate-checked end to end: the "
        "Arrow-batched frame_sample operator (operators/multimodal.py — "
        "row-expanding 1→n map, shuffle-free, real schema/batching; the "
        "decode is the documented deterministic sha256 fake since no "
        "codecs ship in this sandbox) emits 4 evenly-spaced frames per "
        "video blob, and the fake is reproduced in DuckDB SQL so frame "
        "bytes (as sha hex), timestamps, and media refs are value-hashed "
        "cross-engine — no rows-only hole",
)
def multimodal_frames(spark, sf_dir):
    from .operators.multimodal import documents_as_media, frame_sample
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    fr = frame_sample(documents_as_media(docs), n_frames=4)
    return fr.select("doc_id", "media_ref", "frame_idx", "ts_ms",
                     F.lower(F.hex("frame")).alias("frame_sha"))


@register(
    "multimodal_resize",
    sql="""
    SELECT doc_id,
           'media://' || md5(text) AS media_ref,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_kind,
           CAST(32 AS INT) AS target_w, CAST(32 AS INT) AS target_h,
           CAST(1024 AS INT) AS thumb_bytes,
           md5(substring(repeat(sha256('resize|32|32|' || text), 32), 1, 2048))
             AS thumb_md5
    FROM documents
    """,
    doc="image/audio resize plumbing, gate-checked end to end: the "
        "Arrow-batched media_resize operator (operators/multimodal.py — "
        "real schema/batching/map-side-only plan; deterministic "
        "digest-expansion fake standing in for the absent codecs) emits "
        "32x32 thumbnails, and the fake is reproduced in DuckDB SQL in "
        "the hex domain (sha256 repeat + slice), so thumbnail bytes are "
        "value-hashed cross-engine via md5-of-hex",
)
def multimodal_resize(spark, sf_dir):
    from .operators.multimodal import documents_as_media, media_resize
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    rs = media_resize(documents_as_media(docs), width=32, height=32)
    return rs.select("doc_id", "media_ref", "media_kind",
                     "target_w", "target_h",
                     F.length("thumb").cast("int").alias("thumb_bytes"),
                     F.md5(F.lower(F.hex("thumb"))).alias("thumb_md5"))


# ---------------------------------------------------------------------------
# Event-time operators: as-of join + gap sessionization
# ---------------------------------------------------------------------------

@register(
    "events_asof_join",
    sql="""
    WITH tagged AS (
      SELECT user_id, event_id, ts, event_type,
             MAX(CASE WHEN event_type = 'click' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click_ts
      FROM events)
    SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
           p.last_click_ts,
           c.event_id AS click_id,
           CAST(date_diff('microsecond', p.last_click_ts, p.ts) // 1000
                AS BIGINT) AS ms_since_click
    FROM tagged p
    JOIN events c
      ON c.user_id = p.user_id AND c.ts = p.last_click_ts
     AND c.event_type = 'click'
    WHERE p.event_type = 'purchase' AND p.last_click_ts IS NOT NULL
    QUALIFY ROW_NUMBER() OVER (PARTITION BY p.event_id
                               ORDER BY c.event_id DESC) = 1
    """,
    doc="ASOF join, the time-series operator Spark lacks natively: each "
        "purchase pairs with the user's most recent STRICTLY-PRIOR click. "
        "Expressed as a running MAX(click ts) window over the per-user "
        "event-time order (frame ends at 1 PRECEDING, so a same-timestamp "
        "click never matches itself forward) + one equi-join back on "
        "(user, ts) to fetch the click row, max event_id disambiguating "
        "same-timestamp clicks.  Shuffles only on user_id — the window "
        "and the join co-locate on one key, no range join, no broadcast "
        "of the big side; per-user skew is bounded by the busiest single "
        "user exactly as any sessionful analysis is.  The REUSABLE form "
        "of this construction is operators/asof.py:asof_join(left, right, "
        "on, order, right_id, strict=...) — any event-type pair, strict "
        "or at-or-before boundary, inner or left (tests/test_asof.py)",
)
def events_asof_join(spark, sf_dir):
    e = t(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type")
    wp = (W.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(W.unboundedPreceding, -1))
    tagged = e.withColumn(
        "last_click_ts",
        F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(wp))
    p = (tagged.filter((F.col("event_type") == "purchase")
                       & F.col("last_click_ts").isNotNull())
         .select("user_id", F.col("event_id").alias("purchase_id"),
                 F.col("ts").alias("purchase_ts"), "last_click_ts"))
    c = (e.filter(F.col("event_type") == "click")
         .select(F.col("user_id").alias("cu"), F.col("ts").alias("ct"),
                 F.col("event_id").alias("click_id")))
    wdup = W.partitionBy("purchase_id").orderBy(F.desc("click_id"))
    return (p.join(c, (F.col("cu") == F.col("user_id"))
                   & (F.col("ct") == F.col("last_click_ts")))
            .withColumn("rn", F.row_number().over(wdup)).filter("rn = 1")
            .select("user_id", "purchase_id", "purchase_ts", "last_click_ts",
                    "click_id",
                    # exact integer microseconds (a double subtraction of
                    # fractional seconds is off by 1 ms at micro precision);
                    # TIMESTAMP_NTZ needs the timestamp hop first (session
                    # tz pinned UTC)
                    F.expr("(unix_micros(cast(purchase_ts as timestamp)) "
                           "- unix_micros(cast(last_click_ts as timestamp))) "
                           "div 1000").cast("bigint").alias("ms_since_click")))


SESSION_GAP_MIN = 30


_GAP_US = SESSION_GAP_MIN * 60 * 1_000_000


@register(
    "events_sessionize",
    sql=f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER (
                          PARTITION BY user_id ORDER BY ts, event_id))
                       > {_GAP_US}
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events),
    sess AS (
      SELECT user_id, event_id, ts,
             CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_no
      FROM ordered)
    SELECT user_id, session_no, CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS BIGINT)
             AS duration_s
    FROM sess GROUP BY user_id, session_no
    """,
    doc=f"gap-based sessionization ({SESSION_GAP_MIN}-minute inactivity "
        "splits a user's stream): LAG flags session starts, a running SUM "
        "numbers them (gaps-and-islands), one groupBy rolls sessions up. "
        "Gap compares EXACT integer microseconds (unix_micros / epoch_us — "
        "a whole-second truncation would mis-split gaps within 1 s of the "
        "threshold) and the boundary is OPEN (only gap > 30 min starts a "
        "new session), pinned to MEASURED Spark session_window semantics: "
        "an event arriving exactly at session_end still merges (touching "
        "windows coalesce).  Both windows and the aggregate share the "
        "user_id partitioning — one shuffle total, sessions never span "
        "partitions, and the streaming twin is streaming/sessions.py "
        "(native session_window, append mode emits only closed sessions; "
        "interval parity pytest includes an exactly-at-gap fixture)",
)
def events_sessionize(spark, sf_dir):
    e = t(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer microseconds, as events_asof_join does (ADVICE r2):
    # cast->long truncates to whole seconds and a gap in (1799,1801) s
    # could split in one engine but not the other
    ordered = (
        e.withColumn("prev_ts", F.lag("ts").over(wo))
        .withColumn(
            "is_start",
            F.when(F.col("prev_ts").isNull(), 1)
             .when(F.expr("unix_micros(cast(ts as timestamp)) "
                          "- unix_micros(cast(prev_ts as timestamp))")
                   > _GAP_US, 1)
             .otherwise(0)))
    sess = ordered.withColumn(
        "session_no",
        F.sum("is_start").over(wo.rowsBetween(W.unboundedPreceding, 0))
         .cast("bigint"))
    return (sess.groupBy("user_id", "session_no")
            .agg(F.count("*").alias("n_events"),
                 F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.expr("(unix_micros(cast(max(ts) as timestamp)) "
                        "- unix_micros(cast(min(ts) as timestamp))) div 1000000")
                 .cast("bigint").alias("duration_s")))
