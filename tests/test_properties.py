"""Property-based tests (hypothesis) over the pure heuristic core.

These pin the *invariants* the distributed engine relies on, independent of
any particular corpus: determinism, dense ordered offsets, total-function
error semantics, greedy no-chain merging, and generator stability.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extractor_spark.core.extract import extract_document
from pdf_extractor_spark.core import pdfheur
from pdf_extractor_spark.gen import gen_doc

# --- arbitrary (possibly garbage) input spans ------------------------------

span_st = st.fixed_dictionaries({
    "kind": st.sampled_from(["pdf_page", "html", "media", "corrupt", "junk"]),
    "text": st.text(max_size=120),
    "media_ref": st.text(max_size=20),
    "offset": st.integers(min_value=0, max_value=50),
})
doc_st = st.lists(span_st, max_size=12)


@settings(max_examples=200, deadline=None)
@given(doc_st)
def test_total_function_and_dense_offsets(spans):
    """Any input → either a valid span sequence or ([], 1); never raises."""
    out, failures = extract_document(spans)
    assert failures in (0, 1)
    if failures:
        assert out == []
    else:
        assert [s["offset"] for s in out] == list(range(len(out)))
        assert out[0]["kind"] == "title"
        assert all(isinstance(s["text"], str) for s in out)


@settings(max_examples=100, deadline=None)
@given(doc_st)
def test_deterministic(spans):
    assert extract_document(spans) == extract_document(list(spans))


@settings(max_examples=100, deadline=None)
@given(doc_st, st.randoms())
def test_input_order_irrelevant(spans, rnd):
    """Offsets define the order — input row order must not matter."""
    shuffled = list(spans)
    rnd.shuffle(shuffled)
    assert extract_document(spans) == extract_document(shuffled)


# --- W3 merge: greedy, one lookahead, no transitive chains ------------------

def mk_heading(i, page=0, level=1, text="Overview", size=16.0):
    return {"text": text, "page": page, "y0": 40.0 + 18.0 * i,
            "y1": 52.0 + 18.0 * i, "size": size, "bold": True,
            "font": "HelvBold", "flags": 16, "detected_level": level}


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=2, max_value=8))
def test_merge_never_chains(n):
    """A run of n identical adjacent headings merges pairwise: every merged
    heading absorbs at most ONE successor (extractor.py:574-626 semantics)."""
    # 'over' suffix texts end without punctuation and next starts lowercase
    hs = [mk_heading(i, text="over") for i in range(n)]
    merged = pdfheur.merge_consecutive_headings(hs)
    assert len(merged) >= (n + 1) // 2
    for h in merged:
        # a merged text is at most two originals joined — never three
        assert h["text"].count("over") <= 2


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_generator_seed_stability(i):
    a = gen_doc(f"doc-{i:07d}", seed=42)
    b = gen_doc(f"doc-{i:07d}", seed=42)
    assert a == b
    assert [s["offset"] for s in a["spans"]] == list(range(len(a["spans"])))


# --- vectorized skip_table_body ≡ per-block scalar reference ---------------

block_st = st.fixed_dictionaries({
    "text": st.one_of(st.just(""), st.text(max_size=100),
                      st.sampled_from(["12", "3.14", "$1,000", "ab",
                                       "a long sentence that keeps going on " * 3])),
    "page": st.integers(0, 3),
    "y0": st.floats(0, 800, allow_nan=False),
    "y1": st.floats(0, 800, allow_nan=False),
    "size": st.sampled_from([9.0, 10.0, 12.0, 14.0, 16.0, 20.0]),
    "bold": st.booleans(),
    "font": st.just("Helv"),
    "flags": st.sampled_from([0, 16]),
})


@settings(max_examples=150, deadline=None)
@given(st.lists(block_st, max_size=30))
def test_skip_table_body_matches_scalar(blocks):
    vec = pdfheur.skip_table_body(blocks)
    ref = []
    for i, b in enumerate(blocks):
        if not pdfheur.is_table_content(b, blocks, i):
            ref.append(b)
        else:
            text = b["text"].strip()
            if (b["bold"] or len(text) > 20) and not pdfheur.is_obvious_table_cell(text):
                ref.append(b)
    assert vec == ref
