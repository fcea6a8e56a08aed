"""1B selection regression grader (plans/grading.py): hand-computed
scores for a perturbed run, the reference report's published similarity
values, and the CLI --grade surface."""

import copy
import difflib
import json
import os
import subprocess
import sys

import pytest

from pdf_extractor_spark.plans.grading import grade_record, grade_report

GOLDEN = {
    "metadata": {
        "input_documents": ["d1", "d2"],
        "persona": "Analyst",
        "job_to_be_done": "find stuff",
        "processing_timestamp": "2026-02-02T00:00:00",
    },
    "extracted_sections": [
        {"document": "d1", "section_title": "alpha beta",
         "importance_rank": 1, "page_number": 1},
        {"document": "d2", "section_title": "gamma delta",
         "importance_rank": 2, "page_number": 2},
    ],
    "subsection_analysis": [
        {"document": "d1", "refined_text": "hello world", "page_number": 1},
        {"document": "d2", "refined_text": "more text", "page_number": 2},
    ],
}


def perturbed():
    gen = copy.deepcopy(GOLDEN)
    gen["extracted_sections"][1]["section_title"] = "gamma epsilon"
    gen["subsection_analysis"][0]["refined_text"] = "hello there"
    return gen


def test_perfect_match_grades_100():
    r = grade_record(copy.deepcopy(GOLDEN), GOLDEN)
    assert r["overall_score"] == 100.0
    assert r["grade"] == "A - Excellent"
    assert r["structure_validation"]["structure_match_score"] == 100.0
    assert r["content_validation"]["content_differences"] == {}
    sem = r["semantic_validation"]["extracted_sections_validation"]
    assert sem["section_overlap"] == 1.0
    assert sem["document_coverage"]["coverage_score"] == 100.0


def test_null_leaf_matches_null_leaf():
    """A golden null leaf matched by a generated null leaf is a PERFECT
    match (similarity 1.0), distinct from the path being absent (0.0)."""
    golden = copy.deepcopy(GOLDEN)
    golden["extracted_sections"][0]["page_number"] = None
    r = grade_record(copy.deepcopy(golden), golden)
    assert r["overall_score"] == 100.0
    assert r["content_validation"]["content_differences"] == {}
    # absent path still penalized
    gen = copy.deepcopy(golden)
    del gen["extracted_sections"][0]["page_number"]
    r2 = grade_record(gen, golden)
    sims = r2["content_validation"]["similarity_scores"]
    assert sims["extracted_sections[0].page_number"] == 0.0


def test_perturbed_scores_hand_computed():
    r = grade_record(perturbed(), GOLDEN)
    # the reference's observable key set: metadata leaves + 3 container
    # aggregates + element-[0] text fields (11 scored paths here; matched
    # int fields are invisible).  The [1].section_title perturbation is
    # seen only through the extracted_sections container aggregate; the
    # [0].refined_text one also as a leaf.
    rc1 = difflib.SequenceMatcher(
        None, "d2, gamma epsilon, 2, 2", "d2, gamma delta, 2, 2").ratio()
    rc2 = difflib.SequenceMatcher(
        None, "d1, hello there, 1", "d1, hello world, 1").ratio()
    r2 = difflib.SequenceMatcher(None, "hello there", "hello world").ratio()
    want_sim = 100.0 * (
        4 + 1                      # metadata leaves + container
        + (1 + rc1) / 2 + 1 + 1    # ES container + [0].document/[0].title
        + (rc2 + 1) / 2 + 1 + r2   # SA container + [0].document/[0].text
    ) / 11
    cv = r["content_validation"]
    assert abs(cv["overall_similarity"] - want_sim) < 1e-9
    assert set(cv["content_differences"]) == {
        "subsection_analysis[0].refined_text"}
    # structure unchanged; one of two (document, title) pairs survives
    sem = r["semantic_validation"]["extracted_sections_validation"]
    assert sem["section_overlap"] == 0.5
    assert sem["document_coverage"]["coverage_score"] == 100.0
    want_overall = (100.0 + want_sim + 50.0) / 3
    assert abs(r["overall_score"] - want_overall) < 1e-9


def test_reference_published_similarity_reproduced():
    """The reference report's per-field similarity is difflib ratio:
    1B/validation_report.json publishes 0.7741935483870968 for this pair."""
    r = difflib.SequenceMatcher(
        None, "South of France - Things to Do.pdf",
        "South of France - Cities.pdf").ratio()
    assert abs(r - 0.7741935483870968) < 1e-12
    gen = copy.deepcopy(GOLDEN)
    gen["extracted_sections"][0]["document"] = "South of France - Things to Do.pdf"
    exp = copy.deepcopy(GOLDEN)
    exp["extracted_sections"][0]["document"] = "South of France - Cities.pdf"
    got = grade_record(gen, exp)["content_validation"]["similarity_scores"][
        "extracted_sections[0].document"]
    assert abs(got - r) < 1e-12


def test_reference_overall_formula_reproduced():
    """overall_score = (structure + similarity + 100*overlap)/3 reproduces
    every published collection score in 1B/validation_report.json."""
    for s, c, o, want in [(100.0, 61.61810065508541, 0.0, 53.87270021836181),
                          (100.0, 79.88628089006617, 0.0, 59.96209363002206),
                          (100.0, 57.53366458161733, 0.0, 52.51122152720578)]:
        assert abs((s + c + 100 * o) / 3 - want) < 1e-9


REF_COLLECTIONS = "/root/reference/1B/Collections"
PUBLISHED_KEYS = {
    "metadata.processing_timestamp", "extracted_sections", "metadata",
    "metadata.input_documents", "subsection_analysis", "metadata.persona",
    "subsection_analysis[0].document", "extracted_sections[0].section_title",
    "extracted_sections[0].document", "metadata.job_to_be_done",
    "subsection_analysis[0].refined_text",
}


@pytest.mark.parametrize("col", ["Collection 1", "Collection 2",
                                 "Collection 3"])
def test_real_reference_golden_self_grade(col):
    """An actual reference golden record graded against itself must be a
    perfect score, and the similarity_scores key set must be EXACTLY the
    11 paths every collection publishes in 1B/validation_report.json —
    the decoded enumeration on real reference data, read-only."""
    p = f"{REF_COLLECTIONS}/{col}/challenge1b_output.json"
    if not os.path.exists(p):
        pytest.skip("reference tree absent")
    with open(p) as f:
        rec = json.load(f)
    r = grade_record(copy.deepcopy(rec), rec)
    assert r["overall_score"] == 100.0
    assert r["grade"] == "A - Excellent"
    assert r["content_validation"]["content_differences"] == {}
    assert set(r["content_validation"]["similarity_scores"]) == PUBLISHED_KEYS
    assert all(v == 1.0
               for v in r["content_validation"]["similarity_scores"].values())


def test_int_mismatch_counts_in_overall_not_in_similarity_scores():
    """Collection 1 decoded: page_number (int) mismatch appears in
    content_differences and lowers overall_similarity, but never enters
    similarity_scores; a matched int is invisible everywhere."""
    gen = copy.deepcopy(GOLDEN)
    gen["subsection_analysis"][0]["page_number"] = 9
    r = grade_record(gen, GOLDEN)
    cv = r["content_validation"]
    assert "subsection_analysis[0].page_number" in cv["content_differences"]
    assert "subsection_analysis[0].page_number" not in cv["similarity_scores"]
    # 11 text paths (one container degraded) + the int mismatch = 12
    rc = difflib.SequenceMatcher(
        None, "d1, hello world, 9", "d1, hello world, 1").ratio()
    want = 100.0 * (10 + (rc + 1) / 2 + 0.0) / 12
    assert abs(cv["overall_similarity"] - want) < 1e-9


def test_structure_penalties_and_missing_collection():
    gen = copy.deepcopy(GOLDEN)
    del gen["metadata"]["persona"]
    gen["bonus_key"] = 1
    r = grade_record(gen, GOLDEN)
    sv = r["structure_validation"]
    assert sv["missing_keys"] == ["metadata.persona"]
    assert sv["extra_keys"] == ["bonus_key"]
    assert sv["structure_match_score"] < 100.0
    rep = grade_report({"colA": gen}, {"colA": GOLDEN, "colB": GOLDEN})
    assert rep["colB"]["status"] == "missing"
    assert rep["colB"]["grade"] == "F - Poor"


def test_cli_grade_mode(tmp_path):
    gen_p, gold_p, out_p = (tmp_path / n for n in
                            ("gen.json", "gold.json", "report.json"))
    gen_p.write_text(json.dumps({"colA": perturbed()}))
    gold_p.write_text(json.dumps({"colA": GOLDEN}))
    proc = subprocess.run(
        [sys.executable, "-m", "pdf_extractor_spark.cli",
         "--grade", str(gen_p), "--golden", str(gold_p),
         "--output", str(out_p)],
        capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr[-2000:]
    metrics = json.loads(proc.stdout.strip().splitlines()[-1])
    assert metrics["mode"] == "grade"
    report = json.loads(out_p.read_text())
    assert abs(report["colA"]["overall_score"]
               - metrics["scores"]["colA"]) < 0.01
    assert report["colA"]["grade"].startswith(("B", "C"))
