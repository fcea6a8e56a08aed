"""1B selection regression grader: score a produced selection run against
golden records, emitting the reference's ``validation_report.json`` shape
(``/root/reference/1B/validation_report.json:4-93``).

The reference ships only the report, not the scorer, so the formulas here
are derived from the report's own numbers and documented:

* per-field similarity = ``difflib.SequenceMatcher(None, gen, exp)
  .ratio()`` — verified against the published pairs (e.g. the two
  document names scoring 0.7741935… = 2·24/62);
* the scored KEY SET mirrors the reference's observable one (the 11
  ``similarity_scores`` paths every collection publishes): metadata's
  leaves + the three container aggregates (metadata, extracted_sections,
  subsection_analysis) + element-[0] text fields only — NOT a full leaf
  walk.  Integer fields ([0].page_number, [0].importance_rank) are
  scored only when mismatched and surface only in content_differences
  (decoded from the reports: Collection 1's overall is the mean of 12
  scores = 11 published + page_number's 0.0 seen only in
  content_differences; Collection 2's is the mean of exactly the 11;
  Collection 3's is over 13 with both int page_numbers mismatching);
* ``overall_similarity`` = 100 × mean over that union — reproduces
  61.61810065508541 / 79.88628089006617 / 57.53366458161733 exactly;
* the ``metadata`` container aggregate = mean of its leaf scores
  (verified: (1+1+1+0.3728813559)/4 = the published 0.8432203389830508);
  the list containers' aggregate is NOT derivable from published data
  (the generated side of the reference run isn't in the repo), so they
  use the structurally-analogous rule: mean of index-aligned elementwise
  text similarities, absent elements scoring 0;
* ``overall_score = (structure_match_score + overall_similarity +
  100·section_overlap) / 3`` — reproduces all three collections'
  published scores exactly ((100 + 61.618 + 0)/3 = 53.873,
  (100 + 79.886 + 0)/3 = 59.962, (100 + 57.534 + 0)/3 = 52.511; note
  document coverage is reported but does NOT enter the score);
* grade bands: only the F boundary is pinned by the reference (59.96 →
  "F - Poor"), the rest follow the conventional decade bands.

Everything is pure Python over two ≤max_sections-row record dicts —
grading is a driver-side check on an already-bounded selection output,
never a distributed job.
"""

from __future__ import annotations

import difflib
from typing import Any

GRADE_BANDS = (
    (90.0, "A - Excellent"),
    (80.0, "B - Good"),
    (70.0, "C - Fair"),
    (60.0, "D - Below Average"),
    (float("-inf"), "F - Poor"),
)

_TRUNC = 100  # content_differences text preview length (reference shape)


def _ratio(a: Any, b: Any) -> float:
    sa, sb = _as_text(a), _as_text(b)
    if sa == sb:
        return 1.0
    return difflib.SequenceMatcher(None, sa, sb).ratio()


def _as_text(v: Any) -> str:
    if isinstance(v, list):
        return ", ".join(_as_text(x) for x in v)
    if isinstance(v, dict):
        return ", ".join(_as_text(x) for x in v.values())
    return str(v)


# Element-[0] fields the reference's scorer compares per list (decoded from
# validation_report.json): text fields always scored; int fields scored
# only when mismatched (a matched int is invisible in the published
# reports — absent from similarity_scores AND from the overall mean).
_LIST_TEXT_FIELDS = {
    "extracted_sections": ("document", "section_title"),
    "subsection_analysis": ("document", "refined_text"),
}
_LIST_INT_FIELDS = {
    "extracted_sections": ("importance_rank", "page_number"),
    "subsection_analysis": ("page_number",),
}


def _leaf_paths(obj: Any, prefix: str = "") -> dict[str, Any]:
    """Flatten a record to {dotted[indexed] path: leaf value}."""
    out: dict[str, Any] = {}
    if isinstance(obj, dict):
        for k, v in obj.items():
            out.update(_leaf_paths(v, f"{prefix}.{k}" if prefix else k))
    elif isinstance(obj, list) and obj and isinstance(obj[0], dict):
        for i, v in enumerate(obj):
            out.update(_leaf_paths(v, f"{prefix}[{i}]"))
    else:
        out[prefix] = obj
    return out


def _structure(gen: Any, exp: Any, prefix: str = "") -> tuple[list, list, dict]:
    """Recursive key-set / type comparison (lists compared by element 0's
    structure, as the reference's report implies — only [i] paths with
    matching structure appear)."""
    missing: list[str] = []
    extra: list[str] = []
    mism: dict[str, str] = {}
    if isinstance(exp, dict) and isinstance(gen, dict):
        for k in exp:
            p = f"{prefix}.{k}" if prefix else k
            if k not in gen:
                missing.append(p)
            else:
                m, e, t = _structure(gen[k], exp[k], p)
                missing += m; extra += e; mism.update(t)
        extra += [f"{prefix}.{k}" if prefix else k for k in gen if k not in exp]
    elif isinstance(exp, list) and isinstance(gen, list):
        if exp and gen:
            m, e, t = _structure(gen[0], exp[0], f"{prefix}[0]")
            missing += m; extra += e; mism.update(t)
    elif type(gen) is not type(exp):
        mism[prefix] = f"{type(gen).__name__} vs {type(exp).__name__}"
    return missing, extra, mism


def grade_record(gen: dict, exp: dict) -> dict:
    """Grade ONE collection's generated record against its golden record."""
    # --- structure -------------------------------------------------------
    missing, extra, mism = _structure(gen, exp)
    n_exp_keys = max(1, len(_leaf_paths(exp)))
    penal = len(missing) + len(extra) + len(mism)
    structure_score = max(0.0, 100.0 * (1 - penal / n_exp_keys))

    # --- content: the reference's observable key set (see module doc) ----
    sims: dict[str, float] = {}       # published similarity_scores
    diffs: dict[str, dict] = {}
    all_scores: dict[str, float] = {}  # what overall_similarity averages
    _absent = object()  # a PRESENT null leaf is a value, not a missing path

    def _diff(p: str, gv: Any, ev: Any, s: float) -> None:
        gt, et = _as_text(None if gv is _absent else gv), _as_text(ev)
        diffs[p] = {
            "generated": gt[:_TRUNC] + ("..." if len(gt) > _TRUNC else ""),
            "expected": et[:_TRUNC] + ("..." if len(et) > _TRUNC else ""),
            "similarity": s,
        }

    def _score(p: str, gv: Any, ev: Any) -> float:
        s = 0.0 if gv is _absent else _ratio(gv, ev)
        if isinstance(ev, int) and not isinstance(ev, bool):
            # int fields: only a MISMATCH is observable in the reference
            # report (content_differences + the overall mean, never
            # similarity_scores)
            if s < 1.0:
                all_scores[p] = s
                _diff(p, gv, ev, s)
        else:
            all_scores[p] = sims[p] = s
            if s < 1.0:
                _diff(p, gv, ev, s)
        return s

    emeta_d = exp.get("metadata")
    if isinstance(emeta_d, dict):
        gmeta_d = gen.get("metadata")
        gmeta_d = gmeta_d if isinstance(gmeta_d, dict) else {}
        leaf = [_score(f"metadata.{k}", gmeta_d.get(k, _absent), ev)
                for k, ev in emeta_d.items()]
        # container aggregate = mean of leaf scores (verified: reproduces
        # the published 0.8432203389830508 for Collection 1)
        all_scores["metadata"] = sims["metadata"] = (
            sum(leaf) / len(leaf) if leaf else 1.0)
    for key in ("extracted_sections", "subsection_analysis"):
        el = exp.get(key)
        if not isinstance(el, list):
            continue
        gl = gen.get(key)
        gl = gl if isinstance(gl, list) else []
        # container aggregate: mean of index-aligned elementwise text
        # similarity, absent elements scoring 0 (the one formula the
        # published data cannot pin — see module doc)
        if el or gl:
            n = max(len(el), len(gl))
            all_scores[key] = sims[key] = sum(
                _ratio(gl[i], el[i])
                if i < len(gl) and i < len(el) else 0.0
                for i in range(n)) / n
        else:
            all_scores[key] = sims[key] = 1.0
        if el and isinstance(el[0], dict):
            g0 = gl[0] if gl and isinstance(gl[0], dict) else {}
            for f in _LIST_TEXT_FIELDS[key] + _LIST_INT_FIELDS[key]:
                if f in el[0]:
                    _score(f"{key}[0].{f}", g0.get(f, _absent), el[0][f])
    array_mismatches = {
        k: {"generated": len(gen.get(k) or []), "expected": len(exp[k])}
        for k in ("extracted_sections", "subsection_analysis")
        if isinstance(exp.get(k), list)
        and len(gen.get(k) or []) != len(exp[k])}
    # mean over similarity_scores ∪ mismatched-int scores — the union the
    # published overall_similarity values decode to (12/11/13 paths for
    # Collections 1/2/3)
    overall_similarity = 100.0 * (
        sum(all_scores.values()) / max(1, len(all_scores)))

    # --- semantic ---------------------------------------------------------
    gsec = gen.get("extracted_sections") or []
    esec = exp.get("extracted_sections") or []
    gdocs = sorted({s.get("document") for s in gsec})
    edocs = sorted({s.get("document") for s in esec})
    missing_docs = [d for d in edocs if d not in gdocs]
    extra_docs = [d for d in gdocs if d not in edocs]
    coverage = 100.0 * (1 - len(missing_docs) / max(1, len(edocs)))
    epairs = {(s.get("document"), s.get("section_title")) for s in esec}
    gpairs = {(s.get("document"), s.get("section_title")) for s in gsec}
    section_overlap = len(epairs & gpairs) / max(1, len(epairs))
    gmeta, emeta = gen.get("metadata", {}), exp.get("metadata", {})

    overall = (structure_score + overall_similarity
               + 100.0 * section_overlap) / 3
    grade = next(g for lo, g in GRADE_BANDS if overall >= lo)
    return {
        "status": "success",
        "overall_score": overall,
        "structure_validation": {
            "missing_keys": missing,
            "extra_keys": extra,
            "type_mismatches": mism,
            "structure_match_score": structure_score,
        },
        "content_validation": {
            "content_differences": diffs,
            "similarity_scores": sims,
            "array_length_mismatches": array_mismatches,
            "overall_similarity": overall_similarity,
        },
        "semantic_validation": {
            "extracted_sections_validation": {
                "count_match": len(gsec) == len(esec),
                "generated_count": len(gsec),
                "expected_count": len(esec),
                "document_coverage": {
                    "generated_documents": gdocs,
                    "expected_documents": edocs,
                    "missing_documents": missing_docs,
                    "extra_documents": extra_docs,
                    "coverage_score": coverage,
                },
                "section_overlap": section_overlap,
            },
            "metadata_validation": {
                "persona_match": gmeta.get("persona") == emeta.get("persona"),
                "task_match": gmeta.get("job_to_be_done")
                == emeta.get("job_to_be_done"),
                "document_count_match": len(gmeta.get("input_documents") or [])
                == len(emeta.get("input_documents") or []),
            },
        },
        "grade": grade,
    }


def grade_report(generated: dict[str, dict],
                 expected: dict[str, dict]) -> dict[str, dict]:
    """Grade every golden collection; collections absent from the
    generated run report status=missing with a zero score."""
    report: dict[str, dict] = {}
    for name in sorted(expected):
        if name not in generated:
            report[name] = {"status": "missing", "overall_score": 0.0,
                            "grade": GRADE_BANDS[-1][1]}
        else:
            report[name] = grade_record(generated[name], expected[name])
    return report
