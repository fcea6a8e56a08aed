"""1B selection regression grader: score a produced selection run against
golden records, emitting the reference's ``validation_report.json`` shape
(``/root/reference/1B/validation_report.json:4-93``).

The reference ships only the report, not the scorer, so the formulas here
are derived from the report's own numbers and documented:

* per-field similarity = ``difflib.SequenceMatcher(None, gen, exp)
  .ratio()`` — verified against the published pairs (e.g. the two
  document names scoring 0.7741935… = 2·24/62);
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
    return str(v)


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

    # --- content: per-leaf similarity over the golden's paths ------------
    gleaf, eleaf = _leaf_paths(gen), _leaf_paths(exp)
    sims: dict[str, float] = {}
    diffs: dict[str, dict] = {}
    _absent = object()  # a PRESENT null leaf is a value, not a missing path
    for p, ev in eleaf.items():
        gv = gleaf.get(p, _absent)
        s = 0.0 if gv is _absent else _ratio(gv, ev)
        gv = None if gv is _absent else gv
        sims[p] = s
        if s < 1.0:
            diffs[p] = {
                "generated": _as_text(gv)[:_TRUNC] + (
                    "..." if len(_as_text(gv)) > _TRUNC else ""),
                "expected": _as_text(ev)[:_TRUNC] + (
                    "..." if len(_as_text(ev)) > _TRUNC else ""),
                "similarity": s,
            }
    array_mismatches = {
        k: {"generated": len(gen.get(k) or []), "expected": len(exp[k])}
        for k in ("extracted_sections", "subsection_analysis")
        if isinstance(exp.get(k), list)
        and len(gen.get(k) or []) != len(exp[k])}
    overall_similarity = 100.0 * (sum(sims.values()) / max(1, len(sims)))

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
