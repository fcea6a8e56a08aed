"""Pure-Python single-process oracle (SURVEY.md §5).

Runs the shared per-document extraction (:mod:`core.extract`) over a
corpus with zero Spark involvement, producing the golden span sequences
that the distributed pipeline must match exactly —
``(kind, text, media_ref, order)`` per ``doc_id`` (BASELINE.json
north_rule).  Stands in for the reference's golden JSON outputs, which
are bound to binary PDFs + PyMuPDF not available here; the behavioral
contract (SURVEY.md §2.2–§2.10) is what is replicated.
"""

from __future__ import annotations

from .core.extract import extract_document


def run_oracle(rows: list[dict]) -> dict[str, list[dict]]:
    """rows: [{doc_id, spans}] → {doc_id: output_spans} (error docs → [])."""
    out: dict[str, list[dict]] = {}
    for r in rows:
        spans, _failures = extract_document(r["spans"])
        out[r["doc_id"]] = spans
    return out


def oracle_failures(rows: list[dict]) -> int:
    """Total parse-failure tally over the corpus."""
    return sum(extract_document(r["spans"])[1] for r in rows)
