"""1B selection surface (B3/B8/B9): persona expansion, challenge-JSON
adaptation, the selection plan's invariants, record assembly, and the CLI
selection mode end-to-end."""

import json
import subprocess
import sys

import pytest

from pdf_extractor_spark.plans.selection import (
    PERSONA_PROFILES, build_selection_records, extract_task_keywords,
    load_collection_config, persona_keywords, selection_plan,
    transform_challenge_format)

SF_DIR = "/root/testdata/sf0.001"

CHALLENGE = {
    "challenge_info": {
        "challenge_id": "round_1b_002",
        "test_case_name": "perf_review",
        "description": "Query Performance",
    },
    "documents": [
        {"filename": "src0", "title": "Source Zero"},
        {"filename": "src1"},
    ],
    "persona": {"role": "Analyst"},
    "job_to_be_done": {"task": "Analyze performance trends in query data."},
}


class TestPersona:
    def test_task_keywords(self):
        kws = extract_task_keywords("Plan a trip of 4 days for a group of 10 friends.")
        assert kws == ["plan", "trip", "days", "group", "friends"]

    def test_profile_plus_task(self):
        kws = persona_keywords("Travel Planner", "Plan a trip of 4 days.")
        assert set(PERSONA_PROFILES["travel planner"]).issubset(kws)
        assert "trip" in kws and "days" in kws

    def test_unknown_role_falls_back_to_analyst(self):
        assert persona_keywords("Wizard", "")[:3] == list(
            PERSONA_PROFILES["analyst"])[:3]

    def test_dedup_and_determinism(self):
        a = persona_keywords("analyst", "query data data query")
        assert len(a) == len(set(a))
        assert a == persona_keywords("analyst", "query data data query")


class TestChallengeAdaptation:
    def test_transform_mapping(self):
        cfg = transform_challenge_format(CHALLENGE)
        assert cfg["collection_name"] == "perf_review"
        assert cfg["challenge_id"] == "round_1b_002"
        assert cfg["persona"] == "Analyst"
        assert cfg["job_to_be_done"] == "Analyze performance trends in query data."
        assert cfg["processing_config"] == {"max_sections": 25,
                                            "min_relevance_score": 0.5}
        assert cfg["documents"][0] == {"filename": "src0", "title": "Source Zero"}
        assert cfg["documents"][1]["title"] == "src1"   # title defaults to filename

    def test_defaults_on_empty(self):
        cfg = transform_challenge_format({"challenge_info": {}})
        assert cfg["persona"] == "analyst"
        assert cfg["job_to_be_done"] == "Analyze documents"
        assert cfg["collection_name"] == "unknown"

    def test_passthrough_for_adapted_format(self):
        already = {"persona": "x", "job_to_be_done": "y", "documents": []}
        assert load_collection_config(already) is already
        assert "processing_config" in load_collection_config(CHALLENGE)


@pytest.fixture(scope="module")
def selected(spark):
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "source", "text"))
    kws = persona_keywords("analyst", "Analyze performance trends in query data")
    return selection_plan(docs, kws, max_sections=5, min_score=0.5).collect()


class TestSelectionPlan:
    def test_rank_dense_and_bounded(self, selected):
        by_src = {}
        for r in selected:
            by_src.setdefault(r.source, []).append(r.importance_rank)
        for src, ranks in by_src.items():
            assert sorted(ranks) == list(range(1, len(ranks) + 1)), src
            assert len(ranks) <= 5

    def test_min_score_gate(self, selected):
        assert all(r.score >= 0.5 for r in selected)

    def test_diversity_distinct_lead_words(self, selected):
        by_src = {}
        for r in selected:
            by_src.setdefault(r.source, []).append(r.section_title.split(" ")[0])
        for src, leads in by_src.items():
            assert len(leads) == len(set(leads)), src

    def test_refined_text_sentence_cap(self, spark):
        # driver docs have no '.'; check the <=3-sentence slice on text that does
        docs = spark.createDataFrame(
            [(1, "s", "one alpha. two beta. three gamma. four delta. five " +
              "epsilon " * 20)],
            "doc_id long, source string, text string")
        rows = selection_plan(docs, ["alpha"], max_sections=1,
                              min_score=0.0).collect()
        assert len(rows) == 1
        assert rows[0].refined_text.count(".") <= 3
        assert rows[0].refined_text.startswith("one alpha.")

    def test_partitioning_invariance(self, spark, selected):
        """Total window orderings make the selection identical no matter how
        the input is partitioned (a cluster-resize must not change output)."""
        docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
                .select("doc_id", "source", "text").repartition(7, "doc_id"))
        kws = persona_keywords("analyst",
                               "Analyze performance trends in query data")
        again = selection_plan(docs, kws, max_sections=5, min_score=0.5).collect()
        key = lambda rows: sorted((r.source, r.importance_rank, r.doc_id,
                                   r.section_title, r.refined_text) for r in rows)
        assert key(again) == key(selected)

    def test_title_is_first_8_words(self, selected):
        r = selected[0]
        assert len(r.section_title.split(" ")) <= 8
        assert r.refined_text.startswith(r.section_title.split(" ")[0])


class TestRecordAssembly:
    def test_record_shape_matches_reference(self, selected):
        rows = [r.asDict() for r in selected]
        recs = build_selection_records(rows, "Analyst", "Analyze trends",
                                       "2026-01-01T00:00:00")
        assert recs
        rec = next(iter(recs.values()))
        # exact key sets of challenge1b_output.json:2-45
        assert set(rec) == {"metadata", "extracted_sections", "subsection_analysis"}
        assert set(rec["metadata"]) == {"input_documents", "persona",
                                        "job_to_be_done", "processing_timestamp"}
        for s in rec["extracted_sections"]:
            assert set(s) == {"document", "section_title", "importance_rank",
                              "page_number"}
        for s in rec["subsection_analysis"]:
            assert set(s) == {"document", "refined_text", "page_number"}
        ranks = [s["importance_rank"] for s in rec["extracted_sections"]]
        assert ranks == sorted(ranks) == list(range(1, len(ranks) + 1))
        assert rec["metadata"]["persona"] == "Analyst"
        assert rec["metadata"]["processing_timestamp"] == "2026-01-01T00:00:00"


class TestExtractThenSelect:
    def test_composed_pipelines(self, tmp_path):
        """The full engine story: extraction output (doc_id, spans) feeds
        the selection CLI directly — spans are flattened to text and the
        table becomes one collection."""
        run = tmp_path / "run"
        p1 = subprocess.run(
            [sys.executable, "-m", "pdf_extractor_spark.cli",
             "--input", str(run / "docs"), "--output", str(run / "out"),
             "--gen-docs", "120", "--partitions", "6", "--master", "local[4]"],
            capture_output=True, text=True, timeout=240)
        assert p1.returncode == 0, p1.stderr[-2000:]
        cfg = dict(CHALLENGE)
        cfg["documents"] = []          # whole table = the collection
        cfg_path = tmp_path / "input.json"
        cfg_path.write_text(json.dumps(cfg))
        out_path = tmp_path / "records.json"
        p2 = subprocess.run(
            [sys.executable, "-m", "pdf_extractor_spark.cli",
             "--input", str(run / "out" / "extracted"),
             "--output", str(out_path), "--config", str(cfg_path),
             "--master", "local[4]"],
            capture_output=True, text=True, timeout=240)
        assert p2.returncode == 0, p2.stderr[-2000:]
        records = json.loads(out_path.read_text())
        assert set(records) == {"perf_review"}
        rec = records["perf_review"]
        assert 1 <= len(rec["extracted_sections"]) <= 25
        assert all(s["document"].startswith("doc-")
                   for s in rec["extracted_sections"])


class TestCliBatchMode:
    def test_collections_dir(self, tmp_path):
        for name, srcs in (("colA", ["src0"]), ("colB", ["src1", "src2"])):
            d = tmp_path / "cols" / name
            d.mkdir(parents=True)
            cfg = dict(CHALLENGE)
            cfg["documents"] = [{"filename": s} for s in srcs]
            (d / "input.json").write_text(json.dumps(cfg))
        # a dir with no input JSON must be skipped, not crash
        (tmp_path / "cols" / "empty").mkdir()
        out = tmp_path / "out"
        proc = subprocess.run(
            [sys.executable, "-m", "pdf_extractor_spark.cli",
             "--input", f"{SF_DIR}/documents.parquet",
             "--output", str(out), "--collections-dir", str(tmp_path / "cols"),
             "--master", "local[4]"],
            capture_output=True, text=True, timeout=300)
        assert proc.returncode == 0, proc.stderr[-2000:]
        metrics = json.loads(proc.stdout.strip().splitlines()[-1])
        assert metrics["collections_processed"] == 2
        a = json.loads((out / "colA.json").read_text())
        b = json.loads((out / "colB.json").read_text())
        assert set(a) == {"src0"} and set(b) == {"src1", "src2"}


class TestCliSelectionMode:
    def test_end_to_end(self, tmp_path):
        cfg_path = tmp_path / "input.json"
        cfg_path.write_text(json.dumps(CHALLENGE))
        out_path = tmp_path / "challenge1b_output.json"
        proc = subprocess.run(
            [sys.executable, "-m", "pdf_extractor_spark.cli",
             "--input", f"{SF_DIR}/documents.parquet",
             "--output", str(out_path), "--config", str(cfg_path),
             "--master", "local[4]", "--timestamp", "2026-02-02T00:00:00"],
            capture_output=True, text=True, timeout=240)
        assert proc.returncode == 0, proc.stderr[-2000:]
        metrics = json.loads(proc.stdout.strip().splitlines()[-1])
        assert metrics["mode"] == "selection"
        assert metrics["collection_name"] == "perf_review"
        assert metrics["collections"] == 2            # src0 + src1 only
        records = json.loads(out_path.read_text())
        assert set(records) == {"src0", "src1"}
        for rec in records.values():
            assert rec["metadata"]["persona"] == "Analyst"
            assert rec["metadata"]["processing_timestamp"] == "2026-02-02T00:00:00"
            assert 1 <= len(rec["extracted_sections"]) <= 25

    def test_end_to_end_with_golden_grading(self, tmp_path):
        """--config + --golden: the run is graded against golden records
        (1B validation_report shape) right after selection.  Golden = a
        prior identical run -> every collection grades 100/A."""
        cfg_path = tmp_path / "input.json"
        cfg_path.write_text(json.dumps(CHALLENGE))
        base = [sys.executable, "-m", "pdf_extractor_spark.cli",
                "--input", f"{SF_DIR}/documents.parquet",
                "--config", str(cfg_path), "--master", "local[4]",
                "--timestamp", "2026-02-02T00:00:00"]
        golden = tmp_path / "golden.json"
        p1 = subprocess.run(base + ["--output", str(golden)],
                            capture_output=True, text=True, timeout=240)
        assert p1.returncode == 0, p1.stderr[-2000:]
        out = tmp_path / "run2.json"
        p2 = subprocess.run(base + ["--output", str(out),
                                    "--golden", str(golden)],
                            capture_output=True, text=True, timeout=240)
        assert p2.returncode == 0, p2.stderr[-2000:]
        metrics = json.loads(p2.stdout.strip().splitlines()[-1])
        assert set(metrics["validation_scores"].values()) == {100.0}
        report = json.loads(
            (tmp_path / "run2.json.validation.json").read_text())
        assert all(v["grade"] == "A - Excellent" for v in report.values())


class TestSpansInputScoping:
    def _write_spans_with_source(self, path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pdf_extractor_spark.gen import gen_corpus
        rows = gen_corpus(40, seed=3)
        span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                            ("media_ref", pa.string()), ("offset", pa.int32())])
        pq.write_table(pa.table({
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
            "source": pa.array(["fileA.pdf" if i % 2 == 0 else "fileB.pdf"
                                for i in range(len(rows))], pa.string()),
            "spans": pa.array([r["spans"] for r in rows], pa.list_(span_t)),
        }), str(path))

    def test_documents_list_scopes_spans_input_with_source(self, tmp_path):
        """A spans-shaped input CARRYING a source column is scoped by the
        config's documents list exactly like the text branch."""
        inp = tmp_path / "spans.parquet"
        self._write_spans_with_source(inp)
        cfg = dict(CHALLENGE)
        cfg["documents"] = [{"filename": "fileA.pdf"}]
        cfg_path = tmp_path / "input.json"
        cfg_path.write_text(json.dumps(cfg))
        out_path = tmp_path / "records.json"
        proc = subprocess.run(
            [sys.executable, "-m", "pdf_extractor_spark.cli",
             "--input", str(inp), "--output", str(out_path),
             "--config", str(cfg_path), "--master", "local[4]"],
            capture_output=True, text=True, timeout=240)
        assert proc.returncode == 0, proc.stderr[-2000:]
        records = json.loads(out_path.read_text())
        rec = records[list(records)[0]]
        docs = {s["document"] for s in rec["extracted_sections"]}
        # fileA.pdf was assigned to the even-index docs; scoping must keep
        # ONLY those (the document field carries the doc_id)
        assert docs, "no sections selected"
        assert all(int(d.split("-")[1]) % 2 == 0 for d in docs), docs

    def test_documents_list_without_source_column_fails_loudly(self, tmp_path):
        """A bare (doc_id, spans) table cannot honor a documents list —
        the CLI must error, not silently select from the whole table."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pdf_extractor_spark.gen import gen_corpus
        rows = gen_corpus(10, seed=3)
        span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                            ("media_ref", pa.string()), ("offset", pa.int32())])
        inp = tmp_path / "spans.parquet"
        pq.write_table(pa.table({
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
            "spans": pa.array([r["spans"] for r in rows], pa.list_(span_t)),
        }), str(inp))
        cfg = dict(CHALLENGE)
        cfg["documents"] = [{"filename": "fileA.pdf"}]
        cfg_path = tmp_path / "input.json"
        cfg_path.write_text(json.dumps(cfg))
        proc = subprocess.run(
            [sys.executable, "-m", "pdf_extractor_spark.cli",
             "--input", str(inp), "--output", str(tmp_path / "r.json"),
             "--config", str(cfg_path), "--master", "local[4]"],
            capture_output=True, text=True, timeout=240)
        assert proc.returncode != 0
        assert "documents" in proc.stderr
