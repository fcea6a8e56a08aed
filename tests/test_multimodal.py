"""Multimodal plumbing: decode/resize/frame-sample schemas, determinism,
batch behavior (the codec itself is a deterministic stub by design)."""

import pytest

from pdf_extractor_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "epsilon zeta")],
        "doc_id bigint, text string")
    return mm.documents_as_media(docs)


def test_features_schema_and_determinism(spark, media):
    a = mm.media_features(media).collect()
    b = mm.media_features(media).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
    r = a[0]
    assert r.media_ref.startswith("media://") and len(r.feat) == mm.N_FEATURES
    assert r.feat_norm > 0 and r.n_bytes > 0


def test_decode_real_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_real(b"x", "image")


def test_resize_shapes(spark, media):
    rows = mm.media_resize(media, 8, 4).collect()
    assert {len(bytes(r.thumb)) for r in rows} == {32}
    assert all(r.target_w == 8 and r.target_h == 4 for r in rows)


def test_frame_sample_rows(spark, media):
    n_videos = media.filter("media_kind = 'video'").count()
    rows = mm.frame_sample(media, n_frames=3).collect()
    assert len(rows) == 3 * n_videos
    assert {r.frame_idx for r in rows} == {0, 1, 2}
    assert all(r.ts_ms == 1000 * r.frame_idx for r in rows)
    # deterministic frames
    again = mm.frame_sample(media, n_frames=3).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))
