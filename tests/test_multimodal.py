from __future__ import annotations

import pytest

from temporal_retriever_spark.llm.multimodal import (
    extract_features,
    media_metadata_stats,
    set_decoder,
    synthetic_media,
)


def test_extract_features_stub(spark):
    media = synthetic_media(spark, n=30)
    feats = extract_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        assert r["n_bytes"] >= 64
        assert len(r["digest"]) == 64
        assert len(r["features"]) == 8
        assert all(0 <= v < 1 for v in r["features"])


def test_features_deterministic(spark):
    media = synthetic_media(spark, n=10)
    a = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    b = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    assert a == b


def test_no_decoder_raises(spark):
    media = synthetic_media(spark, n=2)
    set_decoder(None)
    with pytest.raises(NotImplementedError):
        extract_features(media, use_stub=False)


def test_custom_decoder_plumbs_through(spark):
    media = synthetic_media(spark, n=6)
    set_decoder(lambda payload, mtype: [float(len(payload)), float(len(mtype))])
    try:
        feats = extract_features(media, use_stub=False).collect()
        for r in feats:
            assert r["features"][0] == float(r["n_bytes"])
    finally:
        set_decoder(None)


def test_metadata_stats_prunes_payload(spark):
    media = synthetic_media(spark, n=30)
    stats = {r["media_type"]: r for r in media_metadata_stats(media).collect()}
    assert set(stats) == {"image", "audio", "video"}
    assert stats["image"]["avg_width"] is not None
    assert stats["audio"]["avg_duration_ms"] is not None
