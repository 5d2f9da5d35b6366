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


def test_resize_stub_deterministic(spark):
    import hashlib

    from temporal_retriever_spark.llm.multimodal import resize_images

    media = synthetic_media(spark, n=12)
    payloads = {r["media_id"]: (r["media_type"], bytes(r["payload"])) for r in media.collect()}
    out = resize_images(media, width=32, height=24).collect()
    assert len(out) == 12
    for r in out:
        mtype, orig = payloads[r["media_id"]]
        if mtype == "audio":
            assert bytes(r["payload"]) == orig  # pass-through
        else:
            want = hashlib.sha256(orig + b"@32x24").hexdigest().encode()
            assert bytes(r["payload"]) == want
            assert r["meta"]["width"] == 32 and r["meta"]["height"] == 24


def test_resize_custom_kernel(spark):
    from temporal_retriever_spark.llm.multimodal import resize_images, set_resizer

    media = synthetic_media(spark, n=6)
    set_resizer(lambda payload, w, h: payload[: w // 8])
    try:
        out = resize_images(media, width=32, height=24, use_stub=False).collect()
        for r in out:
            if r["media_type"] != "audio":
                assert len(bytes(r["payload"])) == 4
    finally:
        set_resizer(None)


def test_resize_no_kernel_raises(spark):
    import pytest

    from temporal_retriever_spark.llm.multimodal import resize_images, set_resizer

    set_resizer(None)
    with pytest.raises(NotImplementedError):
        resize_images(synthetic_media(spark, n=2), width=8, height=8, use_stub=False)


def test_sample_frames_count_and_digests(spark):
    import hashlib

    from temporal_retriever_spark.llm.multimodal import sample_frames

    media = synthetic_media(spark, n=9)
    durations = {
        r["media_id"]: (r["meta"]["duration_ms"], bytes(r["payload"]))
        for r in media.collect()
    }
    frames = sample_frames(media, interval_ms=400).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, (duration, payload) in durations.items():
        got = sorted(by_media.get(mid, []), key=lambda r: r["frame_idx"])
        if duration is None:  # images emit nothing
            assert got == []
            continue
        want_n = -(-duration // 400)
        assert len(got) == want_n
        for i, r in enumerate(got):
            assert r["frame_ts_ms"] == i * 400
            want = hashlib.sha256(payload + b"#" + str(i * 400).encode()).hexdigest()
            assert bytes(r["frame"]) == want.encode()


def test_sample_frames_partition_preserving(spark):
    # the fan-out is a narrow transformation: no exchange in the plan
    from temporal_retriever_spark.llm.multimodal import sample_frames

    media = synthetic_media(spark, n=30).repartition(4)
    # partition count survives the fan-out (mapInPandas adds no exchange)
    assert sample_frames(media, interval_ms=500).rdd.getNumPartitions() == 4


def test_repartition_for_payloads(spark):
    from temporal_retriever_spark.llm.multimodal import repartition_for_payloads

    media = synthetic_media(spark, n=60)  # payloads ~64-113 bytes each
    out = repartition_for_payloads(media, target_partition_bytes=1000)
    # ~60*88 = ~5.3k bytes -> ~6 partitions
    n = out.rdd.getNumPartitions()
    assert 4 <= n <= 8
    assert out.count() == 60
