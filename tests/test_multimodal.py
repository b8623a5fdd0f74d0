"""Multimodal binary-column plumbing: metadata attach, feature
extraction (binary never crosses the stage boundary), frame sampling,
decoder override."""

from pyspark.sql import functions as F

from beats_spark.dataops.multimodal import (
    attach_media_meta, extract_image_features, sample_video_frames,
    set_decoder, _DECODERS,
)


def _payloads(spark):
    return spark.createDataFrame(
        [(1, b"\x89PNG fake bytes here"), (2, b"GIF89a data"), (3, None)],
        "doc_id bigint, payload binary")


def test_attach_media_meta(spark):
    out = attach_media_meta(_payloads(spark), media_type="image")
    rows = {r["doc_id"]: r["media"] for r in out.collect()}
    assert rows[1]["width"] >= 16 and rows[1]["n_frames"] >= 1
    assert rows[3]["mime"] is None
    # deterministic across runs
    again = {r["doc_id"]: r["media"]
             for r in attach_media_meta(_payloads(spark)).collect()}
    assert rows == again


def test_extract_image_features_drops_binary(spark):
    feats = extract_image_features(_payloads(spark), dim=8)
    assert [f.name for f in feats.schema] == ["doc_id", "features"]
    rows = {r["doc_id"]: r["features"] for r in feats.collect()}
    assert len(rows[1]) == 8 and rows[3] is None
    # seeded by content → stable
    rows2 = {r["doc_id"]: r["features"]
             for r in extract_image_features(_payloads(spark), dim=8)
             .collect()}
    assert rows[1] == rows2[1]


def test_sample_video_frames(spark):
    frames = sample_video_frames(_payloads(spark), every_n=4)
    got = frames.collect()
    assert all(r["frame_idx"] % 4 == 0 for r in got)
    assert {r["doc_id"] for r in got} <= {1, 2}


def test_set_decoder_override(spark):
    def fake(payload):
        return {"mime": "image/test", "width": 1, "height": 2,
                "n_frames": 3, "duration_ms": 4}
    set_decoder("image", fake)
    try:
        out = attach_media_meta(_payloads(spark).limit(1),
                                media_type="image")
        assert out.collect()[0]["media"]["mime"] == "image/test"
    finally:
        _DECODERS.pop("image", None)
