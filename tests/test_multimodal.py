"""Multimodal plumbing tests: schema, Arrow batch shape, partition
independence, frame fan-out."""

from de_final_project_spark.operators.multimodal import (
    extract_features,
    frame_sample,
    multimodal_features,
    synthesize_media,
)

SF_DIR = "/root/testdata/sf0.001"


def test_media_schema(spark):
    media = synthesize_media(spark, SF_DIR)
    assert dict(media.dtypes) == {
        "doc_id": "bigint", "media_type": "string", "payload": "binary"
    }
    types = {r.media_type for r in media.select("media_type").distinct().collect()}
    assert types == {"image", "audio", "video"}


def test_features_deterministic_and_partition_independent(spark):
    media = synthesize_media(spark, SF_DIR)
    a = sorted(tuple(r) for r in extract_features(media).collect())
    b = sorted(tuple(r) for r in extract_features(media.repartition(11)).collect())
    assert a == b
    assert len(a) == media.count()
    row = dict(zip([f[0] for f in extract_features(media).dtypes], a[0]))
    assert 16 <= row["width"] < 16 + 1024
    assert 0.0 <= row["brightness"] <= 1.0


def test_multimodal_features_entrypoint(spark):
    out = multimodal_features(spark, SF_DIR)
    assert out.columns == [
        "doc_id", "media_type", "n_bytes", "width", "height",
        "duration_s", "brightness",
    ]
    assert out.count() == 500


def test_frame_sample_fanout(spark):
    media = synthesize_media(spark, SF_DIR)
    n_videos = media.where("media_type = 'video'").count()
    frames = frame_sample(media, n_frames=4)
    assert frames.count() == n_videos * 4
    per_doc = frames.groupBy("doc_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_doc] == [4]
    # frame hashes are distinct per frame
    assert frames.select("frame_hash").distinct().count() == n_videos * 4


def test_resize_media_plumbing(spark):
    from de_final_project_spark.operators.multimodal import (
        resize_media,
        synthesize_media,
    )

    media = synthesize_media(spark, SF_DIR)
    out = resize_media(media, 224, 224)
    rows = out.collect()
    n_images = media.where("media_type = 'image'").count()
    assert len(rows) == n_images
    assert all(r["width"] == 224 and r["height"] == 224 for r in rows)
    # deterministic: payload is a pure function of input payload + target
    again = {r["doc_id"]: r["payload"] for r in resize_media(media, 224, 224).collect()}
    assert all(again[r["doc_id"]] == r["payload"] for r in rows)
    # schema contract holds
    assert dict(out.dtypes)["payload"] == "binary"
