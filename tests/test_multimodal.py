from etl_cms_spark.operators.multimodal import (
    extract_features,
    frame_sample,
    synthesize_media,
)


def test_binary_roundtrip_and_features(spark, documents):
    media = synthesize_media(documents.limit(50), "doc_id", "text")
    assert dict(media.dtypes)["payload"] == "binary"
    feats = extract_features(media).collect()
    assert len(feats) == 50
    for r in feats:
        assert r["decode_ok"] and len(r["feature"]) == 8
        assert all(0.0 <= x <= 1.0 for x in r["feature"])


def test_features_deterministic(spark, documents):
    media = synthesize_media(documents.limit(20), "doc_id", "text")
    a = {r["media_id"]: list(r["feature"]) for r in extract_features(media).collect()}
    b = {r["media_id"]: list(r["feature"]) for r in extract_features(media).collect()}
    assert a == b


def test_frame_sampling(spark, documents):
    media = synthesize_media(documents.limit(30), "doc_id", "text")
    frames = frame_sample(media, every_nth=30)
    rows = frames.collect()
    assert all(r["frame_idx"] % 30 == 0 for r in rows)
    n_videos = media.where("kind = 'video'").count()
    assert frames.select("media_id").distinct().count() == n_videos
