"""End-to-end multimodal pipeline: payload -> metadata -> exact dedup
by content hash -> featurize -> near-dup by feature equality."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_project_spark.multimodal.binary_ops import (
    attach_media_metadata,
    decode_and_featurize,
    sample_frames,
    target_partitions,
)


def _media(spark):
    rows = [
        ("m1", "image/png", bytearray(b"payload-A" * 100)),
        ("m2", "image/png", bytearray(b"payload-A" * 100)),  # exact dup of m1
        ("m3", "video/mp4", bytearray(b"payload-B" * 700)),
        ("m4", "audio/wav", None),  # corrupt/missing payload
    ]
    return spark.createDataFrame(
        rows, "media_id string, mime string, payload binary"
    )


def test_metadata_dedup_featurize_chain(spark):
    media = attach_media_metadata(_media(spark))
    # exact dedup on the CONTENT hash (payload bytes never shuffle)
    keep = (
        media.filter(F.col("payload").isNotNull())
        .groupBy("content_sha")
        .agg(F.min("media_id").alias("media_id"))
    )
    deduped = media.join(keep.select("media_id"), "media_id", "left_semi")
    ids = {r["media_id"] for r in deduped.collect()}
    assert ids == {"m1", "m3"}  # m2 collapsed into m1, m4 dropped

    feats = {r["media_id"]: r for r in decode_and_featurize(media).collect()}
    # identical payloads -> identical features; nulls stay null
    assert feats["m1"]["feature"] == feats["m2"]["feature"]
    assert feats["m1"]["feature"] != feats["m3"]["feature"]
    assert feats["m4"]["feature"] is None
    assert feats["m3"]["n_bytes"] == 700 * len(b"payload-B")


def test_frame_sampling_bounds(spark):
    frames = sample_frames(_media(spark), every_n_bytes=1024, max_frames=4)
    by_id = {}
    for r in frames.collect():
        by_id.setdefault(r["media_id"], []).append(r["byte_offset"])
    # 900-byte payload -> 1 frame; 6300-byte -> 4 frames (capped)
    assert len(by_id["m1"]) == 1
    assert len(by_id["m3"]) == 4
    assert by_id["m3"] == [0, 1024, 2048, 3072]


def test_partition_sizing_is_byte_driven(spark):
    assert target_partitions(10 << 30) == 80  # 10 GiB / 128 MiB
    assert target_partitions(1) == 1
