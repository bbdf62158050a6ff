"""Multimodal plumbing tests: binary media columns + mapInPandas
feature extraction (decode stubbed per the environment contract)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from etl_building_inspector_spark.operators.multimodal import (
    decode_image,
    extract_media_features,
    synth_media,
)
from etl_building_inspector_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media_df(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return synth_media(docs, "doc_id")


def test_media_schema(media_df):
    f = dict(media_df.dtypes)["media"]
    assert "bytes:binary" in f.replace(" ", "")
    assert "mime:string" in f.replace(" ", "")


def test_feature_extraction_deterministic(spark, media_df):
    feats = extract_media_features(media_df, "doc_id").collect()
    assert len(feats) == media_df.count()
    by_key = {r.key: r for r in feats}
    # recompute one row's features in plain python
    expected_payload = (
        hashlib.md5(str(0).encode()).hexdigest() * 4
    ).encode()
    assert by_key[0].n_bytes == len(expected_payload)
    assert by_key[0].content_hash == hashlib.md5(expected_payload).hexdigest()
    assert by_key[0].mean_byte == pytest.approx(
        sum(expected_payload) / len(expected_payload)
    )


def test_binary_column_pruned_when_not_selected(media_df):
    # selecting only the key must not carry the binary through the plan
    plan = media_df.select("doc_id")._jdf.queryExecution().optimizedPlan().toString()
    assert "bytes" not in plan


def test_decode_without_codec_is_explicit(media_df):
    from etl_building_inspector_spark.operators.multimodal import HAVE_PIL

    if HAVE_PIL:
        pytest.skip("PIL present: covered by test_decode_image_real_kernel")
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(media_df)


def test_decode_image_real_kernel(spark):
    """Runs only where PIL exists: a real 1-px PNG decodes to its
    dimensions; corrupt bytes land in decode_error instead of failing
    the partition."""
    from etl_building_inspector_spark.operators.multimodal import HAVE_PIL

    if not HAVE_PIL:
        pytest.skip("no PIL in this container")
    import base64

    # minimal valid 1x1 red PNG (public-domain bytes)
    png = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR4nGP4"
        "z8DwHwAFBQIAX8jx0gAAAABJRU5ErkJggg=="
    )
    rows = [(1, (png, "image/png", None)), (2, (b"not a png", "image/png", None))]
    df = spark.createDataFrame(
        rows,
        "key long, media struct<bytes:binary, mime:string, "
        "meta:struct<width:int,height:int,duration_ms:int>>",
    )
    got = {r.key: r for r in decode_image(df).collect()}
    assert (got[1].width, got[1].height) == (1, 1)
    assert got[1].decode_error is None
    assert got[2].width is None and got[2].decode_error is not None


def test_resize_plumbing(spark, media_df):
    """resize: schema contract, 1:1 fan-through, deterministic bytes
    (same inputs -> same output whether the kernel is PIL or the
    content-addressed fake), and bytes being a function of target
    size."""
    from etl_building_inspector_spark.operators.multimodal import (
        resize_image,
    )

    a = resize_image(media_df, 8, 6, key_col="doc_id")
    rows = {r.key: r for r in a.collect()}
    assert len(rows) == media_df.count()
    for r in rows.values():
        assert (r.width, r.height) == (8, 6)
        assert r.resize_error is None
        assert isinstance(r.bytes, (bytes, bytearray)) and len(r.bytes) > 0
    again = {r.key: r for r in resize_image(media_df, 8, 6, key_col="doc_id").collect()}
    assert all(again[k].bytes == rows[k].bytes for k in rows)
    other = {r.key: r for r in resize_image(media_df, 4, 4, key_col="doc_id").collect()}
    assert any(other[k].bytes != rows[k].bytes for k in rows)


def test_sample_frames_fanout(spark, media_df):
    """frame sampling: one row per every_ms instant of duration_ms
    (1->N fan-out), deterministic frame bytes, images (null duration)
    degrade to a single frame."""
    from pyspark.sql import functions as F

    from etl_building_inspector_spark.operators.multimodal import (
        sample_frames,
    )

    vids = media_df.withColumn(
        "media",
        F.col("media").withField(
            "meta.duration_ms",
            (F.col("doc_id") % 3 * 1000 + 2500).cast("int"),
        ),
    )
    out = sample_frames(vids, every_ms=1000, key_col="doc_id")
    per_key = {
        r["key"]: r["n"]
        for r in out.groupBy("key").agg(F.count("*").alias("n")).collect()
    }
    for r in vids.select(F.col("doc_id").alias("key"), "media.meta.duration_ms").collect():
        assert per_key[r.key] == max(1, r.duration_ms // 1000)
    # deterministic + distinct instants
    f = out.filter(F.col("key") == out.first().key).collect()
    assert len({r.ts_ms for r in f}) == len(f)
    # image media (null duration) -> exactly one frame
    one = sample_frames(media_df, every_ms=1000, key_col="doc_id")
    counts = one.groupBy("key").count().collect()
    assert all(r["count"] == 1 for r in counts)
