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


def _png_bytes(w: int, h: int) -> bytes:
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + b"\x08\x02\x00\x00\x00"
    return (
        b"\x89PNG\r\n\x1a\n"
        + len(ihdr).to_bytes(4, "big")
        + b"IHDR"
        + ihdr
        + b"\x00\x00\x00\x00"
    )


def _gif_bytes(w: int, h: int) -> bytes:
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00" * 4


def _jpeg_bytes(w: int, h: int) -> bytes:
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0"
        + (17).to_bytes(2, "big")
        + b"\x08"
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + b"\x03" + b"\x00" * 9
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_parse_image_header_kernel_pure():
    """Header parsing needs NO codec: real container bytes for all
    three formats, plus malformed blobs that must degrade to an error
    column instead of raising."""
    from etl_building_inspector_spark.operators.multimodal import (
        parse_image_header,
    )

    assert parse_image_header(_png_bytes(640, 480)) == ("png", 640, 480, None)
    assert parse_image_header(_gif_bytes(13, 7)) == ("gif", 13, 7, None)
    assert parse_image_header(_jpeg_bytes(320, 200)) == ("jpeg", 320, 200, None)
    fmt, w, h, err = parse_image_header(b"not an image at all")
    assert (fmt, w, h) == (None, None, None) and err
    fmt, w, h, err = parse_image_header(b"\x89PNG\r\n\x1a\nXXXX")
    assert fmt == "png" and err


def test_parse_jpeg_fill_bytes_and_standalone_markers():
    """ITU T.81 B.1.1.2: markers may be preceded by any number of 0xFF
    fill bytes, and TEM (0x01) / RSTn (0xD0-0xD7) carry no length
    field. Both used to desync the SOF scan (bogus seg_len read)."""
    from etl_building_inspector_spark.operators.multimodal import (
        parse_image_header,
    )

    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0"
        + (17).to_bytes(2, "big")
        + b"\x08"
        + (99).to_bytes(2, "big")
        + (77).to_bytes(2, "big")
        + b"\x03" + b"\x00" * 9
    )
    # fill bytes before the SOF marker
    filled = b"\xff\xd8" + app0 + b"\xff\xff\xff" + sof0 + b"\xff\xd9"
    assert parse_image_header(filled) == ("jpeg", 77, 99, None)
    # standalone TEM and RST1 markers (no length) before the SOF
    standalone = b"\xff\xd8" + b"\xff\x01" + b"\xff\xd1" + app0 + sof0 + b"\xff\xd9"
    assert parse_image_header(standalone) == ("jpeg", 77, 99, None)


def test_kmeans_fit_empty_input_raises_clearly(spark):
    import pytest

    from etl_building_inspector_spark.operators.similarity import kmeans_fit

    empty = spark.createDataFrame([], "id long, emb array<double>")
    with pytest.raises(ValueError, match="empty input"):
        kmeans_fit(empty, "emb", "id", k=2, rounds=1)


def test_sniff_image_headers_distributed(spark):
    """The mapInPandas wrapper ships real header bytes through the
    media struct and returns per-key dimensions."""
    from pyspark.sql import functions as F

    from etl_building_inspector_spark.operators.multimodal import (
        sniff_image_headers,
    )

    rows = [
        (1, _png_bytes(100, 50)),
        (2, _gif_bytes(8, 9)),
        (3, _jpeg_bytes(64, 32)),
        (4, b"garbage"),
    ]
    df = spark.createDataFrame(rows, "key long, raw binary").select(
        "key",
        F.struct(
            F.col("raw").alias("bytes"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("media"),
    )
    got = {
        r["key"]: (r["format"], r["width"], r["height"])
        for r in sniff_image_headers(df).collect()
    }
    assert got == {
        1: ("png", 100, 50),
        2: ("gif", 8, 9),
        3: ("jpeg", 64, 32),
        4: (None, None, None),
    }


def test_audio_energy_windows_kernel(spark):
    """Exact window energies including the partial trailing window:
    recompute one blob's energies in plain python against the Arrow
    kernel's output."""
    from etl_building_inspector_spark.operators.multimodal import (
        audio_energy_windows,
    )

    payload = b"abcdefghijklmnopQRSTUVWXYZ012345xyz"  # 35 bytes: 2 full + 3
    df = spark.createDataFrame([(7, payload)], "key long, bytes binary").select(
        "key",
        F.struct(
            F.col("bytes"),
            F.lit("audio/pcm").alias("mime"),
            F.struct(
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("int").alias("duration_ms"),
            ).alias("meta"),
        ).alias("media"),
    )
    rows = {r.win_idx: r for r in audio_energy_windows(df, window_bytes=16).collect()}
    assert set(rows) == {0, 1, 2}
    for w in range(3):
        seg = payload[w * 16 : (w + 1) * 16]
        assert rows[w].n_bytes == len(seg)
        assert rows[w].energy == sum(b * b for b in seg)


def test_audio_energy_empty_padding_single_window(spark):
    """A blob shorter than one window still yields exactly one row."""
    from etl_building_inspector_spark.operators.multimodal import (
        audio_energy_windows,
    )

    df = spark.createDataFrame([(1, b"ab")], "key long, bytes binary").select(
        "key",
        F.struct(
            F.col("bytes"),
            F.lit("audio/pcm").alias("mime"),
            F.struct(
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("int").alias("duration_ms"),
            ).alias("meta"),
        ).alias("media"),
    )
    out = audio_energy_windows(df, window_bytes=16).collect()
    assert len(out) == 1
    assert out[0].n_bytes == 2 and out[0].energy == 97 * 97 + 98 * 98


def test_image_ahash_kernel_exact(spark):
    """aHash bits recomputed in plain python against the Arrow kernel:
    bit i set iff byte_i * 64 > sum(bytes), halves split at bit 32."""
    from etl_building_inspector_spark.operators.multimodal import image_ahash

    payload = bytes(range(64))  # strictly increasing: top half brighter
    df = spark.createDataFrame([(3, payload)], "key long, bytes binary").select(
        "key",
        F.struct(
            F.col("bytes"),
            F.lit("image/gray8").alias("mime"),
            F.struct(
                F.lit(8).cast("int").alias("width"),
                F.lit(8).cast("int").alias("height"),
                F.lit(None).cast("int").alias("duration_ms"),
            ).alias("meta"),
        ).alias("media"),
    )
    row = image_ahash(df).collect()[0]
    total = sum(payload)
    lo = sum(1 << i for i in range(32) if payload[i] * 64 > total)
    hi = sum(1 << (i - 32) for i in range(32, 64) if payload[i] * 64 > total)
    assert (row.h_lo, row.h_hi) == (lo, hi)
