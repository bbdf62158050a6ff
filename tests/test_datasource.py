"""Python DataSource V2 tests (pages_dir mode -- no network)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from etl_building_inspector_spark.sources.datasource import FORMAT_NAME, register


def _write_pages(d, n_pages=3, feats_per_page=4):
    for p in range(1, n_pages + 1):
        doc = {
            "features": [
                {"type": "Feature", "properties": {"id": p * 100 + i}}
                for i in range(feats_per_page)
            ]
        }
        (d / f"page-{p}.json").write_text(json.dumps(doc))


def test_datasource_reads_pages_in_parallel_partitions(spark, tmp_path):
    _write_pages(tmp_path)
    register(spark)
    df = (
        spark.read.format(FORMAT_NAME)
        .option("pages_dir", str(tmp_path))
        .load()
    )
    assert df.columns == ["value"]
    # one input partition per page file
    assert df.rdd.getNumPartitions() == 3
    ids = sorted(
        json.loads(r.value)["properties"]["id"] for r in df.collect()
    )
    assert len(ids) == 12 and ids[0] == 100 and ids[-1] == 303

    # downstream typed parse composes (the geojson.py contract)
    parsed = df.select(
        F.get_json_object("value", "$.properties.id").cast("long").alias("id")
    )
    assert parsed.agg(F.sum("id")).collect()[0][0] == sum(ids)


def test_datasource_empty_dir(spark, tmp_path):
    register(spark)
    df = (
        spark.read.format(FORMAT_NAME)
        .option("pages_dir", str(tmp_path))
        .load()
    )
    assert df.count() == 0


def test_datasource_streaming_incremental_pages(spark, tmp_path):
    """simpleStreamReader: pages arriving between micro-batches are
    read exactly once (offset = consumed page count); already-consumed
    pages are never re-emitted."""
    _write_pages(tmp_path, n_pages=2, feats_per_page=3)
    register(spark)
    stream = (
        spark.readStream.format(FORMAT_NAME)
        .option("pages_dir", str(tmp_path))
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("bi_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        n1 = spark.sql("SELECT count(*) n FROM bi_stream").collect()[0].n
        assert n1 == 6  # pages 1-2
        # a new page lands (the API grew)
        doc = {
            "features": [
                {"type": "Feature", "properties": {"id": 300 + i}}
                for i in range(3)
            ]
        }
        (tmp_path / "page-3.json").write_text(json.dumps(doc))
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT value FROM bi_stream").collect()
    ids = sorted(json.loads(r.value)["properties"]["id"] for r in rows)
    assert len(ids) == 9  # no re-emission of pages 1-2
    assert ids[-3:] == [300, 301, 302]


def test_ndjson_writer_two_phase_commit(spark, tmp_path_factory):
    """DSv2 writer: rows land as NDJSON only after commit (staged files
    renamed, _SUCCESS stamped, staging dir gone); overwrite replaces
    prior parts; roundtrip through spark.read.json is lossless."""
    import glob as g
    import json as j
    import os

    from etl_building_inspector_spark.sources.datasource import register

    register(spark)
    out = str(tmp_path_factory.mktemp("dsv2w")) + "/sink"
    df = spark.range(100).selectExpr(
        "id", "concat('rec-', id) AS name", "id * 2 AS double_id"
    )
    df.write.format("building_inspector").mode("append").save(out)

    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not os.path.exists(os.path.join(out, "_staging"))
    parts = g.glob(os.path.join(out, "part-*.ndjson"))
    assert parts
    rows = []
    for p in parts:
        with open(p) as f:
            rows += [j.loads(line) for line in f if line.strip()]
    assert len(rows) == 100
    assert {r["id"] for r in rows} == set(range(100))
    assert all(r["double_id"] == r["id"] * 2 for r in rows)
    with open(os.path.join(out, "_SUCCESS")) as f:
        assert f.read() == "100"

    # overwrite mode replaces previous parts
    spark.range(7).selectExpr(
        "id", "'x' AS name", "id AS double_id"
    ).write.format("building_inspector").mode("overwrite").save(out)
    rows2 = []
    for p in g.glob(os.path.join(out, "part-*.ndjson")):
        with open(p) as f:
            rows2 += [j.loads(line) for line in f if line.strip()]
    assert len(rows2) == 7

    # readable back by the stock json reader
    back = spark.read.json(out)
    assert back.count() == 7
