"""Python DataSource V2 for the Building Inspector API (reference S1
at scale -- SURVEY section 2.1 maps the paginated REST source to
`spark.dataSource.register`).

Two modes, selected by options:

  pages_dir=<dir>   read pre-landed page files (page-*.json, each one
                    API page document) with ONE INPUT PARTITION PER
                    PAGE -- parallel, retry-free, the replayable path
                    and the only one tests use (no network).
  base_url=<url>    live sequential pagination in a single partition
                    (the stop condition depends on page n, so the scan
                    is inherently serial -- same as the reference's
                    do-while loop, building-inspector.js:58-78). Task
                    retries give page-level retry for free.

Rows are raw feature JSON strings (`value string`); downstream applies
the typed schemas from sources/geojson.py with from_json. Emitting raw
text keeps the source schema-stable while the API evolves.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

FORMAT_NAME = "building_inspector"


class _PagePartition(InputPartition):
    def __init__(self, value):
        self.value = value


class BuildingInspectorDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return "value string"

    def reader(self, schema) -> DataSourceReader:
        return _Reader(self.options)


class _Reader(DataSourceReader):
    def __init__(self, options):
        self.pages_dir = options.get("pages_dir")
        self.base_url = options.get("base_url")
        self.sleep_s = float(options.get("sleep_s", "1.0"))
        if not self.pages_dir and not self.base_url:
            raise ValueError("building_inspector source needs pages_dir or base_url")

    def partitions(self):
        if self.pages_dir:
            files = sorted(glob.glob(os.path.join(self.pages_dir, "page-*.json")))
            return [_PagePartition(f) for f in files]
        return [_PagePartition(None)]  # live mode: one sequential scan

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        if self.pages_dir:
            if partition is None:  # zero page files -> Spark passes None
                return
            with open(partition.value) as f:
                doc = json.load(f)
            for feat in doc.get("features") or []:
                yield (json.dumps(feat, separators=(",", ":")),)
            return
        # live sequential pagination (driver-parity semantics)
        import time

        from .landing import fetch_with_retry

        page = 1
        while True:
            doc = fetch_with_retry(f"{self.base_url}/page/{page}")
            feats = doc.get("features") or []
            if not feats:
                return
            for feat in feats:
                yield (json.dumps(feat, separators=(",", ":")),)
            page += 1
            time.sleep(self.sleep_s)


def register(spark) -> None:
    """Idempotent registration; ships the package to Python workers
    first (the datasource class is pickled by reference)."""
    from .._dist import ensure_workers_can_import

    ensure_workers_can_import(spark)
    spark.dataSource.register(BuildingInspectorDataSource)
