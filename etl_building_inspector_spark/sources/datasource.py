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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

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

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _StreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> "DataSourceWriter":
        return _NdjsonWriter(self.options, schema, overwrite)


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


class _StreamReader(SimpleDataSourceStreamReader):
    """Incremental pagination as a STREAM: the API-as-unbounded-source
    view of reference S1. Offset = number of page files consumed (the
    page sequence is append-only, like the API's page space); each
    micro-batch reads only pages that arrived since the last offset.

    Exactly-once across restarts comes from the offset contract:
    `read` advances and prefetches, `readBetweenOffsets` deterministically
    replays a committed range after recovery (same sorted file list
    slice). At production scale the landing step appends page files to
    object storage and this source tails them; the downstream plan is
    identical to the batch path (from_json + pipeline).
    """

    def __init__(self, options):
        self.pages_dir = options.get("pages_dir")
        if not self.pages_dir:
            raise ValueError("streaming building_inspector needs pages_dir")

    def _files(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self.pages_dir, "page-*.json")))

    @staticmethod
    def _rows(files) -> Iterator[tuple]:
        # iter(list), NOT a generator: the prefetch cache copy.copy()s
        # and pickles the iterator (datasource_internal.getCache), and
        # CPython list_iterators support both while generators support
        # neither
        out = []
        for path in files:
            with open(path) as f:
                doc = json.load(f)
            for feat in doc.get("features") or []:
                out.append((json.dumps(feat, separators=(",", ":")),))
        return iter(out)

    def initialOffset(self) -> dict:
        return {"page_count": 0}

    def read(self, start: dict):
        files = self._files()
        n0 = int(start["page_count"])
        return self._rows(files[n0:]), {"page_count": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        files = self._files()
        return self._rows(files[int(start["page_count"]) : int(end["page_count"])])


class _StagedFile(WriterCommitMessage):
    def __init__(self, staged: str, final: str, rows: int):
        self.staged = staged
        self.final = final
        self.rows = rows


class _NdjsonWriter(DataSourceWriter):
    """NDJSON sink with TWO-PHASE COMMIT -- the reference's S9 record
    sink (building-inspector.js:265-268) re-expressed with the commit
    discipline a distributed writer needs. Each task streams its rows
    to `path/_staging/<uuid>.ndjson` and returns a commit message; the
    driver's commit() renames every staged file into place and stamps
    _SUCCESS, abort() deletes the staging leftovers. A task that fails
    (or a speculative duplicate attempt) therefore never publishes
    partial output -- readers only ever see files the commit renamed.

    DEPLOYMENT SCOPE: staging uses executor-local os.makedirs/open and
    the driver renames with os.replace, which requires driver and
    executors to SHARE a filesystem (local mode / NFS -- this repo's
    target). On a real cluster the staged paths would have to travel
    inside the commit messages (or the sink write to an object store);
    the two-phase protocol itself is deployment-agnostic, only the
    staging transport here is shared-FS.

    Rows serialize as JSON objects of the input schema (default=str
    covers date/timestamp), so any DataFrame can use
    .write.format('building_inspector') -- the writer twin of the raw
    `value string` reader above."""

    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("building_inspector writer needs path")
        self.schema = schema
        self.overwrite = overwrite
        self.fields = [f.name for f in schema.fields]

    def write(self, iterator) -> _StagedFile:
        import uuid

        name = f"part-{uuid.uuid4().hex}.ndjson"
        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        staged = os.path.join(staging, name)
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                obj = {k: v for k, v in zip(self.fields, row)}
                f.write(json.dumps(obj, separators=(",", ":"), default=str))
                f.write("\n")
                n += 1
        return _StagedFile(staged, os.path.join(self.path, name), n)

    def commit(self, messages) -> None:
        import shutil

        total = 0
        marker = os.path.join(self.path, "_SUCCESS")
        if self.overwrite:
            for old in glob.glob(os.path.join(self.path, "part-*.ndjson")):
                os.remove(old)
        elif os.path.exists(marker):
            # append mode: the marker is the directory's TOTAL row
            # count, so carry the prior committed total forward. A
            # foreign or corrupt marker counts as 0 rather than
            # failing every future append to the directory.
            try:
                with open(marker) as f:
                    total = int(f.read() or 0)
            except (ValueError, OSError):
                total = 0
        for m in messages:
            os.replace(m.staged, m.final)
            total += m.rows
        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)
        # write-then-rename: truncate-in-place could leave a torn
        # marker on a crash, at odds with the two-phase discipline
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(total))
        os.replace(tmp, marker)

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)


def register(spark) -> None:
    """Idempotent registration; ships the package to Python workers
    first (the datasource class is pickled by reference)."""
    from .._dist import ensure_workers_can_import

    ensure_workers_can_import(spark)
    spark.dataSource.register(BuildingInspectorDataSource)
