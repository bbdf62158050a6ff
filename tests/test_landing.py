"""Download step tests with an injected fake HTTP layer (no network)."""

from __future__ import annotations

import json
import os

import pytest

from etl_building_inspector_spark.sources.landing import (
    download,
    download_paginated,
    fetch_with_retry,
)


def _fake_api(pages: dict[str, dict]):
    calls: list[str] = []

    def fetch(url: str) -> dict:
        calls.append(url)
        if url not in pages:
            return {"features": []}
        return pages[url]

    return fetch, calls


def test_paginated_stops_on_empty_page(tmp_path):
    api = "https://x/api/consolidated"
    fetch, calls = _fake_api(
        {
            f"{api}/page/1": {"features": [{"a": 1}, {"a": 2}]},
            f"{api}/page/2": {"features": [{"a": 3}]},
            # page/3 missing -> {"features": []} -> stop
        }
    )
    out = tmp_path / "c.jsonl"
    n = download_paginated(api, str(out), fetch, sleep_s=0)
    assert n == 3
    assert [json.loads(x)["a"] for x in out.read_text().splitlines()] == [1, 2, 3]
    assert calls == [f"{api}/page/1", f"{api}/page/2", f"{api}/page/3"]


def test_retry_then_success():
    attempts = []

    def flaky(url):
        attempts.append(url)
        if len(attempts) < 3:
            raise OSError("boom")
        return {"features": []}

    doc = fetch_with_retry("u", flaky, retries=5, backoff_s=0)
    assert doc == {"features": []} and len(attempts) == 3


def test_retry_exhaustion():
    def dead(url):
        raise OSError("down")

    with pytest.raises(RuntimeError, match="after 3 attempts"):
        fetch_with_retry("u", dead, retries=2, backoff_s=0)


def test_download_idempotent(tmp_path):
    api = "https://x/api"
    fetch, calls = _fake_api(
        {
            f"{api}/consolidated/page/1": {"features": [{"a": 1}]},
            f"{api}/toponyms": {"features": [{"t": 1}]},
            f"{api}/sheets": {"features": [{"s": 1}]},
        }
    )
    paths = download(str(tmp_path), api, fetch, sleep_s=0)
    assert {os.path.basename(p) for p in paths.values()} == {
        "consolidated.jsonl",
        "toponyms.jsonl",
        "sheets.jsonl",
    }
    n_calls = len(calls)
    # second run: .done markers short-circuit every dataset
    download(str(tmp_path), api, fetch, sleep_s=0)
    assert len(calls) == n_calls
