"""HTTP API round-trip (reference tests/test_api.py:246 pattern):
browse the registry, submit an async project query, poll status, fetch
result data."""

from __future__ import annotations

import json
import time
import urllib.request

import pytest

from dsgrid_spark.api import serve
from dsgrid_spark.query.project import ProjectConfig, SupplementalDimensionModel
from dsgrid_spark.registry.store import RegistryStore


def _get(base, path):
    with urllib.request.urlopen(base + path) as r:
        return r.status, json.loads(r.read())


def _post(base, path, payload):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


@pytest.fixture()
def server(spark, tmp_path):
    store = RegistryStore(tmp_path / "reg", spark)
    store.register_dataset("load", spark.createDataFrame(
        [("06037", 1.0), ("06073", 2.0), ("08031", 4.0)],
        "geography string, value double"))
    store.register_dimension("geography", spark.createDataFrame(
        [("06037", "LA"), ("06073", "SD"), ("08031", "Denver")],
        "id string, name string"))
    store.register_mapping("county_to_state", spark.createDataFrame(
        [("06037", "CA", 1.0), ("06073", "CA", 1.0), ("08031", "CO", 1.0)],
        "from_id string, to_id string, from_fraction double"),
        from_dimension="county", to_dimension="state",
        mapping_type="many_to_one_aggregation")
    store.register_project(ProjectConfig(
        project_id="demo",
        supplemental_dimensions=[SupplementalDimensionModel(
            name="state", dimension_type="geography",
            mapping="county_to_state")],
    ))
    srv = serve(store, port=0)
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_api_browse(server):
    assert _get(server, "/")[1]["message"].startswith("dsgrid")
    assert _get(server, "/projects")[1] == {"project_ids": ["demo"]}
    assert _get(server, "/projects/demo")[1]["project"]["project_id"] == "demo"
    assert _get(server, "/datasets")[1] == {"dataset_ids": ["load"]}
    ds = _get(server, "/datasets/load")[1]
    assert ds["version"] == "1.0.0" and ds["registration_log"]
    assert _get(server, "/dimensions")[1] == {"dimension_names": ["geography"]}
    recs = _get(server, "/dimensions/geography/records")[1]["records"]
    assert {r["id"] for r in recs} == {"06037", "06073", "08031"}
    assert _get(server, "/mappings")[1] == {"mapping_names": ["county_to_state"]}


def test_api_async_query_roundtrip(server):
    query = {
        "name": "api_q",
        "source_datasets": [{"dataset_id": "load"}],
        "result": {
            "filters": [{"filter_type": "named_dimension",
                         "dimension_name": "state", "record_ids": ["CA"]}],
            "aggregations": [{
                "group_by_columns": [{"dimension_name": "geography"}],
                "aggregation_function": "sum"}],
        },
    }
    status, resp = _post(server, "/queries/projects",
                         {"query": query, "project_id": "demo"})
    assert status == 200
    task_id = resp["async_task_id"]

    deadline = time.time() + 120
    while time.time() < deadline:
        task = _get(server, f"/async_tasks/status/{task_id}")[1]["async_task"]
        if task["status"] in ("complete", "failed"):
            break
        time.sleep(0.5)
    assert task["status"] == "complete", task

    rows = _get(server, f"/async_tasks/data/{task_id}")[1]["data"]
    got = {r["geography"]: r["value"] for r in rows}
    assert got == {"06037": 1.0, "06073": 2.0}

    # data for a nonexistent task 404s; incomplete/failed tasks 422
    try:
        urllib.request.urlopen(server + "/async_tasks/data/9999")
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_api_data_pagination_and_bad_ids(server):
    """Results are served from parquet with a limit — the API never
    materializes the full result on the driver — and non-numeric task ids
    404 instead of 500."""
    query = {
        "name": "api_q_page",
        "source_datasets": [{"dataset_id": "load"}],
        "result": {"aggregations": [{
            "group_by_columns": [{"dimension_name": "geography"}],
            "aggregation_function": "sum"}]},
    }
    status, resp = _post(server, "/queries/projects", {"query": query})
    assert status == 200
    task_id = resp["async_task_id"]
    deadline = time.time() + 120
    while time.time() < deadline:
        task = _get(server, f"/async_tasks/status/{task_id}")[1]["async_task"]
        if task["status"] in ("complete", "failed"):
            break
        time.sleep(0.5)
    assert task["status"] == "complete", task

    full = _get(server, f"/async_tasks/data/{task_id}")[1]
    assert full["n_rows"] == 3 and len(full["data"]) == 3
    assert full["path"]  # clients can read the parquet out-of-band

    page = _get(server, f"/async_tasks/data/{task_id}?limit=1")[1]
    assert len(page["data"]) == 1 and page["n_rows"] == 3

    for path in ("/async_tasks/data/abc", "/async_tasks/status/abc"):
        try:
            urllib.request.urlopen(server + path)
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
