"""HTTP API: async project queries + registry browsing over plain stdlib.

Thin wrapper over RegistryStore + QuerySubmitter mirroring the reference
API surface (dsgrid/api/app.py:104-340, models dsgrid/api/models.py):

- ``GET  /``                          — liveness
- ``GET  /projects``                  — list registered project ids
- ``GET  /projects/<id>``             — ProjectConfig JSON
- ``GET  /datasets`` ``/datasets/<id>``
- ``GET  /dimensions`` ``/dimensions/<name>/records``
- ``GET  /mappings``
- ``POST /queries/projects``          — body {"query": ProjectQueryModel,
  "project_id": optional} → {"async_task_id": N}; runs in a background
  thread (the reference uses FastAPI BackgroundTasks + spark-submit; one
  long-lived SparkSession makes a thread sufficient — Spark schedules
  concurrent jobs from multiple driver threads natively)
- ``GET  /async_tasks/status``        — all tasks
- ``GET  /async_tasks/status/<id>``   — one task
- ``GET  /async_tasks/data/<id>?limit=N`` — first N result rows (default
  1000) of a completed task plus the result parquet path and total row
  count. Results are written to parquet, never materialized onto the
  driver whole: a 10⁹-row query result costs the API process only the
  page it serves; clients wanting everything read the parquet path
  out-of-band.

FastAPI is not available in this runtime; ``http.server`` +
``ThreadingHTTPServer`` keeps the dependency surface at zero while the
request/response JSON matches the reference's shapes where they overlap.
"""

from __future__ import annotations

import json
import threading
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


def _parse_task_id(raw: str) -> int | None:
    try:
        return int(raw)
    except ValueError:
        return None


class AsyncTaskStatus:
    QUEUED = "queued"
    IN_PROGRESS = "in_progress"
    COMPLETE = "complete"
    FAILED = "failed"


class _TaskRegistry:
    def __init__(self):
        self._lock = threading.Lock()
        self._tasks: dict[int, dict] = {}
        self._next = 1

    def create(self) -> int:
        with self._lock:
            task_id = self._next
            self._next += 1
            self._tasks[task_id] = {
                "async_task_id": task_id,
                "status": AsyncTaskStatus.QUEUED,
                "error": None,
            }
            return task_id

    def update(self, task_id: int, **kw) -> None:
        with self._lock:
            self._tasks[task_id].update(kw)

    def get(self, task_id: int) -> dict | None:
        with self._lock:
            t = self._tasks.get(task_id)
            return dict(t) if t else None

    def list(self) -> list[dict]:
        with self._lock:
            return [dict(t) for t in self._tasks.values()]


class DsgridApi:
    """Routes + task execution; transport-agnostic (testable directly)."""

    #: completed results retained (oldest evicted first)
    MAX_RESULTS = 100

    def __init__(self, store, output_dir=None):
        self.store = store
        self.output_dir = output_dir
        self.tasks = _TaskRegistry()
        # task_id -> {"path": parquet dir, "n_rows": total}; bounded
        self._results: dict[int, dict] = {}

    # ---- GET ----------------------------------------------------------
    def get(self, path: str, params: dict | None = None):
        parts = [p for p in path.split("/") if p]
        if not parts:
            return 200, {"message": "dsgrid-spark API"}
        head = parts[0]
        if head == "projects" and len(parts) == 1:
            return 200, {"project_ids": self.store.list_ids("projects")}
        if head == "projects" and len(parts) == 2:
            return 200, {"project": json.loads(
                self.store.load_project(parts[1]).model_dump_json())}
        if head == "datasets" and len(parts) == 1:
            return 200, {"dataset_ids": self.store.list_ids("datasets")}
        if head == "datasets" and len(parts) == 2:
            return 200, {
                "dataset_id": parts[1],
                "version": self.store.latest_version("datasets", parts[1]),
                "registration_log": self.store.log("datasets", parts[1]),
            }
        if head == "dimensions" and len(parts) == 1:
            return 200, {"dimension_names": self.store.list_ids("dimensions")}
        if head == "dimensions" and len(parts) == 3 and parts[2] == "records":
            rows = [r.asDict() for r in self.store.load_dimension(parts[1]).collect()]
            return 200, {"records": rows}
        if head == "mappings" and len(parts) == 1:
            return 200, {"mapping_names": self.store.list_ids("mappings")}
        if head == "async_tasks" and len(parts) >= 2 and parts[1] == "status":
            if len(parts) == 2:
                return 200, {"async_tasks": self.tasks.list()}
            task_id = _parse_task_id(parts[2])
            t = self.tasks.get(task_id) if task_id is not None else None
            return (200, {"async_task": t}) if t else (404, {"detail": "no such task"})
        if head == "async_tasks" and len(parts) == 3 and parts[1] == "data":
            task_id = _parse_task_id(parts[2])
            t = self.tasks.get(task_id) if task_id is not None else None
            if t is None:
                return 404, {"detail": "no such task"}
            if t["status"] != AsyncTaskStatus.COMPLETE:
                return 422, {"detail": f"task is {t['status']}, not complete"}
            result = self._results.get(task_id)
            if result is None:
                return 410, {"detail": "result evicted"}
            try:
                limit = max(0, int((params or {}).get("limit", 1000)))
            except (TypeError, ValueError):
                return 422, {"detail": "limit must be an integer"}
            spark = self.store.load_catalog().spark
            rows = [
                r.asDict(recursive=True)
                for r in spark.read.parquet(result["path"]).limit(limit).collect()
            ]
            return 200, {"data": rows, "n_rows": result["n_rows"],
                         "path": result["path"], "limit": limit}
        return 404, {"detail": f"unknown path {path!r}"}

    # ---- POST ---------------------------------------------------------
    def post(self, path: str, body: dict):
        if path.rstrip("/") == "/queries/projects":
            from dsgrid_spark.query.models import ProjectQueryModel

            query = ProjectQueryModel.model_validate(body["query"])
            project = (self.store.load_project(body["project_id"])
                       if body.get("project_id") else None)
            task_id = self.tasks.create()
            thread = threading.Thread(
                target=self._run_query, args=(task_id, query, project),
                daemon=True,
            )
            thread.start()
            return 200, {"async_task_id": task_id}
        return 404, {"detail": f"unknown path {path!r}"}

    def _run_query(self, task_id: int, query, project) -> None:
        import tempfile
        from pathlib import Path

        from dsgrid_spark.query.submitter import QuerySubmitter

        self.tasks.update(task_id, status=AsyncTaskStatus.IN_PROGRESS)
        try:
            submitter = QuerySubmitter(
                self.store.load_catalog(), output_dir=self.output_dir,
                project=project,
            )
            df = submitter.submit(query)
            base = (Path(self.output_dir) if self.output_dir
                    else Path(tempfile.mkdtemp(prefix="dsgrid_api_")))
            path = str(base / "api_results" / f"task_{task_id}")
            # result goes to parquet, not the driver heap: executors write
            # their partitions in parallel; only requested pages are ever
            # collected (the count() is a cheap metadata-only scan)
            df.write.mode("overwrite").parquet(path)
            n_rows = df.sparkSession.read.parquet(path).count()
            self._results[task_id] = {"path": path, "n_rows": n_rows}
            while len(self._results) > self.MAX_RESULTS:
                self._results.pop(next(iter(self._results)))
            self.tasks.update(task_id, status=AsyncTaskStatus.COMPLETE)
        except Exception as e:  # surfaced through /async_tasks/status
            traceback.print_exc()
            self.tasks.update(task_id, status=AsyncTaskStatus.FAILED,
                              error=str(e))


def serve(store, host: str = "127.0.0.1", port: int = 8000,
          output_dir=None) -> ThreadingHTTPServer:
    """Start the API server (non-blocking); returns the server — call
    ``.shutdown()`` to stop. Pass port=0 for an ephemeral port
    (``server.server_address[1]``)."""
    api = DsgridApi(store, output_dir=output_dir)

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict) -> None:
            data = json.dumps(payload, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):  # noqa: N802 (stdlib naming)
            try:
                parsed = urlparse(self.path)
                params = {k: v[-1] for k, v in parse_qs(parsed.query).items()}
                self._send(*api.get(parsed.path, params))
            except Exception as e:
                self._send(500, {"detail": str(e)})

        def do_POST(self):  # noqa: N802
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                self._send(*api.post(urlparse(self.path).path, body))
            except Exception as e:
                self._send(500, {"detail": str(e)})

        def log_message(self, *args):  # quiet
            pass

    server = ThreadingHTTPServer((host, port), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
