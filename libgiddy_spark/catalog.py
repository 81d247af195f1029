"""Iceberg REST catalog client (the production TableIO backend).

Speaks the public Apache Iceberg REST catalog OpenAPI surface
(`rest-catalog-open-api.yaml` in apache/iceberg):

- ``GET  /v1/config``                                — catalog config
- ``GET  /v1/namespaces/{ns}/tables/{table}``        — LoadTableResult
  (full table-metadata JSON: schemas, snapshot log, current-snapshot-id)
- ``POST /v1/namespaces/{ns}/tables/{table}/plan``   — REST scan
  planning (PlanTableScanResult): the server walks the manifest list /
  manifest files and returns JSON file-scan-tasks, so the client needs
  no Avro reader — the design reason this engine targets the scan-
  planning flavour of the spec. Handles both the synchronous
  ``completed`` result and the asynchronous ``submitted`` + fetch
  ``GET .../plan/{plan-id}`` flow, including ``plan-tasks`` pagination
  via ``POST .../tasks``.

Transport is injected (``transport(method, path, body) -> (status,
json_dict)``); the default is a stdlib ``urllib`` HTTP transport for
production, and tests replay RECORDED request/response fixtures
(tests/fixtures/rest_catalog) through the same client code — snapshot
resolution and scan planning execute byte-for-byte as against a live
catalog, no Iceberg runtime jar required.

:class:`IcebergSnapshotSource` adapts a catalog table to the TableIO
listing protocol (``list_files() -> [(uri, bytes)]``,
``snapshot_id()``), which is all :func:`engine.encode_files` needs —
partition = data file holds for Iceberg tables exactly as for
directories.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request


class CatalogError(RuntimeError):
    pass


def http_transport(base_uri: str, token: str | None = None):
    """Production transport: JSON over HTTP against ``base_uri``."""
    base = base_uri.rstrip("/")

    def call(method: str, path: str, body: dict | None = None):
        req = urllib.request.Request(
            base + path,
            method=method,
            data=None if body is None else json.dumps(body).encode(),
            headers={
                "Content-Type": "application/json",
                **({"Authorization": f"Bearer {token}"} if token else {}),
            },
        )
        try:
            with urllib.request.urlopen(req) as resp:  # noqa: S310 (catalog URI is operator-supplied)
                return resp.status, json.loads(resp.read() or b"{}")
        except urllib.error.HTTPError as e:
            # urlopen RAISES on non-2xx — fold it back into the
            # (status, body) contract so the client's status-code
            # branches (404 -> CatalogError etc.) run on the real
            # path exactly as they do under the test transports
            try:
                body = json.loads(e.read() or b"{}")
            except Exception:
                body = {}
            return e.code, body

    return call


class RestCatalog:
    """Minimal-yet-real Iceberg REST catalog client (read path)."""

    PLAN_MAX_POLLS = 20       # async scan planning: poll budget
    PLAN_POLL_SECS = 0.25     # base backoff (linear: k * base)

    def __init__(self, transport, prefix: str | None = None):
        self._call = transport
        if prefix is None:
            status, cfg = self._call("GET", "/v1/config", None)
            if status != 200:
                raise CatalogError(f"GET /v1/config -> {status}")
            prefix = (cfg.get("overrides", {}).get("prefix")
                      or cfg.get("defaults", {}).get("prefix") or "")
        self._p = f"/{prefix.strip('/')}" if prefix else ""

    def _table_path(self, ns: str, table: str) -> str:
        return f"/v1{self._p}/namespaces/{ns}/tables/{table}"

    def load_table(self, ns: str, table: str) -> dict:
        """LoadTableResult's ``metadata`` (table-metadata JSON)."""
        status, res = self._call("GET", self._table_path(ns, table), None)
        if status == 404:
            raise CatalogError(f"table {ns}.{table} not found")
        if status != 200:
            raise CatalogError(
                f"GET {self._table_path(ns, table)} -> {status}")
        md = res.get("metadata")
        if not isinstance(md, dict):
            raise CatalogError("LoadTableResult without metadata")
        return md

    def current_snapshot(self, ns: str, table: str,
                         snapshot_id: int | None = None) -> dict:
        """Resolve ``snapshot_id`` (None = current) from the metadata's
        snapshot list — the time-travel entry point."""
        md = self.load_table(ns, table)
        sid = snapshot_id if snapshot_id is not None \
            else md.get("current-snapshot-id")
        if sid in (None, -1):
            raise CatalogError(f"table {ns}.{table} has no snapshots")
        for s in md.get("snapshots", ()):
            if s.get("snapshot-id") == sid:
                return s
        raise CatalogError(
            f"snapshot {sid} not in {ns}.{table} metadata")

    def plan_files(self, ns: str, table: str,
                   snapshot_id: int | None = None) -> list[tuple[str, int]]:
        """(data file URI, size bytes) for the snapshot, via REST scan
        planning. Sorted, deduplicated — the stable listing the
        engine's file-registry part ids key on."""
        snap = self.current_snapshot(ns, table, snapshot_id)
        body = {"snapshot-id": snap["snapshot-id"]}
        status, res = self._call(
            "POST", self._table_path(ns, table) + "/plan", body)
        if status != 200:
            raise CatalogError(f"plan -> {status}")
        files: list[tuple[str, int]] = []
        self._collect_tasks(res, files)
        st = res.get("status")
        if st == "submitted":
            # async planning: the spec says clients POLL the plan id
            # until it completes — a single fetch would fail on any
            # table large enough to plan asynchronously
            plan_id = res.get("plan-id")
            res2: dict = {}
            for attempt in range(self.PLAN_MAX_POLLS):
                status, res2 = self._call(
                    "GET",
                    self._table_path(ns, table) + f"/plan/{plan_id}",
                    None)
                if status != 200:
                    raise CatalogError(f"plan {plan_id} -> {status}")
                if res2.get("status") == "completed":
                    break
                if res2.get("status") not in ("submitted", "running"):
                    raise CatalogError(
                        f"plan {plan_id} -> {res2.get('status')}")
                time.sleep(self.PLAN_POLL_SECS * (attempt + 1))
            else:
                raise CatalogError(
                    f"plan {plan_id} still not completed after "
                    f"{self.PLAN_MAX_POLLS} polls")
            self._collect_tasks(res2, files)
            res = res2
        elif st not in ("completed", None):
            raise CatalogError(f"plan status {st!r}")
        for pt in res.get("plan-tasks", ()):
            status, page = self._call(
                "POST", self._table_path(ns, table) + "/tasks",
                {"plan-task": pt})
            if status != 200:
                raise CatalogError(f"tasks page -> {status}")
            self._collect_tasks(page, files)
        return sorted(set(files))

    @staticmethod
    def _collect_tasks(res: dict, out: list[tuple[str, int]]) -> None:
        for t in res.get("file-scan-tasks", ()):
            df = t.get("data-file", {})
            if df.get("content", "data") != "data":
                continue
            out.append((df["file-path"],
                        int(df.get("file-size-in-bytes", 0))))


class IcebergSnapshotSource:
    """TableIO-protocol adapter: a catalog table as an encode source."""

    def __init__(self, catalog: RestCatalog, ns: str, table: str,
                 snapshot_id: int | None = None):
        self._c, self._ns, self._t = catalog, ns, table
        self._sid = snapshot_id

    def list_files(self) -> list[tuple[str, int]]:
        return self._c.plan_files(self._ns, self._t, self._sid)

    def snapshot_id(self) -> str:
        snap = self._c.current_snapshot(self._ns, self._t, self._sid)
        return f"iceberg-{snap['snapshot-id']}"
