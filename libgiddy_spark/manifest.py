"""Checkpointed JSON-lines manifest: per-partition lineage, codec-choice
metrics, resumability (BASELINE.json:6,14).

Commit protocol (SURVEY.md §7 M4): block files for a chunk of partitions
are written to a temp directory and atomically renamed into place, THEN
one manifest line per partition is appended (write-to-temp + append +
fsync). A line with ``status: done`` is the commit point — on restart,
partitions with committed lines are skipped without re-encoding
(left-anti semantics); a chunk that died mid-write leaves only an
uncommitted temp dir, which resume removes.
"""

from __future__ import annotations

import json
import os
import time


class Manifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "manifest.jsonl")
        os.makedirs(out_dir, exist_ok=True)

    def read(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        entries = []
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    entries.append(json.loads(line))
                except json.JSONDecodeError:
                    # torn tail line from a crash mid-append: ignore —
                    # its chunk never renamed its temp dir, so no data
                    # is orphaned by skipping it
                    continue
        return entries

    def done_parts(self, snapshot_id: str | None = None) -> set[int]:
        """Committed part ids. part_id is a STABLE file identity (see
        file_registry), so by default done-ness carries across snapshot
        ids of the same growing table — an appended snapshot re-encodes
        only its new files. Pass ``snapshot_id`` to scope to one
        snapshot (legacy behavior)."""
        return {
            e["part_id"]
            for e in self.read()
            if e.get("status") == "done"
            and (snapshot_id is None or e.get("snapshot_id") == snapshot_id)
        }

    def file_registry(self) -> dict[str, int]:
        """file identity ("relpath:bytes") -> stable part_id.

        Files are registered in first-seen order with monotonically
        increasing part ids; a file that changes size is a NEW identity
        (re-encoded under a fresh part_id). The registry line is
        appended BEFORE a file's first encode — the durable naming
        commitment that keeps chunk dirs, _PARTS markers, and resume
        consistent across snapshot appends."""
        return {
            e["file_id"]: int(e["part_id"])
            for e in self.read()
            if e.get("kind") == "file"
        }

    def register_files(self, new: list[tuple[str, int, str]]) -> None:
        """Append registry lines: (file_id, part_id, relpath)."""
        self.append(
            [
                {"kind": "file", "file_id": fid, "part_id": pid, "path": rel}
                for fid, pid, rel in new
            ]
        )

    def header(self, snapshot_id: str) -> dict | None:
        for e in self.read():
            if e.get("kind") == "snapshot" and e.get("snapshot_id") == snapshot_id:
                return e
        return None

    def append(self, entries: list[dict]) -> None:
        payload = "".join(
            json.dumps(e, separators=(",", ":"), sort_keys=True) + "\n"
            for e in entries
        )
        with open(self.path, "a") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())

    def write_snapshot_header(
        self, snapshot_id: str, source_path: str, files: list[dict], num_parts: int
    ) -> None:
        if self.header(snapshot_id) is not None:
            return
        self.append(
            [
                {
                    "kind": "snapshot",
                    "snapshot_id": snapshot_id,
                    "source_path": source_path,
                    "num_parts": num_parts,
                    "files": files,
                    "ts": time.time(),
                }
            ]
        )

    def mark_done(self, snapshot_id: str, part_entries: list[dict]) -> None:
        for e in part_entries:
            e.setdefault("kind", "part")
            e.setdefault("status", "done")
            e["snapshot_id"] = snapshot_id
            e.setdefault("ts", time.time())
        self.append(part_entries)
