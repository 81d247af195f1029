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
        # chunk-granular summary index (Iceberg manifest-list analogue):
        # one line per committed CHUNK (part-id list + aggregated key
        # ranges) instead of one per part, so a pruned decode's driver
        # work is O(chunks), not O(parts). The index is a derived CACHE
        # over manifest.jsonl — each line records the manifest byte size
        # it covers ("mend"), and readers fall back to parsing only the
        # manifest TAIL past the last covered offset (or the whole file
        # when the index is absent), so a crash between the two appends
        # can never lose rows.
        self.index_path = os.path.join(out_dir, "manifest.chunks.jsonl")
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
        # slim copy in the chunk index (no files list): time travel's
        # snapshot ORDER must be recoverable from the index alone, even
        # for snapshots that committed zero chunks
        mend = os.path.getsize(self.path) if os.path.exists(self.path) else 0
        line = json.dumps(
            {"kind": "snapshot", "snapshot_id": snapshot_id, "mend": mend},
            separators=(",", ":"), sort_keys=True,
        )
        with open(self.index_path, "a") as f:
            f.write(line + "\n")
            f.flush()
            os.fsync(f.fileno())

    def mark_done(self, snapshot_id: str, part_entries: list[dict]) -> None:
        for e in part_entries:
            e.setdefault("kind", "part")
            e.setdefault("status", "done")
            e["snapshot_id"] = snapshot_id
            e.setdefault("ts", time.time())
        self.append(part_entries)
        self._append_index_summaries(snapshot_id, part_entries)

    def _append_index_summaries(
        self, snapshot_id: str, part_entries: list[dict]
    ) -> None:
        """One chunk-summary line per chunk_dir present in the batch:
        part-id list + key ranges aggregated over the chunk's parts
        (None if ANY part is unzoned — chunk pruning must over-include,
        exactly like the part-level poisoning rule one level down)."""
        by_chunk: dict[str, list[dict]] = {}
        for e in part_entries:
            if e.get("chunk_dir"):
                by_chunk.setdefault(e["chunk_dir"], []).append(e)
        if not by_chunk:
            return
        mend = os.path.getsize(self.path) if os.path.exists(self.path) else 0
        lines = []
        for cdir, parts in sorted(by_chunk.items()):
            def _agg(lo_key: str, hi_key: str):
                los = [p.get(lo_key) for p in parts]
                his = [p.get(hi_key) for p in parts]
                if any(v is None for v in los) or any(v is None for v in his):
                    return None, None
                return min(los), max(his)

            klo, khi = _agg("key_lo", "key_hi")
            klo_s, khi_s = _agg("key_lo_s", "key_hi_s")
            lines.append(
                {
                    "kind": "chunk",
                    "chunk_dir": cdir,
                    "snapshot_id": snapshot_id,
                    "parts": sorted(int(p["part_id"]) for p in parts),
                    "key_lo": klo,
                    "key_hi": khi,
                    "key_lo_s": klo_s,
                    "key_hi_s": khi_s,
                    "mend": mend,
                }
            )
        payload = "".join(
            json.dumps(e, separators=(",", ":"), sort_keys=True) + "\n"
            for e in lines
        )
        with open(self.index_path, "a") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())

    def append_rewrite(
        self, snapshot_id: str, new_chunk: str | None, replaces: list[str]
    ) -> None:
        """Record a COMPACTION rewrite: ``new_chunk`` physically replaces
        the block files of ``replaces`` (same rows, fewer files). The
        entry is appended to the manifest AND the chunk index; readers
        apply rewrites in order, so time travel to a snapshot before
        ``snapshot_id`` still lists the original dirs (until vacuum
        physically removes them — the Iceberg rewrite/expire split).
        ``new_chunk=None`` RETIRES the replaced dirs outright (used by
        purge, whose replacement chunks carry their own part entries)."""
        entry = {
            "kind": "rewrite",
            "snapshot_id": snapshot_id,
            "new_chunk": new_chunk,
            "replaces": sorted(replaces),
            "ts": time.time(),
        }
        self.append([entry])
        mend = os.path.getsize(self.path) if os.path.exists(self.path) else 0
        line = json.dumps({**entry, "mend": mend},
                          separators=(",", ":"), sort_keys=True)
        with open(self.index_path, "a") as f:
            f.write(line + "\n")
            f.flush()
            os.fsync(f.fileno())

    def append_delete(
        self, snapshot_id: str, rel_file: str, key_col: str, n: int
    ) -> None:
        """Record an EQUALITY-DELETE file (Iceberg merge-on-read):
        ``rel_file`` (under out_dir) holds the deleted key values;
        decode anti-joins them at read time. Appended to manifest AND
        index so the O(chunks) listing path sees deletes too."""
        entry = {
            "kind": "delete",
            "snapshot_id": snapshot_id,
            "file": rel_file,
            "key_col": key_col,
            "n": int(n),
            "ts": time.time(),
        }
        self.append([entry])
        mend = os.path.getsize(self.path) if os.path.exists(self.path) else 0
        line = json.dumps({**entry, "mend": mend},
                          separators=(",", ":"), sort_keys=True)
        with open(self.index_path, "a") as f:
            f.write(line + "\n")
            f.flush()
            os.fsync(f.fileno())

    def append_delete_clear(
        self, snapshot_id: str, files: list[str]
    ) -> None:
        """Record that a purge rewrite MATERIALIZED these delete files:
        reads at/after ``snapshot_id`` skip them (the rows are gone from
        the data); time travel before it still applies them. Written to
        manifest AND index (index-only readers must see clears, or a
        vacuumed delete file would fail their reads)."""
        entry = {
            "kind": "delete_clear",
            "snapshot_id": snapshot_id,
            "files": sorted(files),
            "ts": time.time(),
        }
        self.append([entry])
        mend = os.path.getsize(self.path) if os.path.exists(self.path) else 0
        line = json.dumps({**entry, "mend": mend},
                          separators=(",", ":"), sort_keys=True)
        with open(self.index_path, "a") as f:
            f.write(line + "\n")
            f.flush()
            os.fsync(f.fileno())

    def read_index(self) -> tuple[list[dict], int] | None:
        """(index entries, covered manifest bytes) or None when the
        index file doesn't exist (pre-upgrade manifests). ``covered``
        is the LAST line's mend — readers must parse the manifest tail
        beyond it (chunks committed after a crash between the two
        appends, plus snapshot headers / registry lines, live there)."""
        if not os.path.exists(self.index_path):
            return None
        entries: list[dict] = []
        covered = 0
        with open(self.index_path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    continue  # torn tail: covered stays at prior line
                entries.append(e)
                covered = max(covered, int(e.get("mend", 0)))
        return entries, covered

    def read_tail(self, offset: int) -> list[dict]:
        """Manifest entries whose lines start at/after byte ``offset``."""
        if not os.path.exists(self.path):
            return []
        entries = []
        with open(self.path) as f:
            f.seek(offset)
            if offset:
                # offset always lands on a line boundary (mend is the
                # file size right after a flushed append), but guard
                # against a concurrent torn write all the same
                pass
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    entries.append(json.loads(line))
                except json.JSONDecodeError:
                    continue
        return entries
