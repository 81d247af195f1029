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
                    e = json.loads(line)
                except json.JSONDecodeError:
                    # torn tail line from a crash mid-append: ignore —
                    # its chunk never renamed its temp dir, so no data
                    # is orphaned by skipping it
                    continue
                # a txn line is an ATOMIC batch (purge promote+retire):
                # expand in place, order preserved
                if e.get("kind") == "txn":
                    entries.extend(e.get("entries", ()))
                else:
                    entries.append(e)
        return entries

    def done_parts(self, snapshot_id: str | None = None) -> set[int]:
        """Committed part ids. part_id is a STABLE file identity (see
        file_registry), so by default done-ness carries across snapshot
        ids of the same growing table — an appended snapshot re-encodes
        only its new files. Pass ``snapshot_id`` to scope to one
        snapshot (legacy behavior). Parts whose only commit lives in an
        ABORTED WAP snapshot are NOT done — their source files must be
        re-encodable after the failed audit, or the rows would be lost
        forever (skipped as done, yet invisible at HEAD)."""
        entries = self.read()
        aborted = {e.get("snapshot_id") for e in entries
                   if e.get("kind") == "publish" and e.get("abort")}
        return {
            e["part_id"]
            for e in entries
            if e.get("status") == "done"
            and e.get("snapshot_id") not in aborted
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
        self, snapshot_id: str, source_path: str, files: list[dict],
        num_parts: int, staged: bool = False,
    ) -> None:
        """``staged=True`` marks a WAP (write-audit-publish) snapshot:
        its data commits off the main branch — invisible to HEAD reads
        until :meth:`append_publish` fast-forwards it in (Iceberg
        staged-snapshot / cherry-pick pattern). Resuming a staged
        encode keeps the original flag (header written once)."""
        if self.header(snapshot_id) is not None:
            return
        hdr = {
            "kind": "snapshot",
            "snapshot_id": snapshot_id,
            "source_path": source_path,
            "num_parts": num_parts,
            "files": files,
            "ts": time.time(),
        }
        if staged:
            hdr["staged"] = True
        pre = self._msize()
        self.append([hdr])
        post = self._msize()
        self._heal_index(pre)
        # slim copy in the chunk index (no files list): time travel's
        # snapshot ORDER must be recoverable from the index alone, even
        # for snapshots that committed zero chunks. The staged flag MUST
        # ride along or index-path readers would see a staged snapshot
        # as published.
        slim = {"kind": "snapshot", "snapshot_id": snapshot_id, "mend": post}
        if staged:
            slim["staged"] = True
        self._index_write([slim])

    def append_publish(self, snapshot_id: str, abort: bool = False) -> None:
        """PUBLISH a WAP-staged snapshot onto the main branch (or, with
        ``abort=True``, declare it dead so vacuum may sweep its files).
        The snapshot's main-branch position is THIS entry's position —
        Iceberg cherry-pick ordering — so time travel to snapshots
        committed between stage and publish never sees the staged rows.
        Indexed like refs so index-tail readers see branch state."""
        entry = {
            "kind": "publish",
            "snapshot_id": snapshot_id,
            "ts": time.time(),
        }
        if abort:
            entry["abort"] = True
        pre = self._msize()
        self.append([entry])
        post = self._msize()
        self._heal_index(pre)
        self._index_write([{**entry, "mend": post}])

    def append_rollback(self, to_snapshot: str) -> None:
        """Make ``to_snapshot`` the CURRENT snapshot (Iceberg
        rollback_to / set_current_snapshot): HEAD reads rewind to the
        state when it committed; later snapshots stay in history for
        time travel until retention expires them. Indexed like publish
        so index-tail readers see branch state."""
        entry = {
            "kind": "rollback",
            "to": to_snapshot,
            "ts": time.time(),
        }
        pre = self._msize()
        self.append([entry])
        post = self._msize()
        self._heal_index(pre)
        self._index_write([{**entry, "mend": post}])

    def _msize(self) -> int:
        return os.path.getsize(self.path) if os.path.exists(self.path) else 0

    def _index_write(self, lines: list[dict]) -> None:
        if not lines:
            return
        payload = "".join(
            json.dumps(e, separators=(",", ":"), sort_keys=True) + "\n"
            for e in lines
        )
        with open(self.index_path, "a") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())

    def _last_index_mend(self) -> int:
        """mend of the index's last complete line. Tail read with a
        progressively widening window: a purge txn line can exceed any
        fixed window (it carries every chunk summary in one line), and
        a too-small window returning 0 would make the next heal re-read
        and re-index the whole manifest."""
        try:
            size = os.path.getsize(self.index_path)
        except OSError:
            return 0
        if size == 0:
            return 0
        back = 1 << 16
        while True:
            back = min(back, size)
            with open(self.index_path, "rb") as f:
                f.seek(size - back)
                chunk = f.read(back)
            best = 0
            for line in chunk.splitlines():
                try:
                    e = json.loads(line)
                except (json.JSONDecodeError, UnicodeDecodeError):
                    continue
                best = max(best, int(e.get("mend", 0)))
            if best or back == size:
                return best
            back *= 16

    @staticmethod
    def _chunk_summary_lines(
        part_entries: list[dict], mend: int
    ) -> list[dict]:
        """One chunk-summary line per chunk_dir: part-id list + key
        ranges aggregated over the chunk's parts (None if ANY part is
        unzoned — chunk pruning must over-include, exactly like the
        part-level poisoning rule one level down)."""
        by_chunk: dict[str, list[dict]] = {}
        for e in part_entries:
            if e.get("chunk_dir"):
                by_chunk.setdefault(e["chunk_dir"], []).append(e)
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
            cols: set[str] = set()
            part_rows: dict[str, int] = {}
            for p in parts:
                pc = p.get("columns") or {}
                cols.update(pc)
                n = next(
                    (int(c["n_values"]) for c in pc.values()
                     if "n_values" in c), 0,
                )
                part_rows[str(int(p["part_id"]))] = n
            lines.append(
                {
                    "kind": "chunk",
                    "chunk_dir": cdir,
                    "snapshot_id": parts[0].get("snapshot_id"),
                    "parts": sorted(int(p["part_id"]) for p in parts),
                    "key_lo": klo,
                    "key_hi": khi,
                    "key_lo_s": klo_s,
                    "key_hi_s": khi_s,
                    # column union + per-part row counts: lets decode's
                    # schema-evolution pass run off the index instead of
                    # a full O(parts) manifest read
                    "columns": sorted(cols),
                    "part_rows": part_rows,
                    "mend": mend,
                }
            )
        return lines

    _INDEXED_KINDS = ("snapshot", "rewrite", "delete", "delete_clear",
                      "ref", "publish", "rollback", "schema")

    def _heal_index(self, upto: int) -> None:
        """Rescue manifest entries in [last index mend, upto) that never
        got their index line (crash between a manifest append and its
        index append). Without this, the NEXT index append's larger
        mend would cover the orphaned bytes and the index read path
        would silently lose them forever."""
        last = self._last_index_mend()
        if last >= upto:
            return
        span = self.read_tail(last, upto)
        rescued: list[dict] = []
        parts = [
            e for e in span
            if e.get("kind") == "part" and e.get("status") == "done"
        ]
        if parts:
            rescued.extend(self._chunk_summary_lines(parts, upto))
        for e in span:
            if e.get("kind") in self._INDEXED_KINDS:
                if e.get("kind") == "snapshot":
                    slim = {k: v for k, v in e.items()
                            if k not in ("files", "ts")}
                else:
                    slim = dict(e)
                slim["mend"] = upto
                rescued.append(slim)
        self._index_write(rescued)

    def mark_done(
        self, snapshot_id: str, part_entries: list[dict],
        status: str = "done",
    ) -> None:
        """``status="staged"`` commits the part lines WITHOUT making
        them live: invisible to listing/resume (done_parts), no chunk
        index summary, and the resume sweep deletes their dirs — the
        first half of an atomic two-phase commit whose second half is
        one :meth:`commit_txn` line promoting them to done."""
        for e in part_entries:
            e.setdefault("kind", "part")
            e.setdefault("status", status)
            e["snapshot_id"] = snapshot_id
            e.setdefault("ts", time.time())
        pre = self._msize()
        # ONE txn line for the whole chunk: a multi-line append can tear
        # to a PREFIX of part lines (buffered write, crash pre-fsync),
        # and the resume sweep would then delete the chunk dir while the
        # prefix parts stay "done" with no data — silent row loss. A
        # single line tears wholly or not at all.
        self.append([{"kind": "txn", "entries": part_entries,
                      "ts": time.time()}])
        post = self._msize()
        self._heal_index(pre)
        if status == "done":
            self._index_write(self._chunk_summary_lines(part_entries, post))

    def commit_txn(self, entries: list[dict]) -> None:
        """ATOMIC multi-entry commit: all entries land in ONE manifest
        line (kind=txn) — a torn write drops the whole batch, never a
        prefix — and one index line. Used by purge to promote staged
        parts + retire old dirs + clear deletes as a single visible
        state change."""
        pre = self._msize()
        self.append([{"kind": "txn", "entries": entries, "ts": time.time()}])
        post = self._msize()
        self._heal_index(pre)
        parts = [e for e in entries
                 if e.get("kind") == "part" and e.get("status") == "done"]
        idx_entries = self._chunk_summary_lines(parts, post) + [
            e for e in entries if e.get("kind") in self._INDEXED_KINDS
        ]
        self._index_write(
            [{"kind": "txn", "entries": idx_entries, "mend": post}]
        )

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
        pre = self._msize()
        self.append([entry])
        post = self._msize()
        self._heal_index(pre)
        self._index_write([{**entry, "mend": post}])

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
        pre = self._msize()
        self.append([entry])
        post = self._msize()
        self._heal_index(pre)
        self._index_write([{**entry, "mend": post}])

    def append_ref(self, name: str, snapshot_id: str | None) -> None:
        """Record a NAMED REF (Iceberg branch/tag analogue) pointing at
        ``snapshot_id`` (None = drop the ref). Append-only: the LAST
        entry per name wins. Indexed so index-tail readers resolve refs
        without a full manifest read."""
        entry = {
            "kind": "ref",
            "name": name,
            "snapshot_id": snapshot_id,
            "ts": time.time(),
        }
        pre = self._msize()
        self.append([entry])
        post = self._msize()
        self._heal_index(pre)
        self._index_write([{**entry, "mend": post}])

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
        pre = self._msize()
        self.append([entry])
        post = self._msize()
        self._heal_index(pre)
        self._index_write([{**entry, "mend": post}])

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
                if e.get("kind") == "txn":
                    entries.extend(e.get("entries", ()))
                else:
                    entries.append(e)
                covered = max(covered, int(e.get("mend", 0)))
        return entries, covered

    def read_tail(self, offset: int, upto: int | None = None) -> list[dict]:
        """Manifest entries whose lines start at/after byte ``offset``
        (and before ``upto`` when given — both are line boundaries by
        construction: every append is flushed whole)."""
        if not os.path.exists(self.path):
            return []
        entries = []
        with open(self.path) as f:
            f.seek(offset)
            if upto is not None:
                data = f.read(max(upto - offset, 0))
                for line in data.splitlines():
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        e = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if e.get("kind") == "txn":
                        entries.extend(e.get("entries", ()))
                    else:
                        entries.append(e)
                return entries
            # offset always lands on a line boundary (mend is the file
            # size right after a flushed append); json.JSONDecodeError
            # below skips any torn concurrent write
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if e.get("kind") == "txn":
                    entries.extend(e.get("entries", ()))
                else:
                    entries.append(e)
        return entries
