"""Iceberg-style METADATA TABLES over the engine's manifest: the
`SELECT * FROM tbl.snapshots / .history / .refs / .files` surface a
lakehouse user expects for debugging, auditing and operational
tooling.

snapshots/history read the FULL manifest (the slim index headers drop
timestamps and part counts); files reads the O(chunks) summary index.
Metadata-scale driver parsing either way, exactly like Iceberg's own
metadata tables walk manifest lists, never the data files — and every
table returns an ordinary DataFrame so it composes with any query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .engine import _branch_replay, _manifest_entries, list_refs
from .manifest import Manifest

__all__ = [
    "file_rows", "files_df", "history_df", "history_rows",
    "refs_df", "refs_rows", "snapshot_rows", "snapshots_df",
]


SNAPSHOTS_DDL = ("committed_at_us long, snapshot_id string, "
                 "parent_id string, state string, num_parts int")
HISTORY_DDL = ("made_current_at_us long, snapshot_id string, "
               "is_current_ancestor boolean")
REFS_DDL = "name string, snapshot_id string"
FILES_DDL = ("snapshot_id string, chunk_dir string, part_id int, "
             "row_count long, key_lo long, key_hi long, "
             "key_lo_s string, key_hi_s string")


def snapshot_rows(out_dir: str) -> list[tuple]:
    """Driver-side rows for :func:`snapshots_df` (no Spark needed —
    the CLI prints these directly)."""
    entries = Manifest(out_dir).read()
    st = _branch_replay(entries)
    visible = set(st.visible())
    rows = []
    seen: set[str] = set()
    for e in entries:
        if e.get("kind") != "snapshot" or e["snapshot_id"] in seen:
            continue
        sid = e["snapshot_id"]
        seen.add(sid)
        if sid == st.current:
            state = "current"
        elif sid in visible:
            state = "ancestor"
        elif sid in st.aborted:
            state = "aborted"
        elif sid in st.staged_parent:
            state = "staged"
        else:
            state = "orphaned"
        rows.append((
            int(e.get("ts", 0.0) * 1_000_000),
            sid,
            st.parent.get(sid, st.staged_parent.get(sid)),
            state,
            int(e.get("num_parts", 0)),
        ))
    return rows


def snapshots_df(spark: SparkSession, out_dir: str) -> DataFrame:
    """One row per snapshot header (Iceberg ``tbl.snapshots``):
    ``committed_at_us``, ``snapshot_id``, ``parent_id`` (main-branch
    parent at join; null for the first commit / unjoined), ``state``
    (``current`` | ``ancestor`` | ``orphaned`` = in history but not
    visible at HEAD, e.g. rolled back | ``staged`` | ``aborted``) and
    ``num_parts``."""
    return spark.createDataFrame(snapshot_rows(out_dir), SNAPSHOTS_DDL)


def history_rows(out_dir: str) -> list[tuple]:
    entries = Manifest(out_dir).read()
    st = _branch_replay(entries)
    visible = set(st.visible())
    rows = []
    cur: str | None = None
    joined: set[str] = set()
    for e in entries:
        k = e.get("kind")
        if k == "snapshot" and not e.get("staged"):
            sid = e["snapshot_id"]
            if sid in joined:
                continue
            joined.add(sid)
            cur = sid
        elif k == "publish" and not e.get("abort") \
                and e.get("snapshot_id") in st.parent \
                and e.get("snapshot_id") not in joined:
            sid = e["snapshot_id"]
            joined.add(sid)
            cur = sid
        elif k == "rollback" and e.get("to") in joined:
            sid = e["to"]
            cur = sid
        else:
            continue
        rows.append((
            int(e.get("ts", 0.0) * 1_000_000),
            cur,
            cur in visible,
        ))
    return rows


def history_df(spark: SparkSession, out_dir: str) -> DataFrame:
    """One row per time a snapshot became CURRENT (Iceberg
    ``tbl.history``): main-branch joins in commit order plus every
    rollback event, with ``is_current_ancestor`` false for commits a
    later rollback undid (the lineage HEAD no longer descends from)."""
    return spark.createDataFrame(history_rows(out_dir), HISTORY_DDL)


def refs_rows(out_dir: str) -> list[tuple]:
    return sorted(list_refs(out_dir).items())


def refs_df(spark: SparkSession, out_dir: str) -> DataFrame:
    """Live named refs (Iceberg ``tbl.refs``)."""
    return spark.createDataFrame(refs_rows(out_dir), REFS_DDL)


def file_rows(out_dir: str, as_of: str | None = None) -> list[tuple]:
    from .engine import _resolve_as_of, _snap_chain

    entries = _manifest_entries(out_dir)
    _chain, accepted = _snap_chain(
        entries, _resolve_as_of(out_dir, as_of))
    # mirror _committed_block_files' rewrite remap: a compaction moves
    # its replaced dirs' rows under new_chunk; a purge/sorted rewrite
    # (new_chunk=None) RETIRES them — their rows live under the
    # rewrite's own chunk entries, so keeping both would double-count
    by_dir: dict[str, list[list]] = {}
    seen: set[tuple[str, int]] = set()
    rewrites: list[dict] = []
    for e in entries:
        k = e.get("kind")
        if accepted is not None and e.get("snapshot_id") not in accepted:
            continue
        if k == "chunk" and e.get("chunk_dir"):
            part_rows = e.get("part_rows") or {}
            for pid in e.get("parts", ()):
                # healed + regular summary lines can both name the same
                # (chunk_dir, part): first one wins, duplicates would
                # double-count rows (same set semantics as
                # _committed_block_files / _evolution_null_parts)
                if (e["chunk_dir"], int(pid)) in seen:
                    continue
                seen.add((e["chunk_dir"], int(pid)))
                by_dir.setdefault(e["chunk_dir"], []).append([
                    e.get("snapshot_id"),
                    e.get("chunk_dir"),
                    int(pid),
                    int(part_rows.get(str(pid), -1)),
                    e.get("key_lo"),
                    e.get("key_hi"),
                    e.get("key_lo_s"),
                    e.get("key_hi_s"),
                ])
        elif k == "rewrite":
            rewrites.append(e)
    # crash-orphaned chunks (part entries whose chunk summary append
    # was lost): _committed_block_files still decodes them from the
    # manifest tail, so the files table must list them too (row count
    # unknown at chunk granularity -> -1, bounds from the part entry)
    for e in entries:
        if (e.get("kind") != "part" or e.get("status") != "done"
                or not e.get("chunk_dir")
                or e.get("part_id") is None):
            continue
        if accepted is not None and e.get("snapshot_id") not in accepted:
            continue
        dp = (e["chunk_dir"], int(e["part_id"]))
        if dp in seen:
            continue
        seen.add(dp)
        n = -1
        for c in (e.get("columns") or {}).values():
            if isinstance(c, dict) and c.get("n_values") is not None:
                n = int(c["n_values"])
                break
        by_dir.setdefault(e["chunk_dir"], []).append([
            e.get("snapshot_id"), e["chunk_dir"], int(e["part_id"]),
            n,
            e.get("key_lo"), e.get("key_hi"),
            e.get("key_lo_s"), e.get("key_hi_s"),
        ])
    for rw in rewrites:
        moved: list[list] = []
        for d in rw.get("replaces", ()):
            moved.extend(by_dir.pop(d, []))
        if moved and rw.get("new_chunk"):
            for r in moved:
                r[1] = rw["new_chunk"]
            by_dir.setdefault(rw["new_chunk"], []).extend(moved)
    return [tuple(r) for rs in by_dir.values() for r in rs]


def files_df(spark: SparkSession, out_dir: str,
             as_of: str | None = None) -> DataFrame:
    """One row per (chunk, part) visible at ``as_of`` (default HEAD) —
    Iceberg ``tbl.files``: owning snapshot, chunk dir, part id, row
    count and the manifest-level sort-key zone bounds data skipping
    prunes on. Built from the O(chunks) summary index, rewrite-lineage
    aware (compacted rows report their consolidated dir; purged dirs
    are retired, never double-counted)."""
    return spark.createDataFrame(file_rows(out_dir, as_of), FILES_DDL)
