"""TableIO seam contract (SURVEY.md §1.2): the properties ANY snapshot
backend (sandbox parquet+JSON today, an Iceberg catalog in production)
must satisfy for the engine's stable-part-id / resume / append logic to
hold. The mock catalog pins the contract; the parquet backend is tested
against the same assertions.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from libgiddy_spark.manifest import Manifest
from libgiddy_spark.table_io import list_parquet_files, snapshot_id_of


class MockCatalog:
    """Iceberg-shaped backend: snapshots are immutable (rel, size) file
    listings; the snapshot id derives from the listing."""

    def __init__(self):
        self._files: list[tuple[str, int]] = []

    def append(self, rel: str, size: int) -> None:
        self._files.append((rel, size))

    def list_files(self) -> list[tuple[str, int]]:
        return sorted(self._files)

    def snapshot_id(self) -> str:
        entries = [f"{p}:{s}" for p, s in self.list_files()]
        return "snap-" + hashlib.sha256("\n".join(entries).encode()).hexdigest()[:16]


class ParquetBackend:
    """The sandbox backend, adapted to the same protocol."""

    def __init__(self, root):
        self.root = str(root)
        self._n = 0

    def append(self, rel: str, size_rows: int) -> None:
        pq.write_table(
            pa.table({"x": list(range(size_rows + self._n))}),
            f"{self.root}/{rel}",
        )
        self._n += 1

    def list_files(self):
        return list_parquet_files(self.root)

    def snapshot_id(self) -> str:
        return snapshot_id_of(self.root)


@pytest.fixture(params=["mock", "parquet"])
def backend(request, tmp_path):
    if request.param == "mock":
        return MockCatalog()
    return ParquetBackend(tmp_path)


def _grow(backend, rel: str) -> None:
    if isinstance(backend, MockCatalog):
        backend.append(rel, 100 + len(rel))
    else:
        backend.append(rel, 50)


def test_snapshot_id_deterministic_and_append_sensitive(backend):
    _grow(backend, "a.parquet")
    _grow(backend, "b.parquet")
    s1 = backend.snapshot_id()
    assert s1 == backend.snapshot_id()  # deterministic
    _grow(backend, "c.parquet")
    assert backend.snapshot_id() != s1  # append -> new snapshot


def test_listing_is_sorted_and_identity_stable(backend):
    _grow(backend, "b.parquet")
    _grow(backend, "a.parquet")
    files = backend.list_files()
    assert files == sorted(files)
    ids_before = {f"{p}:{s}" for p, s in files}
    _grow(backend, "c.parquet")
    ids_after = {f"{p}:{s}" for p, s in backend.list_files()}
    assert ids_before <= ids_after  # old identities unchanged by append


def test_registry_part_ids_stable_across_snapshots(backend, tmp_path):
    """The engine invariant the seam exists for: a file keeps its
    part_id across snapshot appends (incremental re-encode of only the
    new files), and new files get fresh monotonic ids."""
    man = Manifest(str(tmp_path / "m"))
    _grow(backend, "a.parquet")
    _grow(backend, "b.parquet")

    def register(listing):
        reg = man.file_registry()
        nxt = max(reg.values(), default=-1) + 1
        new = []
        for rel, size in listing:
            fid = f"{rel}:{size}"
            if fid not in reg:
                reg[fid] = nxt
                new.append((fid, nxt, rel))
                nxt += 1
        if new:
            man.register_files(new)
        return {fid: pid for fid, pid in reg.items()}

    r1 = register(backend.list_files())
    _grow(backend, "c.parquet")
    r2 = register(backend.list_files())
    assert all(r2[fid] == pid for fid, pid in r1.items())  # stable
    assert len(r2) == len(r1) + 1
    assert max(r2.values()) == len(r2) - 1  # monotonic, dense
