"""Iceberg-lite: snapshot-versioned parquet tables.

No Iceberg runtime jar ships in this sandbox, so this module implements the
Iceberg *semantics* the engine needs — atomic snapshot commits, manifests,
time travel, and bucket layout — on plain parquet + JSON, shaped so a real
Iceberg catalog (DSv2 ``writeTo(...).createOrReplace``) drops in via config.

Layout:
    <warehouse>/<table>/
        data/<commit-uuid>/bucket=<b>/part-*.parquet
        snapshots/v<k>.json    {snapshot_id, parent_id, files, row_count, meta}
        VERSION                current snapshot id (atomic rename)

Snapshots are immutable; a commit writes data + manifest, then atomically
flips VERSION. Readers pin a snapshot id → stable reads during concurrent
commits (the property checkpoint/resume relies on).
"""

from __future__ import annotations

import glob
import json
import os
import uuid
from typing import Protocol, runtime_checkable


class IcebergLiteCatalog:
    def __init__(self, warehouse: str):
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    # -- paths ---------------------------------------------------------------
    def _tdir(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def _snapdir(self, table: str) -> str:
        return os.path.join(self._tdir(table), "snapshots")

    def _version_file(self, table: str) -> str:
        return os.path.join(self._tdir(table), "VERSION")

    # -- queries ---------------------------------------------------------------
    def tables(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.warehouse)
            if os.path.isdir(os.path.join(self.warehouse, d, "snapshots"))
        )

    def current_snapshot_id(self, table: str) -> int | None:
        vf = self._version_file(table)
        if not os.path.exists(vf):
            return None
        with open(vf) as f:
            return int(f.read().strip())

    def snapshot(self, table: str, snapshot_id: int | None = None) -> dict:
        sid = snapshot_id if snapshot_id is not None else self.current_snapshot_id(table)
        if sid is None:
            raise FileNotFoundError(f"table {table} has no committed snapshot")
        with open(os.path.join(self._snapdir(table), f"v{sid}.json")) as f:
            return json.load(f)

    def history(self, table: str) -> list[dict]:
        out = []
        for p in sorted(glob.glob(os.path.join(self._snapdir(table), "v*.json"))):
            with open(p) as f:
                out.append(json.load(f))
        return sorted(out, key=lambda s: s["snapshot_id"])

    # -- commit ----------------------------------------------------------------
    def commit(self, spark, table: str, df, mode: str = "append",
               partition_by: list[str] | None = None, meta: dict | None = None,
               row_group_bytes: int | None = None) -> int:
        """Write df as a new immutable snapshot. mode: 'append' keeps the
        parent's files in the manifest; 'overwrite' starts fresh. The commit
        is atomic: data lands under a fresh uuid dir, the manifest is
        written, then VERSION flips via os.replace (POSIX-atomic).

        ``row_group_bytes`` bounds the parquet row-group size of the
        snapshot's files. Parquet readers cannot split a row group, so it —
        not maxPartitionBytes — is the lower bound on downstream scan-task
        granularity: a write partition smaller than the 128MB default block
        size lands as ONE row group and its whole file becomes a single
        scan task. Set it for wide-payload tables (token arrays) whose
        per-file bytes are below the default; per-window tier rows are
        thousands of rows per MB and never hit the bound."""
        tdir = self._tdir(table)
        os.makedirs(self._snapdir(table), exist_ok=True)
        commit_id = uuid.uuid4().hex[:12]
        data_dir = os.path.join(tdir, "data", commit_id)
        writer = df.write.mode("overwrite").option("compression", "zstd")
        if row_group_bytes:
            writer = writer.option("parquet.block.size", str(int(row_group_bytes)))
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)

        new_files = [
            os.path.relpath(p, tdir)
            for p in glob.glob(os.path.join(data_dir, "**", "*.parquet"), recursive=True)
        ]
        parent = self.current_snapshot_id(table)
        files = list(new_files)
        if mode == "append" and parent is not None:
            files = self.snapshot(table, parent)["files"] + files
        sid = (parent or 0) + 1
        manifest = {
            "snapshot_id": sid,
            "parent_id": parent,
            "mode": mode,
            "files": files,
            "n_new_files": len(new_files),
            "meta": meta or {},
        }
        tmp = os.path.join(self._snapdir(table), f".v{sid}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self._snapdir(table), f"v{sid}.json"))
        vtmp = self._version_file(table) + ".tmp"
        with open(vtmp, "w") as f:
            f.write(str(sid))
        os.replace(vtmp, self._version_file(table))
        return sid

    # -- read ------------------------------------------------------------------
    def read(self, spark, table: str, snapshot_id: int | None = None):
        """Snapshot-pinned read (time travel when snapshot_id is given).
        Files are grouped per commit dir and read with that basePath so
        hive-style partition columns (partitionBy layout) are recovered."""
        snap = self.snapshot(table, snapshot_id)
        tdir = self._tdir(table)
        by_commit: dict[str, list[str]] = {}
        for f in snap["files"]:
            commit_dir = os.path.join(tdir, *f.split(os.sep)[:2])  # data/<uuid>
            by_commit.setdefault(commit_dir, []).append(os.path.join(tdir, f))
        if not by_commit:
            raise ValueError(f"snapshot {snap['snapshot_id']} of {table} is empty")
        df = None
        for base, paths in by_commit.items():
            part = spark.read.option("basePath", base).parquet(*paths)
            # allowMissingColumns: additive schema evolution across commits
            df = part if df is None else df.unionByName(part, allowMissingColumns=True)
        return df


# ---------------------------------------------------------------------------
# Catalog seam: the drop-in surface a real Iceberg catalog implements
# ---------------------------------------------------------------------------

@runtime_checkable
class CatalogProtocol(Protocol):
    """The EXACT surface the engine consumes (ResumableRollupJob,
    streaming.incremental, bootstrap_tokens). A real Iceberg deployment
    implements this over DSv2 (`df.writeTo(tbl).append()` in ``commit``,
    `spark.read.option("snapshot-id", ...)` in ``read``, the snapshots
    metadata table in ``history``) — nothing in the engine touches the
    lite catalog's on-disk layout, only these five methods (pinned by
    tests/test_resume.py::test_catalog_seam_swaps_via_config)."""

    def commit(self, spark, table: str, df, mode: str = "append",
               partition_by: list[str] | None = None,
               meta: dict | None = None,
               row_group_bytes: int | None = None) -> int: ...
    # row_group_bytes is a write-LAYOUT hint, part of the contract because
    # scan granularity is a table property the engine depends on (Iceberg
    # spells it `write.parquet.row-group-size-bytes`); implementations may
    # honor it or apply their own table-level default, never ignore scans

    def read(self, spark, table: str, snapshot_id: int | None = None): ...

    def snapshot(self, table: str, snapshot_id: int | None = None) -> dict: ...

    def history(self, table: str) -> list[dict]: ...

    def current_snapshot_id(self, table: str) -> int | None: ...


_CATALOG_IMPLS: dict[str, type] = {"iceberg-lite": IcebergLiteCatalog}


def register_catalog_impl(name: str, cls: type) -> None:
    """Register an alternative CatalogProtocol implementation (e.g. a real
    Iceberg DSv2 wrapper once its jar is on the classpath)."""
    _CATALOG_IMPLS[name] = cls


def catalog_from_conf(spark, warehouse: str):
    """Config-driven catalog construction: the swap point the docstring at
    the top of this module promises. ``spark.tsfeatures_spark.catalog.impl``
    selects the implementation (default iceberg-lite); a deployment with
    the Iceberg runtime registers its wrapper under e.g. 'iceberg' and
    flips one conf — no engine code changes."""
    try:
        name = spark.conf.get("spark.tsfeatures_spark.catalog.impl")
    except Exception:
        name = None
    name = name or "iceberg-lite"
    if name not in _CATALOG_IMPLS:
        raise ValueError(
            f"unknown catalog impl {name!r}; registered: {sorted(_CATALOG_IMPLS)}"
        )
    return _CATALOG_IMPLS[name](warehouse)
