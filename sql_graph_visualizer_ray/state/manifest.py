"""Per-partition checkpoint manifest with atomic, epoch-fenced commits.

Replaces the reference's destructive full refresh (``MATCH (n) DETACH DELETE n``
before every run, ``/root/reference/cmd/main.go:165-177``) with idempotent
incremental commits:

- Each commit writes its touched bucket partitions to ``_staging/v{N}/``,
  renames the version directory into place, then atomically replaces
  ``MANIFEST.json`` (write tmp + ``os.replace``). The manifest is the single
  source of truth; data directories not reachable from it are garbage.
- The manifest records, per bucket, the current data path + rows + lineage
  counters, plus the global applied-epoch / applied-LSN watermark. A killed
  job resumes by reading the manifest and replaying only epochs beyond the
  watermark — retried Ray tasks overwrite their own deterministic staging
  files, so no commit can double-apply (exactly-once effect).
"""

from __future__ import annotations

import base64
import json
import os
import shutil
from typing import Any

import pyarrow as pa

MANIFEST_NAME = "MANIFEST.json"


def _schema_to_str(schema: pa.Schema) -> str:
    return base64.b64encode(schema.serialize().to_pybytes()).decode()


def _schema_from_str(s: str) -> pa.Schema:
    return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(s)))


class Manifest:
    """In-memory view of a lake table's MANIFEST.json."""

    def __init__(self, data: dict[str, Any]):
        self.data = data

    # -- constructors -----------------------------------------------------
    @classmethod
    def new(
        cls, num_buckets: int, payload_schema: pa.Schema, turn_shard_size: int | None
    ) -> "Manifest":
        return cls(
            {
                "format": "graft-cdc-lake/1",
                "version": 0,
                "num_buckets": num_buckets,
                "turn_shard_size": turn_shard_size,
                "applied_epoch": -1,
                "applied_lsn": -1,
                "payload_schema": _schema_to_str(payload_schema),
                "buckets": {},  # str(bucket) -> {path, rows, tombstones}
                "counters": {},  # cumulative lineage counters
                "history": [],  # one entry per commit
            }
        )

    @classmethod
    def load(cls, lake_dir: str) -> "Manifest | None":
        p = os.path.join(lake_dir, MANIFEST_NAME)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return cls(json.load(f))

    # -- accessors --------------------------------------------------------
    @property
    def version(self) -> int:
        return self.data["version"]

    @property
    def num_buckets(self) -> int:
        return self.data["num_buckets"]

    @property
    def turn_shard_size(self) -> int | None:
        return self.data["turn_shard_size"]

    @property
    def applied_epoch(self) -> int:
        return self.data["applied_epoch"]

    @property
    def payload_schema(self) -> pa.Schema:
        return _schema_from_str(self.data["payload_schema"])

    def bucket_paths(self, lake_dir: str) -> list[str]:
        return [
            os.path.join(lake_dir, b["path"]) for b in self.data["buckets"].values()
        ]

    # -- commit protocol --------------------------------------------------
    def save_atomic(self, lake_dir: str) -> None:
        p = os.path.join(lake_dir, MANIFEST_NAME)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.data, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, p)


def clean_uncommitted(lake_dir: str, committed_version: int) -> None:
    """Delete staging dirs and any version dir newer than the manifest —
    leftovers of a crash between data rename and manifest publish."""
    if not os.path.isdir(lake_dir):
        return
    for name in os.listdir(lake_dir):
        full = os.path.join(lake_dir, name)
        if name == "_staging":
            shutil.rmtree(full, ignore_errors=True)
        elif name.startswith("v") and name[1:].isdigit() and int(name[1:]) > committed_version:
            shutil.rmtree(full, ignore_errors=True)


def vacuum(lake_dir: str, manifest: Manifest) -> int:
    """Remove version dirs no bucket references anymore. Returns count removed."""
    live = {b["path"].split("/", 1)[0] for b in manifest.data["buckets"].values()}
    removed = 0
    for name in os.listdir(lake_dir):
        if (
            name.startswith("v")
            and name[1:].isdigit()
            and int(name[1:]) <= manifest.version
            and name not in live
        ):
            shutil.rmtree(os.path.join(lake_dir, name), ignore_errors=True)
            removed += 1
    return removed
