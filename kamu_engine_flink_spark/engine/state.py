"""Engine-owned checkpoint state.

Plays the role of the reference's Flink savepoints + `.stats` sidecar files
(TransformEngine.scala:338-380, StatsOperator.scala:30-48; watermarks live
outside the savepoint because of FLINK-5601). Our state is plain files in
the checkpoint directory — tar-compatible with the adapter transport
contract (adapter/src/adapter.rs:233-258):

    watermarks.json     per-input + per-step watermark state
    offset.json         (reserved; nextOffset arrives in the request)
    <name>.parquet/     operator state relations (window buffers, join
                        buffers, temporal versions, Top-N tables)

State relations are ordinary parquet directories written by Spark, so an
operator buffer can be arbitrarily large (bounded by watermark horizons,
not executor memory) and reads/writes stay distributed.
"""

from __future__ import annotations

import json
import os
import shutil
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def _dt_to_iso(value: datetime | None) -> str | None:
    if value is None:
        return None
    return value.astimezone(timezone.utc).isoformat()


def _iso_to_dt(value: str | None) -> datetime | None:
    if value is None:
        return None
    return datetime.fromisoformat(value)


class StateStore:
    """Read state from the previous checkpoint dir, write to the new one.

    The reference mutates an untarred copy of the previous checkpoint; we
    keep the dirs immutable: every run rewrites its full (small) state into
    `new_dir`. Relations it did not touch are copied forward.
    """

    def __init__(self, spark: SparkSession, prev_dir: str | None, new_dir: str):
        self.spark = spark
        self.prev_dir = prev_dir
        self.new_dir = new_dir
        os.makedirs(new_dir, exist_ok=True)
        self._written: set[str] = set()
        # When deferral is on, save_df queues (name, df) instead of
        # writing; flush_deferred() runs every queued write — plus an
        # optional extra action (the invocation's output write) — with
        # overlapping jobs. Safe because loads only ever read PREV_DIR:
        # nothing reads a relation written this invocation.
        self._deferred: list | None = None

    # -- JSON scalars ------------------------------------------------------

    def load_json(self, name: str, default=None):
        if self.prev_dir:
            path = os.path.join(self.prev_dir, name)
            if os.path.exists(path):
                with open(path) as f:
                    return json.load(f)
        return default

    def save_json(self, name: str, obj) -> None:
        with open(os.path.join(self.new_dir, name), "w") as f:
            json.dump(obj, f, indent=2, default=str)
        self._written.add(name)

    # -- watermarks --------------------------------------------------------

    def load_watermarks(self) -> dict[str, datetime | None]:
        raw = self.load_json("watermarks.json", {}) or {}
        return {k: _iso_to_dt(v) for k, v in raw.items()}

    def save_watermarks(self, wms: dict[str, datetime | None]) -> None:
        self.save_json("watermarks.json", {k: _dt_to_iso(v) for k, v in wms.items()})

    # -- DataFrame relations -------------------------------------------------

    def _rel_path(self, base: str | None, name: str) -> str | None:
        if base is None:
            return None
        return os.path.join(base, f"{name}.parquet")

    def has_df(self, name: str) -> bool:
        """True when the previous checkpoint persisted this relation —
        lets operators skip the buffer-union (and its materializing pin)
        entirely on a first run."""
        path = self._rel_path(self.prev_dir, name)
        return bool(path and os.path.exists(path))

    def load_df(self, name: str, schema: StructType | None = None) -> DataFrame | None:
        """Previous-run state relation, or an empty frame if `schema` given."""
        path = self._rel_path(self.prev_dir, name)
        if path and os.path.exists(path):
            return self.spark.read.parquet(path)
        if schema is not None:
            return self.spark.createDataFrame([], schema)
        return None

    def save_df(self, name: str, df: DataFrame) -> None:
        if self._deferred is not None:
            self._deferred.append((name, df))
            return
        self._write_df(name, df)

    def _write_df(self, name: str, df: DataFrame) -> None:
        path = self._rel_path(self.new_dir, name)
        # The input of this write may include the previous state at the same
        # logical name (read from prev_dir), so no self-overwrite hazard.
        df.write.mode("overwrite").parquet(path)
        self._written.add(f"{name}.parquet")

    def begin_deferred(self) -> None:
        self._deferred = []

    def flush_deferred(self, also=None) -> None:
        """Run every queued state write — and `also` (a zero-arg callable,
        typically the output write) — with overlapping job submission,
        then leave deferral mode. DataFrame plans are resolved at
        creation, so later temp-view rebinding cannot change a queued
        write; per-relation names are unique per invocation."""
        pending, self._deferred = self._deferred or [], None
        actions = [lambda n=n, df=df: self._write_df(n, df) for n, df in pending]
        if also is not None:
            actions.append(also)
        if not actions:
            return
        if len(actions) == 1:
            actions[0]()
            return
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(len(actions), 6)) as pool:
            futures = [pool.submit(a) for a in actions]
            for f in futures:
                f.result()

    def save_dfs(self, items) -> None:
        """Save several INDEPENDENT state relations with overlapping jobs
        (concurrent submission from one thread per relation — each write
        is its own output, so the cluster schedules them side by side
        instead of serializing the actions)."""
        items = list(items)
        if self._deferred is not None:
            self._deferred.extend(items)
            return
        if len(items) == 1:
            self.save_df(*items[0])
            return
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(items)) as pool:
            futures = [pool.submit(self._write_df, n, df) for n, df in items]
            for f in futures:
                f.result()

    def finish(self) -> None:
        """Copy forward any previous-state entries this run didn't rewrite."""
        if not self.prev_dir or not os.path.isdir(self.prev_dir):
            return
        for entry in os.listdir(self.prev_dir):
            if entry in self._written:
                continue
            src = os.path.join(self.prev_dir, entry)
            dst = os.path.join(self.new_dir, entry)
            if os.path.exists(dst):
                continue
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy2(src, dst)
