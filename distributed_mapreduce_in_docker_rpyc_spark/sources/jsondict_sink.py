"""Per-reducer JSON-dict sink as a first-class Spark data source (Python
DataSource writer API).

The reference's reduce output (reference worker/worker.py:34-36) is one
``reduce-<part_id>.json`` per reducer, each holding a single JSON OBJECT
mapping key → reduced value (a dict dump, not JSON-lines — Spark's built-in
``df.write.json`` cannot produce this shape).  This module packages that
exact sink as ``df.write.format("jsondict").mode("overwrite").save(dir)``
via the modern three-phase write protocol:

  task ``write()`` → per-partition ``reduce-<pid>.json`` + commit message
  driver ``commit()`` → ``_SUCCESS`` manifest listing committed files
  driver ``abort()``  → best-effort cleanup of task outputs

which is also the 100 TB-correct shape: files land under task identity,
the job is visible only after the driver-side commit, and failed jobs
clean up after themselves.  In local mode every task shares one filesystem;
a cluster deployment points ``path`` at shared/cloud storage exactly like
any file sink.

Input contract: exactly two columns ``(key, value)``; key is stringified,
value must be JSON-serializable (the reference's values are counts).
"""

from __future__ import annotations

import glob as _glob
import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


class _FileCommit(WriterCommitMessage):
    def __init__(self, path: str, n_keys: int):
        self.path = path
        self.n_keys = n_keys


class JsonDictWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        self.overwrite = overwrite
        if not self.path:
            raise ValueError("jsondict requires a path: .save('/out/dir')")
        # Driver-side: prepare the target directory; overwrite clears prior
        # reduce files so a re-run never mixes generations.
        os.makedirs(self.path, exist_ok=True)
        if overwrite:
            for old in _glob.glob(os.path.join(self.path, "reduce-*.json")):
                os.remove(old)
            success = os.path.join(self.path, "_SUCCESS")
            if os.path.exists(success):
                os.remove(success)

    def write(self, iterator: Iterator) -> _FileCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        result = {str(row[0]): row[1] for row in iterator}
        out_path = os.path.join(self.path, f"reduce-{pid}.json")
        # Write under a task-attempt temp name, rename on success: the
        # single-filesystem analogue of task-commit.
        tmp = f"{out_path}.inprogress-{TaskContext.get().taskAttemptId()}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(result, f, ensure_ascii=False)
        os.replace(tmp, out_path)
        return _FileCommit(out_path, len(result))

    def commit(self, messages: list[_FileCommit]) -> None:
        manifest = {
            "files": sorted(m.path for m in messages),
            "total_keys": sum(m.n_keys for m in messages),
        }
        with open(os.path.join(self.path, "_SUCCESS"), "w", encoding="utf-8") as f:
            json.dump(manifest, f)

    def abort(self, messages: list[_FileCommit]) -> None:
        # `messages` only covers tasks whose commit message reached the
        # driver before the failure; a sibling task can finish (and rename
        # its file into place) without appearing here.  In overwrite mode
        # this job owns every reduce-*.json in the directory (the prior
        # generation was cleared at writer construction), so clean by
        # directory ownership; otherwise fall back to the message list.
        if self.overwrite:
            for p in _glob.glob(os.path.join(self.path, "reduce-*.json")):
                os.remove(p)
        else:
            for m in messages:
                if m is not None and os.path.exists(m.path):
                    os.remove(m.path)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class JsonDictReader(DataSourceReader):
    """Read a directory of ``reduce-<pid>.json`` dict files back as
    ``(key, value)`` rows — one input partition per reducer file, preserving
    the reference's per-reducer layout (reference worker/worker.py:34-36) so
    a scan parallelizes across files exactly as the write parallelized across
    reducers.  Honors the ``_SUCCESS`` manifest when present (only committed
    files are read — a half-written generation is invisible, matching the
    job-level commit contract of every Spark file source)."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsondict requires a path: .load('/out/dir')")

    def partitions(self) -> list[_FilePartition]:
        manifest = os.path.join(self.path, "_SUCCESS")
        if os.path.exists(manifest):
            with open(manifest, encoding="utf-8") as f:
                files = json.load(f)["files"]
        else:
            files = sorted(_glob.glob(os.path.join(self.path, "reduce-*.json")))
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        with open(partition.path, encoding="utf-8") as f:
            d = json.load(f)
        for k, v in d.items():
            yield (k, v)


class JsonDictDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsondict"

    def schema(self) -> str:
        # The reference's values are reduce counts; key space is the map
        # output key.  Callers with other value types pass .schema(...).
        return "key string, value bigint"

    def writer(self, schema, overwrite: bool) -> JsonDictWriter:
        if len(schema.fields) != 2:
            raise ValueError(
                f"jsondict expects exactly (key, value) columns, got {schema.fieldNames()}"
            )
        return JsonDictWriter(self.options, overwrite)

    def reader(self, schema) -> JsonDictReader:
        return JsonDictReader(self.options)


def register_jsondict(spark) -> None:
    spark.dataSource.register(JsonDictDataSource)
