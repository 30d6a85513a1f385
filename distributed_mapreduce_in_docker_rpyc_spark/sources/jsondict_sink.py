"""Per-reducer JSON-dict sink as a first-class Spark data source (Python
DataSource writer API).

The reference's reduce output (reference worker/worker.py:34-36) is one
``reduce-<part_id>.json`` per reducer, each holding a single JSON OBJECT
mapping key → reduced value (a dict dump, not JSON-lines — Spark's built-in
``df.write.json`` cannot produce this shape).  This module packages that
exact sink as ``df.write.format("jsondict").mode("overwrite").save(dir)``
via the modern three-phase write protocol:

  task ``write()`` → ``_staging-<jobid>/reduce-<pid>.json`` + commit message
  driver ``commit()`` → move staged files into place, ``_SUCCESS`` manifest
  driver ``abort()``  → remove the staging directory

which is also the 100 TB-correct shape (the same job-scoped temp-dir
protocol Hadoop's FileOutputCommitter uses): tasks only ever write inside a
directory this job owns, so a straggler task finishing AFTER the driver
aborts cannot leak a file into the final listing — abort cleans by
ownership, never by racing a glob against in-flight renames.  Final
``reduce-<pid>.json`` names appear only at job commit.  In local mode every
task shares one filesystem; a cluster deployment points ``path`` at
shared/cloud storage exactly like any file sink.

Append mode is rejected up-front (before promoting anything) if any staged
file would collide with an existing generation's file (same partition id) —
silently mixing generations was the alternative; a non-colliding append
merges the prior manifest so earlier committed files stay readable.

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
        import uuid

        self.path = options.get("path")
        self.overwrite = overwrite
        if not self.path:
            raise ValueError("jsondict requires a path: .save('/out/dir')")
        # Job-unique staging dir, created driver-side, shipped to tasks in
        # the pickled writer: every task output lives under it until the
        # driver-side job commit.
        self.staging = os.path.join(self.path, f"_staging-{uuid.uuid4().hex[:12]}")
        os.makedirs(self.staging, exist_ok=True)

    def write(self, iterator: Iterator) -> _FileCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        result = {str(row[0]): row[1] for row in iterator}
        out_path = os.path.join(self.staging, f"reduce-{pid}.json")
        # Task-attempt temp name + rename = task commit (speculative twins
        # target the same final name, last rename wins, content identical);
        # both names are inside staging, so nothing is visible until the
        # driver-side job commit moves it.
        tmp = f"{out_path}.inprogress-{TaskContext.get().taskAttemptId()}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(result, f, ensure_ascii=False)
        os.replace(tmp, out_path)
        return _FileCommit(out_path, len(result))

    def commit(self, messages: list[_FileCommit]) -> None:
        import shutil

        # Job commit: clear the prior generation (overwrite) or refuse a
        # colliding append, then promote staged files to their final names.
        # Collisions are validated for EVERY message before ANY file is
        # promoted — a mid-loop failure must not leave a half-promoted,
        # unlisted generation behind.
        prior_files: list[str] = []
        prior_keys = 0
        dests = [os.path.join(self.path, os.path.basename(m.path)) for m in messages]
        if self.overwrite:
            for old in _glob.glob(os.path.join(self.path, "reduce-*.json")):
                os.remove(old)
        else:
            clashes = sorted(d for d in dests if os.path.exists(d))
            if clashes:
                raise ValueError(
                    f"jsondict append would collide with {clashes}; use "
                    "mode('overwrite') or a fresh directory"
                )
            # Append keeps the prior generation visible: merge its manifest
            # into the new one, or earlier committed reduce-*.json files
            # would vanish from the manifest-honoring reader.
            manifest_path = os.path.join(self.path, "_SUCCESS")
            if os.path.exists(manifest_path):
                with open(manifest_path, encoding="utf-8") as f:
                    prior = json.load(f)
                prior_files = list(prior.get("files", []))
                prior_keys = int(prior.get("total_keys", 0))
        for m, dest in zip(messages, dests):
            os.replace(m.path, dest)
        manifest = {
            "files": sorted({*prior_files, *dests}),
            "total_keys": prior_keys + sum(m.n_keys for m in messages),
        }
        with open(os.path.join(self.path, "_SUCCESS"), "w", encoding="utf-8") as f:
            json.dump(manifest, f)
        shutil.rmtree(self.staging, ignore_errors=True)

    def abort(self, messages: list[_FileCommit]) -> None:
        # Everything this job ever wrote lives in the staging dir; removing
        # it cannot race a straggler task into the final listing (a late
        # rename inside a removed directory fails inside the already-failed
        # task, leaking nothing).
        import shutil

        shutil.rmtree(self.staging, ignore_errors=True)


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
