"""Custom Python Data Source WRITER (PySpark 4 DataSource API) — the
sink half of the extension surface whose reader half is
``sources/synthetic.py`` (reference analog: user-deployed operators,
README "Future Functionality" / operator_task_registry.rs; the
MaterializeFiles sink is the built-in counterpart,
materialize_files_task.rs:117-141).

``df.write.format("chqe_filesink").mode(...).save(path)`` writes one
JSON-lines file per task with TWO-PHASE COMMIT semantics: every task
writes to a private ``_staging-*`` file and returns a commit message;
only the DRIVER's ``commit()`` renames staged files into place and
writes the ``_SINK_MANIFEST.json`` (file list + per-file row counts) —
a reader that consults the manifest never sees a torn write, and a
failed/aborted job leaves only staging files that ``abort()`` (or a
later vacuum) removes. Same pointer-swap discipline as
``operators/maintenance.py:write_snapshot``; same local-FS rename
caveat (object stores need a CAS finalize).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


class _StagedFile(WriterCommitMessage):
    def __init__(self, staged_path: str, n_rows: int):
        self.staged_path = staged_path
        self.n_rows = n_rows


class FileSinkWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("chqe_filesink requires a save path")
        self.overwrite = overwrite

    # runs ON EXECUTORS, one call per partition
    def write(self, iterator) -> _StagedFile:
        os.makedirs(self.path, exist_ok=True)
        staged = os.path.join(self.path, f"_staging-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(staged, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _StagedFile(staged, n)

    # DRIVER-side finalize: nothing is visible until every task
    # succeeded and the manifest lands. The save mode decides how this
    # commit composes with a previous one: overwrite removes the prior
    # commit's part files (so glob-readers can't see stale
    # higher-numbered parts from a larger earlier commit), append
    # continues part numbering after the existing manifest and merges
    # the file lists (never os.replace-ing over a live part file).
    def commit(self, messages) -> None:
        manifest = os.path.join(self.path, "_SINK_MANIFEST.json")
        prior = {"files": [], "rows": 0}
        if os.path.exists(manifest):
            with open(manifest) as fh:
                prior = json.load(fh)
        if self.overwrite:
            for e in prior["files"]:
                try:
                    os.remove(os.path.join(self.path, e["file"]))
                except OSError:
                    pass
            # stale parts a torn earlier run left behind without a
            # manifest entry are also stale data to a glob-reader
            for f in os.listdir(self.path):
                if f.startswith("part-") and f.endswith(".jsonl"):
                    try:
                        os.remove(os.path.join(self.path, f))
                    except OSError:
                        pass
            prior = {"files": [], "rows": 0}
        base = len(prior["files"])
        entries = list(prior["files"])
        for i, m in enumerate(sorted(messages, key=lambda m: m.staged_path)):
            final = os.path.join(self.path, f"part-{base + i:05d}.jsonl")
            os.replace(m.staged_path, final)
            entries.append(
                {"file": os.path.basename(final), "rows": m.n_rows}
            )
        with open(manifest, "w") as fh:
            json.dump({"files": entries, "rows": sum(e["rows"] for e in entries)}, fh)

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.staged_path)
            except OSError:
                pass


class FileSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "chqe_filesink"

    def writer(self, schema, overwrite: bool) -> FileSinkWriter:
        return FileSinkWriter(self.options, overwrite)


def register_file_sink(spark) -> None:
    spark.dataSource.register(FileSinkDataSource)
