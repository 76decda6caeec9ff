"""Custom PYTHON DataSource (Spark 4 ``pyspark.sql.datasource``):
the engine's extension point for file formats Spark has no native
reader for. Demonstrated on the BEIR corpus-JSONL layout so its
round-trip query can share the established oracle discipline
(reference reads the same layout imperatively, ``000:360-420``).

Scale shape: ``partitions()`` returns one InputPartition per data
file, so a directory of N files reads with N-way parallelism and no
driver materialization — each task streams its file line by line.
This is the *correct* way to bring an unsupported format into the
engine (vs. collecting to the driver and parallelizing), and the
registered round-trip pins the whole contract: registration, schema
declaration, partition planning, per-task iteration, and value
fidelity."""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# The SAME schema the JVM-native BEIR reader declares
# (files.CORPUS_SCHEMA): `_id` stays a STRING because real BEIR
# corpus ids are frequently non-numeric ('MED-10', 'ug7v899j') —
# a reader that int()s them fails on every actual BEIR dataset
# (review r7). Callers with numeric ids cast downstream.
from inside_vectordb_spark.sources.files import CORPUS_SCHEMA


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class JsonlCorpusReader(DataSourceReader):
    def __init__(self, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("jsonl_corpus: 'path' option is required")

    def partitions(self):
        if os.path.isdir(self._path):
            # every non-hidden file is a partition, like the JVM file
            # sources (skip _SUCCESS/.crc-style metadata only). The
            # old .jsonl/.json extension filter silently DROPPED
            # compressed or extensionless data files — a wrong-
            # extension file must fail loudly in read(), never
            # vanish from the result (review r8).
            files = sorted(
                os.path.join(self._path, f)
                for f in os.listdir(self._path)
                if not f.startswith((".", "_"))
            )
            if not files:
                raise FileNotFoundError(
                    f"jsonl_corpus: no data files under {self._path!r}"
                )
        else:
            files = [self._path]
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition):
        with open(partition.path, "r", encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                meta = rec.get("metadata") or {}
                rid = rec.get("_id")
                yield (
                    str(rid) if rid is not None else None,
                    # absent fields are NULL, matching the JVM-native
                    # reader (Spark's JSON writer drops null fields,
                    # so round-tripped NULL titles come back absent;
                    # ""-defaulting made the two readers disagree on
                    # the same file — review r8)
                    rec.get("title"),
                    rec.get("text"),
                    {str(k): str(v) for k, v in meta.items()},
                )


class JsonlCorpusDataSource(DataSource):
    """``spark.read.format("jsonl_corpus").load(path)`` after
    ``spark.dataSource.register(JsonlCorpusDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_corpus"

    def schema(self):
        return CORPUS_SCHEMA

    def reader(self, schema):
        return JsonlCorpusReader(self.options)


def register_jsonl_corpus_source(spark) -> None:
    spark.dataSource.register(JsonlCorpusDataSource)
