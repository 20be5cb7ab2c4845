"""Named storage connections.

Mirrors the reference's connection registry
(reference: src/handlers/connection_registry.rs:39-186), which maps a
connection name ("default", "big_s3", ...) to an opendal operator (fs or
S3) plus retry/logging layers. In Spark, a connection is a path prefix +
an optional bag of Hadoop filesystem configs (e.g. per-bucket S3A
credentials); retries and IO layering come from the Hadoop FS client.

``read_files('data/*.parquet', connection=>'big_s3')`` resolves to
``<big_s3.base>/data/*.parquet`` with the connection's Hadoop confs
applied to the session — same shape as the reference's
``read_files_task.rs:177-199`` path resolution.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class ConnectionError_(Exception):
    """Raised for unknown connections (reference: connection_registry.rs errors)."""


@dataclass
class Connection:
    """One named storage root.

    ``base`` is a URI prefix understood by Hadoop FS: ``file:///data``,
    ``s3a://bucket/prefix``, or a plain local path. ``hadoop_conf`` holds
    per-connection settings, e.g. ``fs.s3a.bucket.<b>.access.key`` — the
    Spark-idiomatic analog of the reference's per-connection opendal
    S3 credentials (connection_registry.rs:104-152).
    """

    name: str
    base: str
    hadoop_conf: dict[str, str] = field(default_factory=dict)

    def resolve(self, relative: str) -> str:
        if relative.startswith(("/", "file:", "s3a:", "s3:", "hdfs:", "abfss:")):
            # absolute paths bypass the base, matching how the reference
            # treats the glob as rooted in the connection's operator.
            return relative
        return self.base.rstrip("/") + "/" + relative.lstrip("/")


class ConnectionRegistry:
    """name → Connection map; a ``default`` connection is required
    (reference: worker config validation requires ``default``,
    config/worker.rs:115-137)."""

    def __init__(self, default_base: str = ".") -> None:
        self._conns: dict[str, Connection] = {}
        self.register("default", default_base)

    def register(
        self, name: str, base: str, hadoop_conf: dict[str, str] | None = None
    ) -> Connection:
        conn = Connection(name=name, base=base, hadoop_conf=dict(hadoop_conf or {}))
        self._conns[name] = conn
        return conn

    def get(self, name: str = "default") -> Connection:
        try:
            return self._conns[name]
        except KeyError:
            raise ConnectionError_(f"connection not registered: {name!r}") from None

    def names(self) -> list[str]:
        return sorted(self._conns)

    def apply_hadoop_conf(self, spark) -> None:
        """Apply every connection's Hadoop confs to the live session."""
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        for conn in self._conns.values():
            for k, v in conn.hadoop_conf.items():
                hconf.set(k, v)
