"""PostgreSQL bulk transfer via COPY — the no-JDBC-driver path.

The reference moves rows over JDBC (A1/A6); this engine's JDBC option
builders exist (sources/jdbc.py) but a driver jar may be absent (as in
this sandbox). COPY is PostgreSQL's native bulk interface and needs only
the ``psql`` client: Spark writes its partitions as CSV part files, each
part is streamed to the server with ``\\copy`` — so the Spark side stays
fully distributed and the per-part load is the same batched append a JDBC
writer would issue. Unload is the mirror image (COPY TO → one CSV →
``spark.read.csv`` with an explicit schema).

Scale notes: part files load sequentially through one psql process here;
on a real cluster you parallelize by running one COPY per partition from
the executors (PG accepts concurrent COPYs into the same table) — the
partitioned layout this module writes is exactly what that needs. CSV
conventions are pinned (header off, NULL marker ``\\N``, ISO timestamps)
so load and unload are lossless inverses for the supported types.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: psql runner contract: (sql, files) -> CompletedProcess-like with
#: .returncode/.stderr — kept injectable so tests drive a private server
PsqlRunner = Callable[..., object]

NULL_MARKER = "\\N"


def copy_load(
    df: DataFrame,
    run_psql: PsqlRunner,
    table: str,
    truncate: bool = False,
) -> int:
    """Bulk-load ``df`` into PG ``table`` via CSV part files + ``\\copy``.
    Returns the number of part files loaded. Column order is the
    DataFrame's; the target table must be column-compatible."""
    tmp = tempfile.mkdtemp(prefix="spark_graft_pgcopy_")
    try:
        (
            df.write.option("header", "false")
            .option("nullValue", NULL_MARKER)
            .option("emptyValue", "")
            .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .mode("overwrite")
            .csv(tmp)
        )
        if truncate:
            r = run_psql(sql=f"TRUNCATE {table}")
            if getattr(r, "returncode", 1) != 0:
                raise RuntimeError(f"TRUNCATE failed: {getattr(r, 'stderr', '')}")
        parts = sorted(glob.glob(os.path.join(tmp, "part-*.csv")))
        cols = ", ".join(df.columns)
        for p in parts:
            os.chmod(p, 0o644)
            r = run_psql(
                sql=f"\\copy {table} ({cols}) FROM '{p}' "
                    f"WITH (FORMAT csv, NULL '{NULL_MARKER}')"
            )
            if getattr(r, "returncode", 1) != 0:
                raise RuntimeError(f"COPY failed: {getattr(r, 'stderr', '')}")
        return len(parts)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def copy_unload(
    spark: SparkSession,
    run_psql: PsqlRunner,
    table_or_query: str,
    schema: T.StructType,
) -> DataFrame:
    """Read a PG table (or ``(SELECT …)`` query) back into Spark via
    COPY TO — explicit schema, same CSV conventions as ``copy_load`` so
    the round-trip is lossless."""
    tmp = tempfile.mkdtemp(prefix="spark_graft_pgunload_")
    out = os.path.join(tmp, "out.csv")
    r = run_psql(
        sql=f"\\copy {table_or_query} TO '{out}' "
            f"WITH (FORMAT csv, NULL '{NULL_MARKER}')"
    )
    if getattr(r, "returncode", 1) != 0:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(f"COPY TO failed: {getattr(r, 'stderr', '')}")
    try:
        df = (
            spark.read.schema(schema)
            .option("header", "false")
            .option("nullValue", NULL_MARKER)
            .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
            .csv(out)
        )
        # materialize before the temp dir is removed: the scan is lazy
        return df.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
