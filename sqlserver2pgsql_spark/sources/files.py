"""File sources and sinks beyond the driver's parquet fixtures — the
ingestion surface a training-data pipeline actually runs: JSONL/CSV with
explicit schemas and corrupt-record quarantine, and partitioned parquet
sinks whose layout the reader can prune.

Design rules:
- Schemas are ALWAYS explicit. Inference is a second full scan at 100 TB
  and can silently widen types between runs; an engine that feeds training
  jobs must be schema-stable.
- Bad records quarantine, never abort and never silently drop
  (PERMISSIVE + ``_corrupt_record``), mirroring the reference's
  error-tolerant load contract (operators/quarantine.py does the same for
  constraint violations after a clean parse).
- Sinks partition by low-cardinality columns only and sort within
  partitions so downstream scans get both partition pruning AND row-group
  min/max skipping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType([*schema.fields, T.StructField(CORRUPT_COL, T.StringType())])


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Read line-delimited JSON with an explicit schema → (good, quarantine).

    PERMISSIVE mode routes unparseable lines and type-mismatched fields into
    ``_corrupt_record`` instead of failing the job; the split is a pair of
    complementary filters over ONE scan (Catalyst shares it), not two
    reads."""
    # mode/corrupt-column set EXPLICITLY (not inherited from the session
    # conf): a session overriding spark.sql.columnNameOfCorruptRecord would
    # otherwise surface malformed lines as all-null "good" rows (ADVICE r3)
    raw = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    return _split_corrupt(raw, schema)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sep: str = ",",
    header: bool = True,
    encoding: str = "UTF-8",
) -> tuple[DataFrame, DataFrame]:
    """CSV with explicit schema/encoding → (good, quarantine). Same
    PERMISSIVE quarantine contract as ``read_jsonl``; ``encoding`` matters
    because real dumps arrive UTF-16/latin-1 (the DDL front-end sniffs the
    same, ddl/reader.py)."""
    raw = (
        spark.read.schema(_with_corrupt(schema))
        .option("sep", sep)
        .option("header", str(header).lower())
        .option("encoding", encoding)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )
    return _split_corrupt(raw, schema)


def _split_corrupt(
    raw: DataFrame, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine) from a PERMISSIVE scan. The quarantine side keeps
    the parsed columns alongside the raw line — both because partial parses
    are diagnostic, and because Spark disallows plans that reference ONLY
    the internal corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN)."""
    good = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(
        *schema.fieldNames(), F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, bad


def read_orc(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """ORC scan with an explicit schema — the second columnar format a
    migration target commonly holds (Hive warehouses). ORC supports the
    same predicate pushdown / column pruning as parquet in Spark; no
    quarantine split because columnar files are either readable or not
    (there is no per-line corrupt record)."""
    return spark.read.schema(schema).orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink, optionally partitioned (same pruning layout contract as
    ``write_partitioned``)."""
    w = df.write.mode(mode)
    if partition_cols:
        w = (
            df.repartition(*[F.col(c) for c in partition_cols])
            .write.mode(mode)
            .partitionBy(*partition_cols)
        )
    w.orc(path)


def read_text_lines(
    spark: SparkSession, path: str, min_bytes: int = 1
) -> DataFrame:
    """Raw text-line source → (line_id, line) — the shape a crawl/text-dump
    lands in before any parsing. Line ids are content-derived (md5 of the
    line) rather than positional: monotonically_increasing_id is not stable
    across scans, and downstream dedup keys on content anyway. Lines with
    fewer than ``min_bytes`` non-whitespace-adjacent bytes are dropped."""
    raw = spark.read.text(path)
    return (
        raw.filter(F.length(F.trim(F.col("value"))) >= min_bytes)
        .select(
            F.md5(F.col("value")).alias("line_id"),
            F.col("value").alias("line"),
        )
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet sink: directory layout on ``partition_cols``
    (reader-side partition pruning), rows sorted within files on
    ``sort_cols`` (row-group min/max skipping). The sort is
    sortWithinPartitions — no global shuffle is added beyond the
    partition-column distribution."""
    out = df.repartition(*[F.col(c) for c in partition_cols])
    if sort_cols:
        out = out.sortWithinPartitions(*partition_cols, *sort_cols)
    out.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def read_fixed_width(
    spark: SparkSession,
    path: str,
    spec: list[tuple[str, int, int, str]],
    min_line_len: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Fixed-width text files → (good, quarantine) — the BCP/-mainframe
    export format SQL Server shops actually hand over (``bcp ... -c`` with
    fixed field lengths). ``spec`` is (column, 1-based start, length, type)
    per field; slicing is pure JVM ``substring`` + trim + cast, so the
    parse is whole-stage-codegen and embarrassingly parallel like every
    other text source here.

    Quarantine contract (same as read_jsonl/read_csv): a line shorter than
    the last field's extent, or with a field that fails its numeric cast,
    lands in the quarantine frame with the raw line preserved — never
    dropped, never fatal. Casts go through TRY-semantics (cast of a
    non-numeric trimmed slice yields NULL, which flags the row) while a
    genuinely empty slice stays NULL without flagging, matching how BCP
    writes NULLs as spaces only when the column allows them."""
    if min_line_len is None:
        min_line_len = max(start + length - 1 for _, start, length, _ in spec)
    raw = spark.read.text(path).withColumnRenamed("value", "_raw")
    cols = []
    bad = F.length(F.rtrim(F.col("_raw"))) < F.lit(min_line_len)
    for name, start, length, typ in spec:
        slice_ = F.trim(F.substring(F.col("_raw"), start, length))
        empty = slice_ == ""
        if typ in ("bigint", "int", "double", "date", "timestamp"):
            # try_cast, not cast: ANSI mode makes a malformed cast FATAL,
            # and the whole point is to quarantine the row instead
            cast = slice_.try_cast(typ)
            bad = bad | (~empty & cast.isNull())
            cols.append(F.when(empty, F.lit(None)).otherwise(cast).alias(name))
        else:
            cols.append(F.when(empty, F.lit(None).cast("string")).otherwise(slice_).alias(name))
    parsed = raw.select(F.col("_raw"), bad.alias("_bad"), *cols)
    good = parsed.filter(~F.col("_bad")).drop("_raw", "_bad")
    quarantine = parsed.filter(F.col("_bad")).select(F.col("_raw").alias("raw_line"))
    return good, quarantine
