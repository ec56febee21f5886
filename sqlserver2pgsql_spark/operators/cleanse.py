"""A5 — scalar cleanse operator.

The reference's only row-level compute operator is a UserDefinedJavaClass that
strips NUL bytes (``\\x00``) from every string field, because PostgreSQL text
columns cannot store them (sqlserver2pgsql.pl:3568-3653, regex at :3597).

Spark-first re-expression: a single JVM-side projection with
``regexp_replace`` over the StringType columns — whole-stage-codegen'd, no
Python in the hot path, and column-pruned/pushdown-transparent because it is
a plain ``select``. The reference runs PARALLELISM_OUT copies of the Java
class; here parallelism is the DataFrame's partitioning, no knob needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def cleanse_strings(df: DataFrame, pattern: str = "\x00") -> DataFrame:
    """Strip ``pattern`` (default NUL byte) from every string column.

    Non-string columns pass through untouched, like the reference's
    ``instanceof String`` guard (sqlserver2pgsql.pl:3620-3630).
    """
    cols = []
    for field in df.schema.fields:
        if isinstance(field.dataType, StringType):
            cols.append(
                F.regexp_replace(F.col(field.name), F.lit(pattern), F.lit("")).alias(field.name)
            )
        else:
            cols.append(F.col(field.name))
    return df.select(*cols)
