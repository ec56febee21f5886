"""Per-table transfer plans + job orchestrator (A12/A13, B19/B20).

The reference's generate_kettle (:925-1352) emits one Kettle transformation
per table and chains them in a job: START → init SQL → per-table transfer
(alphabetical) → end SQL. Here a plan is a small dataclass and the
orchestrator is driver-side Python:

- plan selection mirrors the reference (:1163-1166): PK present →
  incremental (diff+merge) is *possible*; no PK → full reload only.
- full load = scan → cleanse (A5) → truncate+append sink.
- incremental = canonicalize both sides → diff (A9) → apply (A10).
- hooks = the init/teardown SQL slots (A13; cast install / trigger disable
  have no Spark-side meaning, but sinks may need session SQL).
- metrics mirror kettle_report.pl (B20): per-table duration + rows/sec,
  sorted by duration descending.

Stores are pluggable: ParquetStore for local fixtures/tests, JDBC via
sources.jdbc options for real databases.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..catalog.model import Catalog, Table
from ..operators.cleanse import cleanse_strings
from ..operators.diff import diff
from ..operators.merge import apply_diff


class ParquetStore:
    """A directory of `{schema}/{table}.parquet` acting as a database —
    the local stand-in for a JDBC endpoint."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def path(self, schema: str, table: str) -> str:
        return os.path.join(self.root, schema, f"{table}.parquet")

    def read(self, schema: str, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(schema, table))

    def write(self, df: DataFrame, schema: str, table: str, mode: str = "overwrite") -> None:
        df.write.mode(mode).parquet(self.path(schema, table))

    def exists(self, schema: str, table: str) -> bool:
        return os.path.exists(self.path(schema, table))


@dataclass
class TableTransfer:
    schema: str
    table: Table
    mode: str  # 'full' | 'incremental'
    cleanse: bool = True


@dataclass
class TransferMetrics:
    schema: str
    table: str
    mode: str
    rows: int
    seconds: float

    @property
    def rows_per_sec(self) -> float:
        return self.rows / self.seconds if self.seconds > 0 else float("inf")


def build_transfer_plans(catalog: Catalog, incremental: bool = False) -> list[TableTransfer]:
    """One plan per table, alphabetical like the reference's job chain
    (:1199-1245). incremental=True requests diff-sync where a PK exists;
    PK-less tables fall back to full reload (:1163-1166)."""
    plans = []
    for sname, table in catalog.all_tables():
        mode = "incremental" if incremental and table.primary_key else "full"
        plans.append(TableTransfer(schema=sname, table=table, mode=mode))
    return plans


class Orchestrator:
    """Sequential per-table job runner with before/after hooks (A12/A13).

    Sequential by default like the reference's job chain; per-table work is
    already cluster-parallel inside Spark, so driver-side concurrency only
    helps when tables are tiny — ``max_workers>1`` enables it for that case.
    """

    def __init__(
        self,
        source: ParquetStore,
        target: ParquetStore,
        before_hooks: list[Callable[[], None]] | None = None,
        after_hooks: list[Callable[[], None]] | None = None,
        max_workers: int = 1,
    ):
        self.source = source
        self.target = target
        self.before_hooks = before_hooks or []
        self.after_hooks = after_hooks or []
        self.max_workers = max_workers

    def _run_one(self, plan: TableTransfer) -> TransferMetrics:
        t0 = time.time()
        s, tname = plan.schema, plan.table.name
        src = self.source.read(s, tname)
        if plan.cleanse:
            src = cleanse_strings(src)  # A5 — the only row-level transform

        if plan.mode == "incremental" and self.target.exists(s, tname):
            keys = plan.table.primary_key.cols
            tgt = self.target.read(s, tname)
            synced = apply_diff(diff(src, tgt, keys))
            # rewrite-by-union: for file-backed targets the post-diff state
            # is a full rewrite (Delta MERGE at 100 TB; see operators/merge.py)
            out = synced.select(*src.columns)
        else:
            out = src

        # write via a temp path then move — the parquet overwrite would
        # otherwise clobber the input it is still reading (self-join on target)
        tmp = self.target.path(s, tname) + ".tmp"
        out.write.mode("overwrite").parquet(tmp)
        final = self.target.path(s, tname)
        import shutil

        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)

        rows = self.target.read(s, tname).count()
        return TransferMetrics(
            schema=s, table=tname, mode=plan.mode, rows=rows, seconds=time.time() - t0
        )

    def run(self, plans: list[TableTransfer]) -> list[TransferMetrics]:
        for hook in self.before_hooks:
            hook()
        metrics: list[TransferMetrics] = []
        if self.max_workers <= 1:
            for plan in plans:
                metrics.append(self._run_one(plan))
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=self.max_workers) as ex:
                metrics = list(ex.map(self._run_one, plans))
        for hook in self.after_hooks:
            hook()
        return metrics


def format_report(metrics: list[TransferMetrics]) -> str:
    """kettle_report.pl-format summary (B20, kettle_report.pl:63-67):
    per-table duration and rows/sec, sorted by duration descending."""
    lines = ["table                                    mode         rows   duration(s)   rows/sec"]
    for m in sorted(metrics, key=lambda m: -m.seconds):
        lines.append(
            f"{m.schema + '.' + m.table:<40} {m.mode:<11} {m.rows:>7} "
            f"{m.seconds:>12.2f} {m.rows_per_sec:>10.0f}"
        )
    total_rows = sum(m.rows for m in metrics)
    total_sec = sum(m.seconds for m in metrics)
    lines.append(f"TOTAL: {total_rows} rows in {total_sec:.2f}s")
    return "\n".join(lines)
