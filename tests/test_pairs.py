"""grouped_pairs (operators/pairs.py) — the repo's single bounded pair
generator (VERDICT r4 #3: q247/q252 previously used a raw per-group
self-join with a docstring-only cap). Exactness vs the brute-force
self-join, ordering contract, and the max_group drop semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from sqlserver2pgsql_spark.operators.pairs import grouped_pairs


def _df(spark, rows):
    return spark.createDataFrame(rows, "g int, item int")


def test_grouped_pairs_matches_self_join(spark):
    rows = [
        (1, 10), (1, 20), (1, 30), (1, 30),  # dup item collapses
        (2, 5),                               # singleton: no pairs
        (3, 7), (3, 9),
    ]
    df = _df(spark, rows)
    got = sorted(
        grouped_pairs(df, "g", "item").collect(), key=lambda r: (r.p1, r.p2)
    )
    d = df.distinct()
    a = d.select("g", F.col("item").alias("p1"))
    b = d.select("g", F.col("item").alias("p2"))
    want = sorted(
        a.join(b, "g").filter(F.col("p1") < F.col("p2")).select("p1", "p2").collect(),
        key=lambda r: (r.p1, r.p2),
    )
    assert [(r.p1, r.p2) for r in got] == [(r.p1, r.p2) for r in want]
    assert all(r.p1 < r.p2 for r in got)


def test_grouped_pairs_max_group_drops_oversized(spark):
    rows = [(1, i) for i in range(5)] + [(2, 100), (2, 200)]
    df = _df(spark, rows)
    got = grouped_pairs(df, "g", "item", max_group=4).collect()
    # group 1 (5 items) exceeds the cap and contributes nothing;
    # group 2 contributes its single pair.
    assert [(r.p1, r.p2) for r in got] == [(100, 200)]


def test_grouped_pairs_on_overflow_error_raises(spark):
    import pytest

    rows = [(1, i) for i in range(5)] + [(2, 100), (2, 200)]
    df = _df(spark, rows)
    got = grouped_pairs(df, "g", "item", max_group=4, on_overflow="error")
    with pytest.raises(Exception, match="max_group=4.*g=1"):
        got.collect()


def test_grouped_pairs_on_overflow_error_exact_under_cap(spark):
    rows = [(1, i) for i in range(4)] + [(2, 100), (2, 200)]
    df = _df(spark, rows)
    got = sorted(
        grouped_pairs(df, "g", "item", max_group=4, on_overflow="error").collect(),
        key=lambda r: (r.p1, r.p2),
    )
    assert [(r.p1, r.p2) for r in got] == [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (100, 200),
    ]


def test_grouped_pairs_on_overflow_error_struct_items(spark):
    # q190's shape: struct items, keep_group — the raise_error guard must
    # type-unify with a struct column
    import pytest

    df = spark.createDataFrame(
        [(1, 1, 10), (1, 2, 20), (1, 3, 30)], "g int, i int, v int"
    ).select("g", F.struct("i", "v").alias("it"))
    ok = grouped_pairs(
        df, "g", "it", keep_group=True, max_group=3, on_overflow="error"
    ).collect()
    assert len(ok) == 3
    bad = grouped_pairs(
        df, "g", "it", keep_group=True, max_group=2, on_overflow="error"
    )
    with pytest.raises(Exception, match="max_group=2"):
        bad.collect()


def test_grouped_pairs_on_overflow_rejects_unknown_mode(spark):
    import pytest

    df = _df(spark, [(1, 3), (1, 4)])
    with pytest.raises(ValueError, match="on_overflow"):
        grouped_pairs(df, "g", "item", on_overflow="warn")


def test_grouped_pairs_column_aliases(spark):
    df = _df(spark, [(1, 3), (1, 4)])
    got = grouped_pairs(df, "g", "item", left="pi", right="pj")
    assert got.columns == ["pi", "pj"]
    assert [(r.pi, r.pj) for r in got.collect()] == [(3, 4)]


def test_grouped_pairs_keep_group(spark):
    df = _df(spark, [(1, 3), (1, 4), (2, 7), (2, 8), (2, 9)])
    got = sorted(
        grouped_pairs(df, "g", "item", keep_group=True).collect(),
        key=lambda r: (r.g, r.p1, r.p2),
    )
    assert got[0].asDict() == {"g": 1, "p1": 3, "p2": 4}
    assert [(r.g, r.p1, r.p2) for r in got] == [
        (1, 3, 4), (2, 7, 8), (2, 7, 9), (2, 8, 9),
    ]
