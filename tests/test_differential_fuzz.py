"""Differential query fuzzing (SQLancer-style, seeded): random
filter/join/group/agg/having compositions are built ONCE as a small AST,
rendered BOTH as DataFrame-API operations (the idiom every engine query
uses) and as DuckDB SQL, and compared for exact value equality.

The grammar is restricted to operations with exact cross-engine semantics:
integer/categorical predicates, count / count-distinct / integer sums /
min-max (no float accumulation), deterministic ORDER BY. Every seed is a
frozen regression case — a semantics divergence in filter pushdown, join
planning, null handling, or aggregation shows up here before any
hand-written query would hit it."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_matches_oracle

# --- schema metadata for the generator --------------------------------------

TABLES = {
    "orders": {
        "key": "o_orderkey",
        "cats": {
            "o_orderstatus": ["O", "F", "P"],
            "o_orderpriority": ["1-URGENT", "3-MEDIUM", "5-LOW"],
        },
        "nums": {"o_orderkey": (0, 15000), "o_custkey": (0, 1500)},
        "meas": ["o_totalprice"],
    },
    "lineitem": {
        "key": "l_orderkey",
        "cats": {"l_returnflag": ["A", "N", "R"], "l_linestatus": ["O", "F"]},
        "nums": {"l_partkey": (0, 2000), "l_suppkey": (0, 100), "l_quantity": (1, 50)},
        "meas": ["l_extendedprice"],
    },
    "customer": {
        "key": "c_custkey",
        "cats": {"c_mktsegment": ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]},
        "nums": {"c_custkey": (0, 1500), "c_nationkey": (0, 25)},
        "meas": ["c_acctbal"],
    },
    "part": {
        "key": "p_partkey",
        "cats": {"p_brand": ["Brand#11", "Brand#21", "Brand#22"]},
        "nums": {"p_partkey": (0, 2000), "p_size": (1, 50)},
        "meas": ["p_retailprice"],
    },
}

JOINS = [
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
    ("lineitem", "part", "l_partkey", "p_partkey"),
]


def _gen(seed: int) -> dict:
    rng = random.Random(seed)
    if rng.random() < 0.5:
        t1, t2, k1, k2 = rng.choice(JOINS)
        tables, join = [t1, t2], (k1, k2)
    else:
        tables, join = [rng.choice(list(TABLES))], None

    cats = {c: d for t in tables for c, d in TABLES[t]["cats"].items()}
    nums = {c: r for t in tables for c, r in TABLES[t]["nums"].items()}

    preds = []
    for _ in range(rng.randrange(0, 3)):
        if rng.random() < 0.5 and cats:
            c = rng.choice(sorted(cats))
            if rng.random() < 0.3:
                vals = rng.sample(cats[c], k=min(2, len(cats[c])))
                preds.append(("in", c, vals))
            else:
                preds.append(("=", c, rng.choice(cats[c])))
        else:
            c = rng.choice(sorted(nums))
            lo, hi = nums[c]
            op = rng.choice(["<", "<=", ">", ">="])
            preds.append((op, c, rng.randrange(lo, hi + 1)))
    conj = rng.choice(["AND", "OR"]) if len(preds) == 2 else "AND"

    group = rng.sample(sorted(cats), k=rng.randrange(0, min(2, len(cats)) + 1))
    aggs = []
    pool = ["count_star", "count_distinct", "sum_int", "min_meas", "max_meas"]
    for i in range(rng.randrange(1, 4)):
        kind = rng.choice(pool)
        if kind == "count_star":
            aggs.append(("count_star", None, f"a{i}"))
        elif kind == "count_distinct":
            aggs.append(("count_distinct", TABLES[tables[0]]["key"], f"a{i}"))
        elif kind == "sum_int":
            c = rng.choice(sorted(nums))
            aggs.append(("sum_int", c, f"a{i}"))
        else:
            c = rng.choice([m for t in tables for m in TABLES[t]["meas"]])
            aggs.append((kind, c, f"a{i}"))
    having = rng.randrange(1, 50) if (group and rng.random() < 0.4) else None
    return {
        "tables": tables, "join": join, "preds": preds, "conj": conj,
        "group": group, "aggs": aggs, "having": having,
    }


def _pred_sql(p) -> str:
    op, c, v = p
    if op == "in":
        return f"{c} IN ({', '.join(repr(x) for x in v)})"
    lit = repr(v) if isinstance(v, str) else str(v)
    return f"{c} {op} {lit}"


def _agg_sql(a) -> str:
    kind, c, alias = a
    body = {
        "count_star": "count(*)",
        "count_distinct": f"count(DISTINCT {c})",
        "sum_int": f"CAST(sum(CAST({c} AS BIGINT)) AS BIGINT)",
        "min_meas": f"min({c})",
        "max_meas": f"max({c})",
    }[kind]
    return f"{body} AS {alias}"


def to_sql(q: dict) -> str:
    if q["join"]:
        t1, t2 = q["tables"]
        k1, k2 = q["join"]
        frm = f"{t1} JOIN {t2} ON {t1}.{k1} = {t2}.{k2}"
    else:
        frm = q["tables"][0]
    glue = " %s " % q["conj"]
    where = " WHERE " + glue.join(_pred_sql(p) for p in q["preds"]) if q["preds"] else ""
    sel = ", ".join(q["group"] + [_agg_sql(a) for a in q["aggs"]])
    grp = f" GROUP BY {', '.join(q['group'])}" if q["group"] else ""
    hav = f" HAVING count(*) > {q['having']}" if q["having"] else ""
    order_cols = q["group"] + [a[2] for a in q["aggs"]]
    return f"SELECT {sel} FROM {frm}{where}{grp}{hav} ORDER BY {', '.join(order_cols)}"


def to_spark(spark, q: dict):
    dfs = {t: spark.read.parquet(f"{SF_DIR}/{t}.parquet") for t in q["tables"]}
    if q["join"]:
        t1, t2 = q["tables"]
        k1, k2 = q["join"]
        df = dfs[t1].join(dfs[t2], dfs[t1][k1] == dfs[t2][k2])
    else:
        df = dfs[q["tables"][0]]

    def pred_col(p):
        op, c, v = p
        col = F.col(c)
        return {
            "=": col == v, "<": col < v, "<=": col <= v,
            ">": col > v, ">=": col >= v, "in": col.isin(v),
        }[op if op != "in" else "in"]

    if q["preds"]:
        cond = pred_col(q["preds"][0])
        for p in q["preds"][1:]:
            cond = (cond | pred_col(p)) if q["conj"] == "OR" else (cond & pred_col(p))
        df = df.filter(cond)

    def agg_col(a):
        kind, c, alias = a
        return {
            "count_star": F.count(F.lit(1)),
            "count_distinct": F.countDistinct(F.col(c)) if c else None,
            "sum_int": F.sum(F.col(c).cast("long")) if c else None,
            "min_meas": F.min(c) if c else None,
            "max_meas": F.max(c) if c else None,
        }[kind].alias(alias)

    aggs = [agg_col(a) for a in q["aggs"]]
    if q["having"]:
        aggs.append(F.count(F.lit(1)).alias("__n"))
    out = df.groupBy(*q["group"]).agg(*aggs) if q["group"] else df.agg(*aggs)
    if q["having"]:
        out = out.filter(F.col("__n") > q["having"]).drop("__n")
    order_cols = q["group"] + [a[2] for a in q["aggs"]]
    return out.orderBy(*order_cols)


@pytest.mark.parametrize("seed", range(48))
def test_differential_random_query(seed, spark, duck):
    q = _gen(seed)
    assert_matches_oracle(to_spark(spark, q), duck, to_sql(q))


# --- window-function grammar ------------------------------------------------

WINFUNCS = ["row_number", "rank", "dense_rank", "lag", "lead", "running_sum"]


def _gen_window(seed: int) -> dict:
    rng = random.Random(seed + 10_000)
    table = rng.choice(["orders", "lineitem"])
    meta = TABLES[table]
    part = rng.choice(sorted(meta["cats"]))
    order_num = rng.choice(sorted(meta["nums"]))
    key = meta["key"]
    fns = rng.sample(WINFUNCS, k=rng.randrange(1, 4))
    topk = rng.randrange(2, 9) if rng.random() < 0.5 else None
    return {"table": table, "part": part, "order": order_num, "key": key,
            "fns": fns, "topk": topk}


def _win_sql(q: dict) -> str:
    over = (f"PARTITION BY {q['part']} ORDER BY {q['order']}, {q['key']}"
            if q["part"] else f"ORDER BY {q['order']}, {q['key']}")
    cols = []
    for i, fn in enumerate(q["fns"]):
        body = {
            "row_number": f"row_number() OVER ({over})",
            "rank": f"rank() OVER (PARTITION BY {q['part']} ORDER BY {q['order']})",
            "dense_rank": f"dense_rank() OVER (PARTITION BY {q['part']} ORDER BY {q['order']})",
            "lag": f"coalesce(lag({q['key']}) OVER ({over}), -1)",
            "lead": f"coalesce(lead({q['key']}) OVER ({over}), -1)",
            "running_sum": f"CAST(sum(CAST({q['order']} AS BIGINT)) OVER ({over} ROWS UNBOUNDED PRECEDING) AS BIGINT)",
        }[fn]
        cols.append(f"CAST({body} AS BIGINT) AS w{i}")
    sel = f"SELECT {q['part']}, {q['key']}, {', '.join(cols)} FROM {q['table']}"
    if q["topk"]:
        inner = sel.replace("SELECT", "SELECT row_number() OVER (" + over + ") AS __rn,", 1)
        return (f"SELECT * EXCLUDE (__rn) FROM ({inner}) WHERE __rn <= {q['topk']} "
                f"ORDER BY {q['part']}, {q['key']}")
    return sel + f" ORDER BY {q['part']}, {q['key']}"


def _win_spark(spark, q: dict):
    from pyspark.sql import Window as W

    df = spark.read.parquet(f"{SF_DIR}/{q['table']}.parquet")
    over = W.partitionBy(q["part"]).orderBy(q["order"], q["key"])
    rank_over = W.partitionBy(q["part"]).orderBy(q["order"])
    run = over.rowsBetween(W.unboundedPreceding, W.currentRow)
    cols = []
    for i, fn in enumerate(q["fns"]):
        c = {
            "row_number": lambda: F.row_number().over(over),
            "rank": lambda: F.rank().over(rank_over),
            "dense_rank": lambda: F.dense_rank().over(rank_over),
            "lag": lambda: F.coalesce(F.lag(q["key"]).over(over), F.lit(-1)),
            "lead": lambda: F.coalesce(F.lead(q["key"]).over(over), F.lit(-1)),
            "running_sum": lambda: F.sum(F.col(q["order"]).cast("long")).over(run),
        }[fn]()
        cols.append(c.cast("long").alias(f"w{i}"))
    out = df.select(q["part"], q["key"], *cols,
                    F.row_number().over(over).alias("__rn"))
    if q["topk"]:
        out = out.filter(F.col("__rn") <= q["topk"])
    return out.drop("__rn").orderBy(q["part"], q["key"])


@pytest.mark.parametrize("seed", range(24))
def test_differential_window_query(seed, spark, duck):
    q = _gen_window(seed)
    assert_matches_oracle(_win_spark(spark, q), duck, _win_sql(q))


# --- set-operation grammar ---------------------------------------------------

SETOPS = ["union_all", "union", "intersect", "intersect_all", "except", "except_all"]


def _gen_setop(seed: int) -> dict:
    rng = random.Random(seed + 20_000)
    table = rng.choice(["orders", "lineitem", "part"])
    meta = TABLES[table]
    cat = rng.choice(sorted(meta["cats"]))
    num = rng.choice(sorted(meta["nums"]))
    lo, hi = meta["nums"][num]
    # two overlapping predicates so every op has non-trivial input overlap
    a = rng.randrange(lo, hi), rng.choice(["<", ">="])
    b = rng.randrange(lo, hi), rng.choice(["<", ">="])
    return {"table": table, "key": meta["key"], "cat": cat, "num": num,
            "pa": a, "pb": b, "op": rng.choice(SETOPS)}


def _setop_sql(q: dict) -> str:
    sel = f"SELECT {q['key']} AS k, {q['cat']} AS c FROM {q['table']}"
    wa = f"{sel} WHERE {q['num']} {q['pa'][1]} {q['pa'][0]}"
    wb = f"{sel} WHERE {q['num']} {q['pb'][1]} {q['pb'][0]}"
    op = {
        "union_all": "UNION ALL", "union": "UNION",
        "intersect": "INTERSECT", "intersect_all": "INTERSECT ALL",
        "except": "EXCEPT", "except_all": "EXCEPT ALL",
    }[q["op"]]
    return f"SELECT k, c, CAST(count(*) AS BIGINT) AS n FROM (({wa}) {op} ({wb})) GROUP BY k, c ORDER BY k, c"


def _setop_spark(spark, q: dict):
    df = spark.read.parquet(f"{SF_DIR}/{q['table']}.parquet")
    num = F.col(q["num"])

    def side(v, op):
        pred = num < v if op == "<" else num >= v
        return df.filter(pred).select(
            F.col(q["key"]).alias("k"), F.col(q["cat"]).alias("c")
        )

    a, b = side(*q["pa"]), side(*q["pb"])
    out = {
        "union_all": lambda: a.unionAll(b),
        "union": lambda: a.unionAll(b).distinct(),
        "intersect": lambda: a.intersect(b),
        "intersect_all": lambda: a.intersectAll(b),
        "except": lambda: a.subtract(b),
        "except_all": lambda: a.exceptAll(b),
    }[q["op"]]()
    return (
        out.groupBy("k", "c").agg(F.count(F.lit(1)).alias("n")).orderBy("k", "c")
    )


@pytest.mark.parametrize("seed", range(24))
def test_differential_setop_query(seed, spark, duck):
    q = _gen_setop(seed)
    assert_matches_oracle(_setop_spark(spark, q), duck, _setop_sql(q))

# --- scalar-expression grammar ------------------------------------------------
#
# Random expression TREES over integer and string columns, restricted to ops
# with exact cross-engine semantics: bounded integer arithmetic (ANSI-safe —
# multiplication only over leaves so depth-3 trees stay far inside BIGINT),
# % (dividend-sign remainder in both engines), CASE/nullif/coalesce null
# routing, greatest/least, and string upper/lower/substr/replace/concat.
# Exercises constant folding, null propagation, and expression codegen.


def _gen_expr(seed: int) -> dict:
    rng = random.Random(seed + 30_000)
    table = rng.choice(["orders", "lineitem", "customer", "part"])
    meta = TABLES[table]

    def int_node(depth: int) -> dict:
        kinds = ["col", "lit"]
        if depth > 0:
            kinds += ["add", "sub", "case", "abs", "greatest", "least",
                      "mod", "coalesce_nullif"]
            if depth == 1:  # leaves only below a mul: bounded magnitude
                kinds.append("mul")
        k = rng.choice(kinds)
        if k == "col":
            return {"k": "col", "c": rng.choice(sorted(meta["nums"]))}
        if k == "lit":
            return {"k": "lit", "v": rng.randrange(0, 100)}
        if k in ("add", "sub", "mul", "greatest", "least"):
            return {"k": k, "a": int_node(depth - 1), "b": int_node(depth - 1)}
        if k == "abs":
            return {"k": "abs", "a": int_node(depth - 1)}
        if k == "mod":
            return {"k": "mod", "a": int_node(depth - 1),
                    "m": rng.randrange(2, 97)}
        if k == "case":
            cat = rng.choice(sorted(meta["cats"]))
            return {"k": "case", "c": cat, "v": rng.choice(meta["cats"][cat]),
                    "a": int_node(depth - 1), "b": int_node(depth - 1)}
        # nullif plants NULLs; coalesce routes them — exact in both engines
        col = rng.choice(sorted(meta["nums"]))
        lo, hi = meta["nums"][col]
        return {"k": "coalesce_nullif", "c": col,
                "v": rng.randrange(lo, hi + 1), "d": int_node(depth - 1)}

    def str_node(depth: int) -> dict:
        if depth == 0:
            return {"k": "scol", "c": rng.choice(sorted(meta["cats"]))}
        k = rng.choice(["upper", "lower", "substr", "replace", "concat"])
        if k == "concat":
            return {"k": "concat", "a": str_node(depth - 1), "b": str_node(depth - 1)}
        if k == "substr":
            return {"k": "substr", "a": str_node(depth - 1),
                    "n": rng.randrange(1, 6)}
        if k == "replace":
            return {"k": "replace", "a": str_node(depth - 1),
                    "f": rng.choice("AEIRU-"), "t": rng.choice("xyz_")}
        return {"k": k, "a": str_node(depth - 1)}

    return {
        "table": table, "key": meta["key"],
        "ints": [int_node(3) for _ in range(2)],
        "strs": [str_node(2)],
    }


def _expr_sql(e: dict) -> str:
    k = e["k"]
    if k == "col":
        return f"CAST({e['c']} AS BIGINT)"
    if k == "lit":
        return str(e["v"])
    if k in ("add", "sub", "mul"):
        op = {"add": "+", "sub": "-", "mul": "*"}[k]
        return f"({_expr_sql(e['a'])} {op} {_expr_sql(e['b'])})"
    if k in ("greatest", "least"):
        return f"{k}({_expr_sql(e['a'])}, {_expr_sql(e['b'])})"
    if k == "abs":
        return f"abs({_expr_sql(e['a'])})"
    if k == "mod":
        return f"({_expr_sql(e['a'])} % {e['m']})"
    if k == "case":
        return (f"CASE WHEN {e['c']} = {e['v']!r} THEN {_expr_sql(e['a'])} "
                f"ELSE {_expr_sql(e['b'])} END")
    if k == "coalesce_nullif":
        return (f"coalesce(nullif(CAST({e['c']} AS BIGINT), {e['v']}), "
                f"{_expr_sql(e['d'])})")
    if k == "scol":
        return e["c"]
    if k == "concat":
        return f"({_expr_sql(e['a'])} || '|' || {_expr_sql(e['b'])})"
    if k == "substr":
        return f"substr({_expr_sql(e['a'])}, 1, {e['n']})"
    if k == "replace":
        return f"replace({_expr_sql(e['a'])}, {e['f']!r}, {e['t']!r})"
    return f"{k}({_expr_sql(e['a'])})"  # upper / lower


def _expr_col(e: dict):
    k = e["k"]
    if k == "col":
        return F.col(e["c"]).cast("long")
    if k == "lit":
        return F.lit(e["v"]).cast("long")
    if k == "add":
        return _expr_col(e["a"]) + _expr_col(e["b"])
    if k == "sub":
        return _expr_col(e["a"]) - _expr_col(e["b"])
    if k == "mul":
        return _expr_col(e["a"]) * _expr_col(e["b"])
    if k in ("greatest", "least"):
        fn = F.greatest if k == "greatest" else F.least
        return fn(_expr_col(e["a"]), _expr_col(e["b"]))
    if k == "abs":
        return F.abs(_expr_col(e["a"]))
    if k == "mod":
        return _expr_col(e["a"]) % e["m"]
    if k == "case":
        return F.when(F.col(e["c"]) == e["v"], _expr_col(e["a"])).otherwise(
            _expr_col(e["b"])
        )
    if k == "coalesce_nullif":
        return F.coalesce(
            F.nullif(F.col(e["c"]).cast("long"), F.lit(e["v"]).cast("long")),
            _expr_col(e["d"]),
        )
    if k == "scol":
        return F.col(e["c"])
    if k == "concat":
        return F.concat(_expr_col(e["a"]), F.lit("|"), _expr_col(e["b"]))
    if k == "substr":
        return F.substring(_expr_col(e["a"]), 1, e["n"])
    if k == "replace":
        return F.replace(_expr_col(e["a"]), F.lit(e["f"]), F.lit(e["t"]))
    return (F.upper if k == "upper" else F.lower)(_expr_col(e["a"]))


def _exprq_sql(q: dict) -> str:
    cols = [f"CAST({_expr_sql(e)} AS BIGINT) AS i{i}" for i, e in enumerate(q["ints"])]
    cols += [f"{_expr_sql(e)} AS s{i}" for i, e in enumerate(q["strs"])]
    return (f"SELECT {q['key']} AS k, {', '.join(cols)} FROM {q['table']} "
            f"ORDER BY k")


def _exprq_spark(spark, q: dict):
    df = spark.read.parquet(f"{SF_DIR}/{q['table']}.parquet")
    cols = [_expr_col(e).cast("long").alias(f"i{i}") for i, e in enumerate(q["ints"])]
    cols += [_expr_col(e).alias(f"s{i}") for i, e in enumerate(q["strs"])]
    return df.select(F.col(q["key"]).alias("k"), *cols).orderBy("k")


@pytest.mark.parametrize("seed", range(24))
def test_differential_expression_query(seed, spark, duck):
    q = _gen_expr(seed)
    assert_matches_oracle(_exprq_spark(spark, q), duck, _exprq_sql(q))

# --- subquery grammar ---------------------------------------------------------
#
# IN / NOT IN / EXISTS / NOT EXISTS / correlated-count subqueries. DuckDB runs
# the subquery form natively; the Spark side expresses the SAME semantics the
# way the engine's queries do — semi/anti joins and pre-aggregated count
# joins — so the seeds differentially test that composition (decorrelation,
# null-safe membership on non-null keys, empty-subquery edge cases).

SUBFORMS = ["in", "not_in", "exists", "not_exists", "cnt_range"]


def _gen_subq(seed: int) -> dict:
    rng = random.Random(seed + 40_000)
    outer, inner, ko, ki = rng.choice([
        ("orders", "lineitem", "o_orderkey", "l_orderkey"),
        ("customer", "orders", "c_custkey", "o_custkey"),
        ("part", "lineitem", "p_partkey", "l_partkey"),
    ])
    icats = TABLES[inner]["cats"]
    inums = TABLES[inner]["nums"]
    if rng.random() < 0.5:
        c = rng.choice(sorted(icats))
        ipred = ("=", c, rng.choice(icats[c]))
    else:
        c = rng.choice(sorted(inums))
        lo, hi = inums[c]
        ipred = (rng.choice(["<", ">="]), c, rng.randrange(lo, hi + 1))
    ocat = rng.choice(sorted(TABLES[outer]["cats"]))
    form = rng.choice(SUBFORMS)
    cnt_lo = rng.randrange(0, 3)
    cnt_hi = cnt_lo + rng.randrange(1, 5)
    return {"outer": outer, "inner": inner, "ko": ko, "ki": ki,
            "ipred": ipred, "ocat": ocat, "form": form,
            "cnt": (cnt_lo, cnt_hi)}


def _subq_sql(q: dict) -> str:
    pred = _pred_sql(q["ipred"])
    t, ko, ki = q["outer"], q["ko"], q["ki"]
    inner = q["inner"]
    if q["form"] == "in":
        where = f"{ko} IN (SELECT {ki} FROM {inner} WHERE {pred})"
    elif q["form"] == "not_in":
        where = f"{ko} NOT IN (SELECT {ki} FROM {inner} WHERE {pred})"
    elif q["form"] == "exists":
        where = (f"EXISTS (SELECT 1 FROM {inner} i "
                 f"WHERE i.{ki} = {t}.{ko} AND {pred.replace(q['ipred'][1], 'i.' + q['ipred'][1])})")
    elif q["form"] == "not_exists":
        where = (f"NOT EXISTS (SELECT 1 FROM {inner} i "
                 f"WHERE i.{ki} = {t}.{ko} AND {pred.replace(q['ipred'][1], 'i.' + q['ipred'][1])})")
    else:
        lo, hi = q["cnt"]
        where = (f"(SELECT count(*) FROM {inner} i WHERE i.{ki} = {t}.{ko} "
                 f"AND {pred.replace(q['ipred'][1], 'i.' + q['ipred'][1])}) "
                 f"BETWEEN {lo} AND {hi}")
    return (f"SELECT {q['ocat']} AS c, CAST(count(*) AS BIGINT) AS n "
            f"FROM {t} WHERE {where} GROUP BY {q['ocat']} ORDER BY c")


def _subq_spark(spark, q: dict):
    outer = spark.read.parquet(f"{SF_DIR}/{q['outer']}.parquet")
    inner = spark.read.parquet(f"{SF_DIR}/{q['inner']}.parquet")
    op, c, v = q["ipred"]
    col = F.col(c)
    ipred = {"=": col == v, "<": col < v, ">=": col >= v,
             "in": col.isin(v) if op == "in" else None}[op]
    fi = inner.filter(ipred)
    ko, ki = q["ko"], q["ki"]
    if q["form"] in ("in", "exists"):
        out = outer.join(fi, outer[ko] == fi[ki], "left_semi")
    elif q["form"] in ("not_in", "not_exists"):
        # keys are non-null in the fixture, so NOT IN == anti join
        out = outer.join(fi, outer[ko] == fi[ki], "left_anti")
    else:
        lo, hi = q["cnt"]
        cnts = fi.groupBy(F.col(ki).alias("__k")).agg(
            F.count(F.lit(1)).alias("__n")
        )
        out = (
            outer.join(cnts, outer[ko] == F.col("__k"), "left")
            .withColumn("__n", F.coalesce(F.col("__n"), F.lit(0)))
            .filter(F.col("__n").between(lo, hi))
        )
    return (
        out.groupBy(F.col(q["ocat"]).alias("c"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("c")
    )


@pytest.mark.parametrize("seed", range(24))
def test_differential_subquery(seed, spark, duck):
    q = _gen_subq(seed)
    assert_matches_oracle(_subq_spark(spark, q), duck, _subq_sql(q))

# --- outer-join grammar ---------------------------------------------------------
#
# LEFT / RIGHT / FULL outer joins with filters placed BEFORE the join (on
# either side) and null-probing predicates AFTER it — the null-semantics
# surface (unmatched-side NULLs, COUNT(col) vs COUNT(*), IS NULL filters)
# where engines classically diverge.

OJKINDS = ["left", "right", "full"]


def _gen_ojoin(seed: int) -> dict:
    rng = random.Random(seed + 50_000)
    t1, t2, k1, k2 = rng.choice(JOINS)
    kind = rng.choice(OJKINDS)

    def side_pred(t):
        meta = TABLES[t]
        if rng.random() < 0.5:
            c = rng.choice(sorted(meta["cats"]))
            return ("=", c, rng.choice(meta["cats"][c]))
        c = rng.choice(sorted(meta["nums"]))
        lo, hi = meta["nums"][c]
        return (rng.choice(["<", ">="]), c, rng.randrange(lo, hi + 1))

    p1 = side_pred(t1) if rng.random() < 0.7 else None
    p2 = side_pred(t2) if rng.random() < 0.7 else None
    # post-join probe on the nullable side's key
    null_side_key = {"left": k2, "right": k1,
                     "full": rng.choice([k1, k2])}[kind]
    post = rng.choice([None, "is_null", "not_null"])
    gcat = rng.choice(sorted(TABLES[t1]["cats"]) + sorted(TABLES[t2]["cats"]))
    gtab = t1 if gcat in TABLES[t1]["cats"] else t2
    count_col = rng.choice([k1, k2])
    return {"t1": t1, "t2": t2, "k1": k1, "k2": k2, "kind": kind,
            "p1": p1, "p2": p2, "post": post, "post_key": null_side_key,
            "gcat": gcat, "gtab": gtab, "count_col": count_col}


def _ojoin_sql(q: dict) -> str:
    w1 = f"(SELECT * FROM {q['t1']}" + (
        f" WHERE {_pred_sql(q['p1'])})" if q["p1"] else ")")
    w2 = f"(SELECT * FROM {q['t2']}" + (
        f" WHERE {_pred_sql(q['p2'])})" if q["p2"] else ")")
    kind = {"left": "LEFT", "right": "RIGHT", "full": "FULL"}[q["kind"]]
    post = ""
    if q["post"] == "is_null":
        post = f" WHERE {q['post_key']} IS NULL"
    elif q["post"] == "not_null":
        post = f" WHERE {q['post_key']} IS NOT NULL"
    # group key may itself be NULL on an unmatched side: grouped and counted
    return (
        f"SELECT {q['gcat']} AS g, CAST(count(*) AS BIGINT) AS n_rows, "
        f"CAST(count({q['count_col']}) AS BIGINT) AS n_keyed "
        f"FROM {w1} a {kind} JOIN {w2} b ON a.{q['k1']} = b.{q['k2']}{post} "
        f"GROUP BY {q['gcat']} ORDER BY g NULLS FIRST"
    )


def _ojoin_spark(spark, q: dict):
    def load(t, p):
        df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        if p:
            op, c, v = p
            col = F.col(c)
            df = df.filter({"=": col == v, "<": col < v, ">=": col >= v}[op])
        return df

    a = load(q["t1"], q["p1"])
    b = load(q["t2"], q["p2"])
    out = a.join(b, a[q["k1"]] == b[q["k2"]],
                 {"left": "left", "right": "right", "full": "full_outer"}[q["kind"]])
    if q["post"] == "is_null":
        out = out.filter(F.col(q["post_key"]).isNull())
    elif q["post"] == "not_null":
        out = out.filter(F.col(q["post_key"]).isNotNull())
    return (
        out.groupBy(F.col(q["gcat"]).alias("g"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.col(q["count_col"])).alias("n_keyed"),
        )
        .orderBy(F.col("g").asc_nulls_first())
    )


@pytest.mark.parametrize("seed", range(24))
def test_differential_outer_join(seed, spark, duck):
    q = _gen_ojoin(seed)
    assert_matches_oracle(_ojoin_spark(spark, q), duck, _ojoin_sql(q))

# --- filtered-aggregate grammar -------------------------------------------------
#
# FILTER (WHERE ...) aggregates — DuckDB runs the SQL-standard clause, Spark
# expresses the same semantics as conditional aggregation (sum(when),
# count(when), count(DISTINCT when) with NULL-skipping). Mixes plain,
# filtered, and filtered-DISTINCT aggregates over 0-2 group keys.


def _gen_fagg(seed: int) -> dict:
    rng = random.Random(seed + 60_000)
    table = rng.choice(["orders", "lineitem", "customer"])
    meta = TABLES[table]
    group = rng.sample(sorted(meta["cats"]), k=rng.randrange(0, min(2, len(meta["cats"])) + 1))

    def fpred():
        if rng.random() < 0.5:
            c = rng.choice(sorted(meta["cats"]))
            return ("=", c, rng.choice(meta["cats"][c]))
        c = rng.choice(sorted(meta["nums"]))
        lo, hi = meta["nums"][c]
        return (rng.choice(["<", ">="]), c, rng.randrange(lo, hi + 1))

    aggs = []
    for i in range(rng.randrange(2, 5)):
        kind = rng.choice(["cnt_f", "sum_f", "min_f", "cntd_f", "cnt_plain"])
        col = rng.choice(sorted(meta["nums"]))
        aggs.append((kind, col, fpred(), f"a{i}"))
    return {"table": table, "group": group, "aggs": aggs}


def _fagg_sql(q: dict) -> str:
    cols = []
    for kind, col, p, alias in q["aggs"]:
        pred = _pred_sql(p)
        body = {
            "cnt_f": f"count(*) FILTER (WHERE {pred})",
            "sum_f": f"CAST(coalesce(sum(CAST({col} AS BIGINT)) FILTER (WHERE {pred}), 0) AS BIGINT)",
            "min_f": f"min(CAST({col} AS BIGINT)) FILTER (WHERE {pred})",
            "cntd_f": f"count(DISTINCT {col}) FILTER (WHERE {pred})",
            "cnt_plain": "count(*)",
        }[kind]
        cols.append(f"CAST({body} AS BIGINT) AS {alias}")
    sel = ", ".join(q["group"] + cols)
    grp = f" GROUP BY {', '.join(q['group'])}" if q["group"] else ""
    order = ", ".join(q["group"] + [a[3] for a in q["aggs"]])
    return f"SELECT {sel} FROM {q['table']}{grp} ORDER BY {order}"


def _fagg_spark(spark, q: dict):
    df = spark.read.parquet(f"{SF_DIR}/{q['table']}.parquet")

    def pc(p):
        op, c, v = p
        col = F.col(c)
        return {"=": col == v, "<": col < v, ">=": col >= v}[op]

    aggs = []
    for kind, col, p, alias in q["aggs"]:
        w = F.when(pc(p), F.col(col))
        expr = {
            "cnt_f": F.count(F.when(pc(p), F.lit(1))),
            "sum_f": F.coalesce(F.sum(w.cast("long")), F.lit(0)),
            "min_f": F.min(w.cast("long")),
            "cntd_f": F.countDistinct(w),
            "cnt_plain": F.count(F.lit(1)),
        }[kind]
        aggs.append(expr.cast("long").alias(alias))
    out = df.groupBy(*q["group"]).agg(*aggs) if q["group"] else df.agg(*aggs)
    return out.orderBy(*(q["group"] + [a[3] for a in q["aggs"]]))


@pytest.mark.parametrize("seed", range(24))
def test_differential_filtered_aggregate(seed, spark, duck):
    q = _gen_fagg(seed)
    assert_matches_oracle(_fagg_spark(spark, q), duck, _fagg_sql(q))

# --- window-frame grammar --------------------------------------------------------
#
# ROWS / RANGE frames with random bound pairs over integer order keys.
# ROWS frames order on (num, key) — a unique total order, so frame content
# is engine-independent; RANGE frames order on the single numeric key and
# include peers (the SQL-standard tie semantics both engines implement).

FRAME_AGGS = ["sum", "min", "max", "count"]


def _gen_frame(seed: int) -> dict:
    rng = random.Random(seed + 70_000)
    table = rng.choice(["orders", "lineitem"])
    meta = TABLES[table]
    part = rng.choice(sorted(meta["cats"]))
    order = rng.choice(sorted(meta["nums"]))
    val = rng.choice(sorted(meta["nums"]))
    mode = rng.choice(["rows", "range"])
    lo = rng.choice(["unbounded", rng.randrange(0, 200), "current"])
    hi = rng.choice([rng.randrange(0, 200), "current", "unbounded"])
    # normalize invalid pairs (lo bound must not start after hi bound)
    if lo == "current" and hi == "current":
        hi = rng.randrange(1, 100)
    agg = rng.choice(FRAME_AGGS)
    return {"table": table, "part": part, "order": order, "val": val,
            "mode": mode, "lo": lo, "hi": hi, "agg": agg,
            "key": meta["key"]}


def _frame_sql_bound(b, side: str) -> str:
    if b == "unbounded":
        return f"UNBOUNDED {'PRECEDING' if side == 'lo' else 'FOLLOWING'}"
    if b == "current":
        return "CURRENT ROW"
    return f"{b} {'PRECEDING' if side == 'lo' else 'FOLLOWING'}"


def _frame_sql(q: dict) -> str:
    frame = f"{q['mode'].upper()} BETWEEN {_frame_sql_bound(q['lo'], 'lo')} AND {_frame_sql_bound(q['hi'], 'hi')}"
    order = (f"ORDER BY {q['order']}, {q['key']}" if q["mode"] == "rows"
             else f"ORDER BY {q['order']}")
    body = {
        "sum": f"sum(CAST({q['val']} AS BIGINT))",
        "min": f"min(CAST({q['val']} AS BIGINT))",
        "max": f"max(CAST({q['val']} AS BIGINT))",
        "count": "count(*)",
    }[q["agg"]]
    return (
        f"SELECT {q['part']} AS p, {q['key']} AS k, "
        f"CAST({body} OVER (PARTITION BY {q['part']} {order} {frame}) AS BIGINT) AS w "
        f"FROM {q['table']} ORDER BY p, k"
    )


def _frame_spark(spark, q: dict):
    from pyspark.sql import Window as W

    df = spark.read.parquet(f"{SF_DIR}/{q['table']}.parquet")

    def bound(b, side):
        if b == "unbounded":
            return W.unboundedPreceding if side == "lo" else W.unboundedFollowing
        if b == "current":
            return W.currentRow
        return -b if side == "lo" else b

    base = (W.partitionBy(q["part"]).orderBy(q["order"], q["key"])
            if q["mode"] == "rows"
            else W.partitionBy(q["part"]).orderBy(q["order"]))
    lo, hi = bound(q["lo"], "lo"), bound(q["hi"], "hi")
    w = base.rowsBetween(lo, hi) if q["mode"] == "rows" else base.rangeBetween(lo, hi)
    col = F.col(q["val"]).cast("long")
    expr = {
        "sum": F.sum(col), "min": F.min(col), "max": F.max(col),
        "count": F.count(F.lit(1)),
    }[q["agg"]]
    return df.select(
        F.col(q["part"]).alias("p"), F.col(q["key"]).alias("k"),
        expr.over(w).cast("long").alias("w"),
    ).orderBy("p", "k")


@pytest.mark.parametrize("seed", range(24))
def test_differential_window_frame(seed, spark, duck):
    q = _gen_frame(seed)
    assert_matches_oracle(_frame_spark(spark, q), duck, _frame_sql(q))

# --- date/time-function grammar ---------------------------------------------------
#
# Calendar derivations (year/month/day/quarter, date_trunc, last_day, day
# arithmetic, day diffs) grouped and counted — the cross-engine calendar
# surface, restricted to functions whose semantics are convention-free
# (weekday numbering and week-of-year are deliberately excluded; the
# engine's own queries derive weekdays arithmetically — see q179).

DATE_TABLES = {"orders": "o_orderdate", "lineitem": "l_shipdate"}


def _gen_dateq(seed: int) -> dict:
    rng = random.Random(seed + 80_000)
    table = rng.choice(sorted(DATE_TABLES))
    col = DATE_TABLES[table]
    derive = rng.choice(["year", "month", "quarter", "trunc_month",
                         "trunc_year", "last_day", "add_days"])
    add_n = rng.randrange(-90, 90)
    diff_anchor = f"199{rng.randrange(5, 9)}-0{rng.randrange(1, 9)}-15"
    key = TABLES[table]["key"]
    return {"table": table, "col": col, "derive": derive, "add_n": add_n,
            "anchor": diff_anchor, "key": key}


def _dateq_sql(q: dict) -> str:
    c = f"CAST({q['col']} AS DATE)"
    # date-valued keys are compared as ISO strings (the harness's pandas
    # compare sees datetime.date vs datetime64 otherwise — same values,
    # different physical types; the engine queries use the same contract)
    g = {
        "year": f"CAST(year({c}) AS BIGINT)",
        "month": f"CAST(month({c}) AS BIGINT)",
        "quarter": f"CAST(quarter({c}) AS BIGINT)",
        "trunc_month": f"CAST(CAST(date_trunc('month', {c}) AS DATE) AS VARCHAR)",
        "trunc_year": f"CAST(CAST(date_trunc('year', {c}) AS DATE) AS VARCHAR)",
        "last_day": f"CAST(last_day({c}) AS VARCHAR)",
        "add_days": f"CAST({c} + {q['add_n']} AS VARCHAR)",
    }[q["derive"]]
    return (
        f"SELECT {g} AS g, CAST(count(*) AS BIGINT) AS n, "
        f"CAST(min(datediff('day', DATE '{q['anchor']}', {c})) AS BIGINT) AS min_dd, "
        f"CAST(max(datediff('day', DATE '{q['anchor']}', {c})) AS BIGINT) AS max_dd "
        f"FROM {q['table']} GROUP BY 1 ORDER BY g"
    )


def _dateq_spark(spark, q: dict):
    df = spark.read.parquet(f"{SF_DIR}/{q['table']}.parquet")
    c = F.col(q["col"]).cast("date")
    g = {
        "year": F.year(c).cast("long"),
        "month": F.month(c).cast("long"),
        "quarter": F.quarter(c).cast("long"),
        "trunc_month": F.date_trunc("month", c).cast("date").cast("string"),
        "trunc_year": F.date_trunc("year", c).cast("date").cast("string"),
        "last_day": F.last_day(c).cast("string"),
        "add_days": F.date_add(c, q["add_n"]).cast("string"),
    }[q["derive"]]
    dd = F.datediff(c, F.lit(q["anchor"]).cast("date")).cast("long")
    return (
        df.select(g.alias("g"), dd.alias("dd"))
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("dd").alias("min_dd"),
            F.max("dd").alias("max_dd"),
        )
        .orderBy("g")
    )


@pytest.mark.parametrize("seed", range(24))
def test_differential_date_functions(seed, spark, duck):
    q = _gen_dateq(seed)
    assert_matches_oracle(_dateq_spark(spark, q), duck, _dateq_sql(q))

# --- grouping-sets / rollup / cube grammar -----------------------------------
#
# Random multi-level aggregations: ROLLUP / CUBE / explicit GROUPING SETS over
# one categorical + one derived integer bucket, with GROUPING() indicators and
# exact BIGINT aggregates. Exercises the Expand-based planning path (each
# input row replicated per grouping set) that plain GROUP BY never touches.
# Group values coalesce to a sentinel on BOTH sides so the super-aggregate
# NULLs never depend on engine null-sorting.

GSET_AGGS = ["count", "sum", "min", "max"]


def _gen_gset(seed: int) -> dict:
    rng = random.Random(seed + 90_000)
    table = rng.choice(["orders", "lineitem", "customer"])
    meta = TABLES[table]
    cat = rng.choice(sorted(meta["cats"]))
    num = rng.choice(sorted(meta["nums"]))
    k = rng.choice([3, 5, 7])
    mode = rng.choice(["rollup", "cube", "sets"])
    sets = None
    if mode == "sets":
        universe = [["cat", "bkt"], ["cat"], ["bkt"], []]
        sets = rng.sample(universe, k=rng.randrange(2, 5))
    agg = rng.choice(GSET_AGGS)
    val = rng.choice(sorted(meta["nums"]))
    return {"table": table, "cat": cat, "num": num, "k": k, "mode": mode,
            "sets": sets, "agg": agg, "val": val}


def _gset_sql(q: dict) -> str:
    bkt = f"(CAST({q['num']} AS BIGINT) % {q['k']})"
    if q["mode"] == "rollup":
        gb = f"ROLLUP({q['cat']}, {bkt})"
    elif q["mode"] == "cube":
        gb = f"CUBE({q['cat']}, {bkt})"
    else:
        rendered = []
        for s in q["sets"]:
            cols = [({"cat": q["cat"], "bkt": bkt})[c] for c in s]
            rendered.append(f"({', '.join(cols)})")
        gb = f"GROUPING SETS ({', '.join(rendered)})"
    body = {
        "count": "count(*)",
        "sum": f"sum(CAST({q['val']} AS BIGINT))",
        "min": f"min(CAST({q['val']} AS BIGINT))",
        "max": f"max(CAST({q['val']} AS BIGINT))",
    }[q["agg"]]
    return (
        f"SELECT coalesce({q['cat']}, '<all>') AS c, "
        f"coalesce(CAST({bkt} AS VARCHAR), '<all>') AS b, "
        f"CAST(grouping({q['cat']}) AS BIGINT) AS gc, "
        f"CAST(grouping({bkt}) AS BIGINT) AS gb, "
        f"CAST({body} AS BIGINT) AS v "
        f"FROM {q['table']} GROUP BY {gb} ORDER BY c, b, gc, gb"
    )


def _gset_spark(spark, q: dict):
    df = spark.read.parquet(f"{SF_DIR}/{q['table']}.parquet")
    bkt = (F.col(q["num"]).cast("long") % q["k"]).alias("bkt")
    df = df.select(F.col(q["cat"]).alias("cat"), bkt, F.col(q["val"]).alias("val"))
    if q["mode"] == "rollup":
        g = df.rollup("cat", "bkt")
    elif q["mode"] == "cube":
        g = df.cube("cat", "bkt")
    else:
        g = df.groupingSets([list(s) for s in q["sets"]], "cat", "bkt")
    body = {
        "count": F.count(F.lit(1)),
        "sum": F.sum(F.col("val").cast("long")),
        "min": F.min(F.col("val").cast("long")),
        "max": F.max(F.col("val").cast("long")),
    }[q["agg"]]
    return (
        g.agg(
            body.cast("long").alias("v"),
            F.grouping("cat").cast("long").alias("gc"),
            F.grouping("bkt").cast("long").alias("gb"),
        )
        .select(
            F.coalesce(F.col("cat"), F.lit("<all>")).alias("c"),
            F.coalesce(F.col("bkt").cast("string"), F.lit("<all>")).alias("b"),
            "gc", "gb", "v",
        )
        .orderBy("c", "b", "gc", "gb")
    )


@pytest.mark.parametrize("seed", range(24))
def test_differential_grouping_sets(seed, spark, duck):
    q = _gen_gset(seed)
    assert_matches_oracle(_gset_spark(spark, q), duck, _gset_sql(q))


# --- string-function grammar -------------------------------------------------
#
# Deep compositions of the string functions the scalar grammar doesn't reach:
# lpad/rpad, trim family, reverse, repeat, left/right, split_part, translate,
# plus a LIKE predicate. Every function in the set has identical 1-based /
# padding / empty-string semantics in Spark SQL and DuckDB; the composition
# depth (3) surfaces fold bugs no single-function test would.

STR_COLS = {
    "customer": ["c_name", "c_mktsegment"],
    "part": ["p_name", "p_brand"],
    "orders": ["o_orderpriority", "o_orderstatus"],
}


def _gen_strfn(seed: int) -> dict:
    rng = random.Random(seed + 100_000)
    table = rng.choice(sorted(STR_COLS))

    def node(depth: int) -> dict:
        if depth == 0:
            return {"k": "col", "c": rng.choice(STR_COLS[table])}
        k = rng.choice(
            ["lpad", "rpad", "trim", "reverse", "repeat", "left", "right",
             "split_part", "translate", "concat"]
        )
        if k in ("lpad", "rpad"):
            return {"k": k, "a": node(depth - 1), "n": rng.randrange(1, 20),
                    "p": rng.choice("*#.")}
        if k == "repeat":
            return {"k": k, "a": node(depth - 1), "n": rng.randrange(1, 3)}
        if k in ("left", "right"):
            return {"k": k, "a": node(depth - 1), "n": rng.randrange(1, 12)}
        if k == "split_part":
            return {"k": k, "a": node(depth - 1), "d": rng.choice([" ", "-"]),
                    "n": rng.randrange(1, 3)}
        if k == "translate":
            return {"k": k, "a": node(depth - 1), "f": "aeo", "t": "@30"}
        if k == "concat":
            return {"k": k, "a": node(depth - 1), "b": node(depth - 1)}
        return {"k": k, "a": node(depth - 1)}

    like = rng.choice([None, "%a%", "%e%", "B%", "%1%"])
    return {"table": table, "key": TABLES[table]["key"],
            "expr": node(rng.randrange(2, 4)), "like": like}


def _strfn_sql(e: dict) -> str:
    k = e["k"]
    if k == "col":
        return e["c"]
    a = _strfn_sql(e["a"])
    if k in ("lpad", "rpad"):
        return f"{k}({a}, {e['n']}, {e['p']!r})"
    if k == "repeat":
        return f"repeat({a}, {e['n']})"
    if k in ("left", "right"):
        return f"{k}({a}, {e['n']})"
    if k == "split_part":
        return f"split_part({a}, {e['d']!r}, {e['n']})"
    if k == "translate":
        return f"translate({a}, {e['f']!r}, {e['t']!r})"
    if k == "concat":
        return f"({a} || '|' || {_strfn_sql(e['b'])})"
    return f"trim({a})" if k == "trim" else f"reverse({a})"


def _strfn_col(e: dict):
    k = e["k"]
    if k == "col":
        return F.col(e["c"])
    a = _strfn_col(e["a"])
    if k == "lpad":
        return F.lpad(a, e["n"], e["p"])
    if k == "rpad":
        return F.rpad(a, e["n"], e["p"])
    if k == "repeat":
        return F.repeat(a, e["n"])
    if k == "left":
        return F.left(a, F.lit(e["n"]))
    if k == "right":
        return F.right(a, F.lit(e["n"]))
    if k == "split_part":
        return F.split_part(a, F.lit(e["d"]), F.lit(e["n"]))
    if k == "translate":
        return F.translate(a, e["f"], e["t"])
    if k == "concat":
        return F.concat(a, F.lit("|"), _strfn_col(e["b"]))
    return F.trim(a) if k == "trim" else F.reverse(a)


def _strfnq_sql(q: dict) -> str:
    where = f"WHERE {STR_COLS[q['table']][0]} LIKE {q['like']!r}" if q["like"] else ""
    return (f"SELECT {q['key']} AS k, {_strfn_sql(q['expr'])} AS s "
            f"FROM {q['table']} {where} ORDER BY k")


def _strfnq_spark(spark, q: dict):
    df = spark.read.parquet(f"{SF_DIR}/{q['table']}.parquet")
    if q["like"]:
        df = df.filter(F.col(STR_COLS[q["table"]][0]).like(q["like"]))
    return df.select(
        F.col(q["key"]).alias("k"), _strfn_col(q["expr"]).alias("s")
    ).orderBy("k")


@pytest.mark.parametrize("seed", range(24))
def test_differential_string_functions(seed, spark, duck):
    q = _gen_strfn(seed)
    assert_matches_oracle(_strfnq_spark(spark, q), duck, _strfnq_sql(q))


# --- navigation / distribution window-function grammar -----------------------
#
# The rank-family grammar's sibling: ntile, lag/lead with offsets and
# defaults, nth_value, percent_rank, cume_dist — the navigation and
# distribution functions. Ordering is always (num, key): a unique total
# order, so offsets and tile boundaries are engine-independent.
# percent_rank/cume_dist are single-division rationals of exact integer
# ranks — identical IEEE results on both engines, no rounding needed.

NAV_FNS = ["ntile", "lag", "lead", "nth_value", "percent_rank", "cume_dist"]


def _gen_nav(seed: int) -> dict:
    rng = random.Random(seed + 110_000)
    table = rng.choice(["orders", "lineitem", "customer"])
    meta = TABLES[table]
    part = rng.choice(sorted(meta["cats"]))
    order = rng.choice(sorted(meta["nums"]))
    fn = rng.choice(NAV_FNS)
    return {
        "table": table, "key": meta["key"], "part": part, "order": order,
        "fn": fn,
        "n": rng.randrange(2, 7),          # ntile buckets / nth position
        "off": rng.randrange(1, 4),        # lag/lead offset
        "dflt": rng.randrange(-5, 0),      # lag/lead default
    }


def _nav_sql(q: dict) -> str:
    over = f"OVER (PARTITION BY {q['part']} ORDER BY {q['order']}, {q['key']})"
    val = f"CAST({q['order']} AS BIGINT)"
    body = {
        "ntile": f"CAST(ntile({q['n']}) {over} AS BIGINT)",
        "lag": f"lag({val}, {q['off']}, {q['dflt']}) {over}",
        "lead": f"lead({val}, {q['off']}, {q['dflt']}) {over}",
        "nth_value": f"nth_value({val}, {q['n']}) {over}",
        "percent_rank": f"percent_rank() {over}",
        "cume_dist": f"cume_dist() {over}",
    }[q["fn"]]
    return (
        f"SELECT {q['part']} AS p, {q['key']} AS k, {body} AS w "
        f"FROM {q['table']} ORDER BY p, k"
    )


def _nav_spark(spark, q: dict):
    from pyspark.sql import Window as W

    df = spark.read.parquet(f"{SF_DIR}/{q['table']}.parquet")
    w = W.partitionBy(q["part"]).orderBy(q["order"], q["key"])
    val = F.col(q["order"]).cast("long")
    expr = {
        "ntile": lambda: F.ntile(q["n"]).over(w).cast("long"),
        "lag": lambda: F.lag(val, q["off"], q["dflt"]).over(w),
        "lead": lambda: F.lead(val, q["off"], q["dflt"]).over(w),
        "nth_value": lambda: F.nth_value(val, q["n"]).over(w),
        "percent_rank": lambda: F.percent_rank().over(w),
        "cume_dist": lambda: F.cume_dist().over(w),
    }[q["fn"]]()
    return df.select(
        F.col(q["part"]).alias("p"), F.col(q["key"]).alias("k"),
        expr.alias("w"),
    ).orderBy("p", "k")


@pytest.mark.parametrize("seed", range(24))
def test_differential_navigation_window(seed, spark, duck):
    q = _gen_nav(seed)
    assert_matches_oracle(_nav_spark(spark, q), duck, _nav_sql(q))


# --- try-arithmetic / overflow grammar ---------------------------------------
#
# ANSI edge semantics: try_add / try_subtract / try_multiply must return NULL
# (not wrap, not error) on BIGINT overflow, and try_cast must null malformed
# strings. The oracle mirrors the overflow test in HUGEINT with an explicit
# int64-range guard — an independent formulation of "did it overflow". Values
# are driven to the boundary with per-seed multipliers of fixture columns, so
# some rows overflow and some don't in the same query.

I64_MIN, I64_MAX = -(2**63), 2**63 - 1
TRY_OPS = ["add", "subtract", "multiply"]


def _gen_tryarith(seed: int) -> dict:
    rng = random.Random(seed + 120_000)
    table = rng.choice(["orders", "lineitem", "part"])
    meta = TABLES[table]
    num = rng.choice(sorted(meta["nums"]))
    op = rng.choice(TRY_OPS)
    # scale the column so a per-seed fraction of rows crosses the boundary
    shift = rng.choice([2**55, 2**57, 2**59])
    mul = rng.choice([255, 257, 511])
    return {"table": table, "key": meta["key"], "num": num, "op": op,
            "shift": shift, "mul": mul}


def _tryarith_sql(q: dict) -> str:
    base = f"(CAST({q['num']} AS BIGINT) * {q['mul']} + {q['shift']})"
    expr = {
        "add": f"CAST({base} AS HUGEINT) + CAST({base} AS HUGEINT)",
        "subtract": f"CAST(-{base} AS HUGEINT) - CAST({base} AS HUGEINT)",
        "multiply": f"CAST({base} AS HUGEINT) * 300",
    }[q["op"]]
    return (
        f"SELECT {q['key']} AS k, "
        f"CASE WHEN {expr} BETWEEN {I64_MIN} AND {I64_MAX} "
        f"THEN CAST({expr} AS BIGINT) ELSE NULL END AS v "
        f"FROM {q['table']} ORDER BY k"
    )


def _tryarith_spark(spark, q: dict):
    df = spark.read.parquet(f"{SF_DIR}/{q['table']}.parquet")
    base = F.col(q["num"]).cast("long") * q["mul"] + q["shift"]
    expr = {
        "add": lambda: F.try_add(base, base),
        "subtract": lambda: F.try_subtract(-base, base),
        "multiply": lambda: F.try_multiply(base, F.lit(300)),
    }[q["op"]]()
    return df.select(F.col(q["key"]).alias("k"), expr.alias("v")).orderBy("k")


@pytest.mark.parametrize("seed", range(24))
def test_differential_try_arithmetic(seed, spark, duck):
    q = _gen_tryarith(seed)
    assert_matches_oracle(_tryarith_spark(spark, q), duck, _tryarith_sql(q))


# --- array / higher-order-function grammar -----------------------------------
#
# Array pipelines over split() token arrays: sort, distinct (canonicalized by
# a following sort — Spark preserves first-occurrence order, DuckDB does not),
# reverse, slice, with a terminal join / size / element_at / contains.
# element_at is 1-based with NULL out-of-range on BOTH engines; slices are
# rendered as Spark slice(a, i, n) == DuckDB a[i:i+n-1].

ARR_SRC = {
    "part": "p_name",
    "customer": "c_name",
    "orders": "o_orderpriority",
}
ARR_OPS = ["sort", "distinct_sorted", "reverse", "slice"]
ARR_TERM = ["join", "size", "element_at", "contains"]


def _gen_arr(seed: int) -> dict:
    rng = random.Random(seed + 130_000)
    table = rng.choice(sorted(ARR_SRC))
    delim = rng.choice([" ", "-"])
    ops = [
        ({"k": op, "i": rng.randrange(1, 4), "n": rng.randrange(1, 3)}
         if op == "slice" else {"k": op})
        for op in rng.sample(ARR_OPS, k=rng.randrange(1, 4))
    ]
    term = rng.choice(ARR_TERM)
    return {"table": table, "key": TABLES[table]["key"],
            "col": ARR_SRC[table], "delim": delim, "ops": ops,
            "term": term, "ti": rng.randrange(1, 4),
            "tv": rng.choice(["widget", "bolt", "1-URGENT", "x"])}


def _arr_sql(q: dict) -> str:
    e = f"string_split({q['col']}, {q['delim']!r})"
    for op in q["ops"]:
        if op["k"] == "sort":
            e = f"list_sort({e})"
        elif op["k"] == "distinct_sorted":
            e = f"list_sort(list_distinct({e}))"
        elif op["k"] == "reverse":
            e = f"list_reverse({e})"
        else:
            e = f"({e})[{op['i']}:{op['i'] + op['n'] - 1}]"
    term = {
        "join": f"array_to_string({e}, '|')",
        "size": f"CAST(len({e}) AS BIGINT)",
        "element_at": f"({e})[{q['ti']}]",
        "contains": f"list_contains({e}, {q['tv']!r})",
    }[q["term"]]
    return (f"SELECT {q['key']} AS k, {term} AS v FROM {q['table']} "
            f"ORDER BY k")


def _arr_spark(spark, q: dict):
    df = spark.read.parquet(f"{SF_DIR}/{q['table']}.parquet")
    e = F.split(F.col(q["col"]), q["delim"])
    for op in q["ops"]:
        if op["k"] == "sort":
            e = F.array_sort(e)
        elif op["k"] == "distinct_sorted":
            e = F.array_sort(F.array_distinct(e))
        elif op["k"] == "reverse":
            e = F.reverse(e)
        else:
            e = F.slice(e, op["i"], op["n"])
    term = {
        "join": lambda: F.array_join(e, "|"),
        "size": lambda: F.size(e).cast("long"),
        "element_at": lambda: F.try_element_at(e, F.lit(q["ti"])),
        "contains": lambda: F.array_contains(e, q["tv"]),
    }[q["term"]]()
    return df.select(F.col(q["key"]).alias("k"), term.alias("v")).orderBy("k")


@pytest.mark.parametrize("seed", range(24))
def test_differential_array_functions(seed, spark, duck):
    q = _gen_arr(seed)
    assert_matches_oracle(_arr_spark(spark, q), duck, _arr_sql(q))


# --- conditional-expression grammar ------------------------------------------
#
# Nested CASE WHEN / coalesce(nullif(..)) / least / greatest / abs over
# integer columns — all exact integer semantics on both engines. NULLs are
# introduced ONLY by nullif and immediately swallowed by the enclosing
# coalesce, so the least/greatest null-handling difference surface is never
# exercised (Spark skips nulls, older DuckDB propagates — deliberately out
# of grammar).

COND_TABLES = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_partkey", "l_suppkey", "l_quantity"],
    "customer": ["c_custkey", "c_nationkey"],
}


def _gen_cond(seed: int) -> dict:
    rng = random.Random(seed + 140_000)
    table = rng.choice(sorted(COND_TABLES))
    cols = COND_TABLES[table]

    def atom():
        if rng.random() < 0.6:
            c = rng.choice(cols)
            if rng.random() < 0.4:
                return {"k": "mod", "col": c, "m": rng.randrange(2, 9)}
            return {"k": "col", "col": c}
        return {"k": "lit", "v": rng.randrange(-20, 100)}

    def expr(depth):
        if depth == 0:
            return atom()
        kind = rng.choice(["case", "coalesce_nullif", "least", "greatest", "abs"])
        if kind == "case":
            return {
                "k": "case",
                "pred_col": rng.choice(cols),
                "pred_op": rng.choice(["<", ">=", "%2=0", "%3=1"]),
                "pred_v": rng.randrange(0, 1000),
                "then": expr(depth - 1),
                "els": expr(depth - 1),
            }
        if kind == "coalesce_nullif":
            return {"k": "coalesce_nullif", "a": expr(depth - 1),
                    "null_v": rng.randrange(0, 50), "b": expr(depth - 1)}
        if kind == "abs":
            return {"k": "abs", "a": expr(depth - 1)}
        return {"k": kind, "a": expr(depth - 1), "b": expr(depth - 1)}

    return {"table": table, "key": TABLES[table]["key"],
            "expr": expr(rng.randrange(1, 3))}


def _cond_sql_expr(e: dict) -> str:
    k = e["k"]
    if k == "col":
        return f"CAST({e['col']} AS BIGINT)"
    if k == "mod":
        return f"(CAST({e['col']} AS BIGINT) % {e['m']})"
    if k == "lit":
        return f"CAST({e['v']} AS BIGINT)"
    if k == "case":
        c, v = e["pred_col"], e["pred_v"]
        pred = {
            "<": f"{c} < {v}",
            ">=": f"{c} >= {v}",
            "%2=0": f"{c} % 2 = 0",
            "%3=1": f"{c} % 3 = 1",
        }[e["pred_op"]]
        return (f"CASE WHEN {pred} THEN {_cond_sql_expr(e['then'])} "
                f"ELSE {_cond_sql_expr(e['els'])} END")
    if k == "coalesce_nullif":
        return (f"coalesce(nullif({_cond_sql_expr(e['a'])}, {e['null_v']}), "
                f"{_cond_sql_expr(e['b'])})")
    if k == "abs":
        return f"abs({_cond_sql_expr(e['a'])})"
    return f"{k}({_cond_sql_expr(e['a'])}, {_cond_sql_expr(e['b'])})"


def _cond_spark_expr(e: dict):
    k = e["k"]
    if k == "col":
        return F.col(e["col"]).cast("long")
    if k == "mod":
        return F.col(e["col"]).cast("long") % e["m"]
    if k == "lit":
        return F.lit(e["v"]).cast("long")
    if k == "case":
        c, v = F.col(e["pred_col"]), e["pred_v"]
        pred = {
            "<": c < v,
            ">=": c >= v,
            "%2=0": c % 2 == 0,
            "%3=1": c % 3 == 1,
        }[e["pred_op"]]
        return F.when(pred, _cond_spark_expr(e["then"])).otherwise(
            _cond_spark_expr(e["els"])
        )
    if k == "coalesce_nullif":
        return F.coalesce(
            F.nullif(_cond_spark_expr(e["a"]), F.lit(e["null_v"]).cast("long")),
            _cond_spark_expr(e["b"]),
        )
    if k == "abs":
        return F.abs(_cond_spark_expr(e["a"]))
    fn = {"least": F.least, "greatest": F.greatest}[k]
    return fn(_cond_spark_expr(e["a"]), _cond_spark_expr(e["b"]))


def _cond_sql(q: dict) -> str:
    return (f"SELECT {q['key']} AS k, {_cond_sql_expr(q['expr'])} AS v "
            f"FROM {q['table']} ORDER BY k")


def _cond_spark(spark, q: dict):
    df = spark.read.parquet(f"{SF_DIR}/{q['table']}.parquet")
    return df.select(
        F.col(q["key"]).alias("k"), _cond_spark_expr(q["expr"]).alias("v")
    ).orderBy("k")


@pytest.mark.parametrize("seed", range(24))
def test_differential_conditional_expr(seed, spark, duck):
    q = _gen_cond(seed)
    assert_matches_oracle(_cond_spark(spark, q), duck, _cond_sql(q))


# --- null-semantics (three-valued IN / NOT IN) grammar -----------------------
#
# The classic divergence trap: `x NOT IN (subquery)` under SQL's three-valued
# logic. Both sides of the membership test are made NULLABLE via seeded
# CASE-to-NULL rewrites, exercising every row of the truth table: empty inner
# set (NOT IN is TRUE even for NULL x), NULL outer probe (never qualifies
# against a non-empty set), inner set containing NULL (NOT IN yields no rows
# at all for unmatched probes). The Spark side builds the NULL-AWARE anti
# join the way the engine's T-SQL translator must — anti join on equality for
# the matches, plus a broadcast 1-row (count, null-count) gate for the
# vacuous/poisoned cases — while DuckDB evaluates the subquery natively.

NULLSEM_PAIRS = [
    ("orders", "lineitem", "o_orderkey", "l_orderkey"),
    ("customer", "orders", "c_custkey", "o_custkey"),
    ("part", "lineitem", "p_partkey", "l_partkey"),
]


def _gen_nullsem(seed: int) -> dict:
    rng = random.Random(seed + 150_000)
    outer, inner, ko, ki = rng.choice(NULLSEM_PAIRS)
    # outer probe: NULL when ko % mo == ro
    mo = rng.randrange(2, 7)
    ro = rng.randrange(0, mo)
    # inner values: NULL when ki % mi == ri (sometimes never-null)
    mi = rng.randrange(2, 7)
    ri = rng.randrange(0, mi + 3)  # ri >= mi -> inner never null
    # inner filter narrows the set; extreme bounds make it empty sometimes
    c = rng.choice(sorted(TABLES[inner]["nums"]))
    lo, hi = TABLES[inner]["nums"][c]
    span = hi - lo
    cut = lo + int(span * rng.choice([0.0, 0.1, 0.5, 0.9, 1.5]))
    op = rng.choice(["<", ">="])
    return {
        "outer": outer, "inner": inner, "ko": ko, "ki": ki,
        "mo": mo, "ro": ro, "mi": mi, "ri": ri,
        "ipred": (op, c, cut),
        "form": rng.choice(["in", "not_in"]),
        "ocat": rng.choice(sorted(TABLES[outer]["cats"])),
    }


def _nullsem_sql(q: dict) -> str:
    op, c, v = q["ipred"]
    probe = (f"CASE WHEN {q['ko']} % {q['mo']} = {q['ro']} "
             f"THEN NULL ELSE {q['ko']} END")
    ival = (f"CASE WHEN {q['ki']} % {q['mi']} = {q['ri']} "
            f"THEN NULL ELSE {q['ki']} END")
    neg = "NOT " if q["form"] == "not_in" else ""
    return (
        f"SELECT {q['ocat']} AS c, CAST(count(*) AS BIGINT) AS n "
        f"FROM {q['outer']} WHERE ({probe}) {neg}IN "
        f"(SELECT {ival} FROM {q['inner']} WHERE {c} {op} {v}) "
        f"GROUP BY {q['ocat']} ORDER BY c"
    )


def _nullsem_spark(spark, q: dict):
    outer = spark.read.parquet(f"{SF_DIR}/{q['outer']}.parquet")
    inner = spark.read.parquet(f"{SF_DIR}/{q['inner']}.parquet")
    op, c, v = q["ipred"]
    probe = F.when(
        F.col(q["ko"]) % q["mo"] == q["ro"], F.lit(None).cast("long")
    ).otherwise(F.col(q["ko"]).cast("long"))
    ival = F.when(
        F.col(q["ki"]) % q["mi"] == q["ri"], F.lit(None).cast("long")
    ).otherwise(F.col(q["ki"]).cast("long"))
    ipred = F.col(c) < v if op == "<" else F.col(c) >= v
    oe = outer.select(F.col(q["ocat"]).alias("c"), probe.alias("__e"))
    ie = inner.filter(ipred).select(ival.alias("__ie"))
    if q["form"] == "in":
        # IN: NULLs never match on either side; plain semi join on equality
        out = oe.join(ie.distinct(), oe["__e"] == F.col("__ie"), "left_semi")
    else:
        # NOT IN: anti join removes equality matches; the broadcast 1-row
        # stats gate applies the vacuous-truth (empty set) and poisoned-set
        # (inner NULL present / NULL probe) rules of three-valued logic
        stats = ie.agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.sum(F.when(F.col("__ie").isNull(), 1).otherwise(0)).alias("__nulls"),
        )
        vals = ie.filter(F.col("__ie").isNotNull()).distinct()
        out = (
            oe.join(vals, oe["__e"] == F.col("__ie"), "left_anti")
            .join(F.broadcast(stats))
            .filter(
                (F.col("__cnt") == 0)
                | (F.col("__e").isNotNull() & (F.col("__nulls") == 0))
            )
        )
    return out.groupBy("c").agg(F.count(F.lit(1)).alias("n")).orderBy("c")


@pytest.mark.parametrize("seed", range(24))
def test_differential_null_semantics(seed, spark, duck):
    q = _gen_nullsem(seed)
    assert_matches_oracle(_nullsem_spark(spark, q), duck, _nullsem_sql(q))


# --- generator (lateral fan-out) grammar -------------------------------------
#
# explode/unnest is its own executor surface (Generate nodes, outer vs inner
# semantics, fan-out cardinality): derive a per-row array from the key with
# SEQUENCE, explode it, optionally filter the generated elements, and fold
# everything back with a grouped aggregate. Lengths are kept >= 1 on both
# sides because the engines disagree on descending sequence defaults
# (Spark's sequence(1, 0) auto-steps DOWN; DuckDB's generate_series(1, 0)
# is empty) — that divergence is pinned OUT of grammar by construction.

LATERAL_TABLES = {
    "orders": ("o_orderkey", "o_orderstatus"),
    "lineitem": ("l_partkey", "l_returnflag"),
    "customer": ("c_custkey", "c_mktsegment"),
    "part": ("p_partkey", "p_brand"),
}


def _gen_lateral(seed: int) -> dict:
    rng = random.Random(seed + 160_000)
    table = rng.choice(sorted(LATERAL_TABLES))
    key, cat = LATERAL_TABLES[table]
    return {
        "table": table, "key": key, "cat": cat,
        "m": rng.randrange(2, 7),           # fan-out = key % m + 1
        "mul": rng.randrange(1, 5),         # element transform e*mul + add
        "add": rng.randrange(0, 10),
        "filt": rng.choice([None, ("mod2", 0), ("mod2", 1), ("ge", 2)]),
        "aggs": rng.sample(["cnt", "s", "mx", "nd"], k=rng.randrange(2, 4)),
    }


def _lateral_sql(q: dict) -> str:
    e = f"(e * {q['mul']} + {q['add']})"
    filt = ""
    if q["filt"] == ("mod2", 0):
        filt = "WHERE e % 2 = 0"
    elif q["filt"] == ("mod2", 1):
        filt = "WHERE e % 2 = 1"
    elif q["filt"] == ("ge", 2):
        filt = "WHERE e >= 2"
    sel = {
        "cnt": "CAST(count(*) AS BIGINT) AS cnt",
        "s": f"CAST(sum({e}) AS BIGINT) AS s",
        "mx": f"CAST(max({e}) AS BIGINT) AS mx",
        "nd": f"CAST(count(DISTINCT {e}) AS BIGINT) AS nd",
    }
    cols = ", ".join(sel[a] for a in q["aggs"])
    return (
        f"SELECT {q['cat']} AS c, {cols} FROM ("
        f"  SELECT {q['cat']}, unnest(generate_series(1, {q['key']} % {q['m']} + 1)) AS e"
        f"  FROM {q['table']}) {filt} "
        f"GROUP BY {q['cat']} ORDER BY c"
    )


def _lateral_spark(spark, q: dict):
    df = spark.read.parquet(f"{SF_DIR}/{q['table']}.parquet")
    fan = df.select(
        F.col(q["cat"]).alias("c"),
        F.explode(
            F.sequence(F.lit(1).cast("long"),
                       (F.col(q["key"]) % q["m"] + 1).cast("long"))
        ).alias("e"),
    )
    if q["filt"] == ("mod2", 0):
        fan = fan.filter(F.col("e") % 2 == 0)
    elif q["filt"] == ("mod2", 1):
        fan = fan.filter(F.col("e") % 2 == 1)
    elif q["filt"] == ("ge", 2):
        fan = fan.filter(F.col("e") >= 2)
    e = F.col("e") * q["mul"] + q["add"]
    agg = {
        "cnt": F.count(F.lit(1)).alias("cnt"),
        "s": F.sum(e).cast("long").alias("s"),
        "mx": F.max(e).cast("long").alias("mx"),
        "nd": F.count_distinct(e).cast("long").alias("nd"),
    }
    return fan.groupBy("c").agg(*[agg[a] for a in q["aggs"]]).orderBy("c")


@pytest.mark.parametrize("seed", range(24))
def test_differential_lateral_generator(seed, spark, duck):
    q = _gen_lateral(seed)
    assert_matches_oracle(_lateral_spark(spark, q), duck, _lateral_sql(q))


# --- join-chain grammar ------------------------------------------------------
#
# Three-table chains (lineitem -> orders -> customer / part) with filters
# attached at RANDOM depths — the join-reorder + pushdown surface: Catalyst
# is free to reorder and push, and the result must not change. Aggregates
# stay integer-exact.

CHAINS = [
    ("lineitem", "orders", "l_orderkey", "o_orderkey",
     "customer", "o_custkey", "c_custkey"),
    ("lineitem", "part", "l_partkey", "p_partkey", None, None, None),
    ("orders", "customer", "o_custkey", "c_custkey", None, None, None),
]


def _gen_chain(seed: int) -> dict:
    rng = random.Random(seed + 170_000)
    chain = rng.choice(CHAINS)
    filters = []
    for t in (chain[0], chain[1], chain[4]):
        if t is None or rng.random() < 0.4:
            continue
        cats = TABLES[t]["cats"]
        if rng.random() < 0.5 and cats:
            c = rng.choice(sorted(cats))
            filters.append((t, "=", c, rng.choice(cats[c])))
        else:
            nums = TABLES[t]["nums"]
            c = rng.choice(sorted(nums))
            lo, hi = nums[c]
            filters.append(
                (t, rng.choice(["<", ">="]), c, rng.randrange(lo, hi + 1))
            )
    gcat = rng.choice(sorted(TABLES[chain[0]]["cats"]))
    return {"chain": chain, "filters": filters, "gcat": gcat}


def _chain_sql(q: dict) -> str:
    t0, t1, k0, k1, t2, j1, j2 = q["chain"]
    frm = f"{t0} JOIN {t1} ON {t0}.{k0} = {t1}.{k1}"
    if t2:
        frm += f" JOIN {t2} ON {t1}.{j1} = {t2}.{j2}"
    conds = []
    for t, op, c, v in q["filters"]:
        rhs = f"'{v}'" if isinstance(v, str) else str(v)
        conds.append(f"{t}.{c} {op} {rhs}")
    where = (" WHERE " + " AND ".join(conds)) if conds else ""
    return (
        f"SELECT {t0}.{q['gcat']} AS c, CAST(count(*) AS BIGINT) AS n "
        f"FROM {frm}{where} GROUP BY {t0}.{q['gcat']} ORDER BY c"
    )


def _chain_spark(spark, q: dict):
    t0, t1, k0, k1, t2, j1, j2 = q["chain"]
    dfs = {t: spark.read.parquet(f"{SF_DIR}/{t}.parquet") for t in (t0, t1, t2) if t}
    for t, op, c, v in q["filters"]:
        col = F.col(c)
        pred = {"=": col == v, "<": col < v, ">=": col >= v}[op]
        dfs[t] = dfs[t].filter(pred)
    out = dfs[t0].join(dfs[t1], dfs[t0][k0] == dfs[t1][k1])
    if t2:
        out = out.join(dfs[t2], dfs[t1][j1] == dfs[t2][j2])
    return (
        out.groupBy(dfs[t0][q["gcat"]].alias("c"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("c")
    )


@pytest.mark.parametrize("seed", range(24))
def test_differential_join_chain(seed, spark, duck):
    q = _gen_chain(seed)
    assert_matches_oracle(_chain_spark(spark, q), duck, _chain_sql(q))


# --- correlated-LATERAL grammar ----------------------------------------------
#
# The SQL-standard lateral join surface (q340's general case): per outer
# dim row, a correlated subquery that is either a top-k (ORDER BY +
# LIMIT inside the correlation — Catalyst must rewrite it to a ranked
# window) or a whole-group aggregate (which must emit its 1 row even for
# EMPTY groups: count 0 + NULL min/max on both engines). One SQL text
# runs on BOTH engines — this grammar fuzzes the SQL front-end itself,
# not the DataFrame API. Integer columns only; deterministic tie-breaks.

LATERAL_SHAPES = [
    ("customer", "c_custkey", "orders", "o_custkey", "o_orderkey"),
    ("part", "p_partkey", "lineitem", "l_partkey", "l_suppkey"),
    ("orders", "o_orderkey", "lineitem", "l_orderkey", "l_partkey"),
]


def _gen_lateral_sub(seed: int) -> dict:
    rng = random.Random(seed + 190_000)
    outer, okey, inner, fk, icol = rng.choice(LATERAL_SHAPES)
    pred = None
    if rng.random() < 0.5:
        nums = TABLES[inner]["nums"]
        c = rng.choice(sorted(nums))
        lo, hi = nums[c]
        pred = (c, rng.choice(["<", ">="]), rng.randrange(lo, hi + 1))
    kind = rng.choice(["topk", "agg"])
    return {
        "outer": outer, "okey": okey, "inner": inner, "fk": fk,
        "icol": icol, "pred": pred, "kind": kind,
        "k": rng.randrange(1, 4), "dir": rng.choice(["ASC", "DESC"]),
    }


def _lateral_sub_sql(q: dict) -> str:
    where = f"WHERE {q['fk']} = o.{q['okey']}"
    if q["pred"]:
        c, op, v = q["pred"]
        where += f" AND {c} {op} {v}"
    if q["kind"] == "topk":
        sub = (
            f"SELECT {q['icol']} AS v FROM {q['inner']} {where} "
            f"ORDER BY v {q['dir']}, {q['icol']} LIMIT {q['k']}"
        )
        return (
            f"SELECT o.{q['okey']} AS k, t.v FROM {q['outer']} o, "
            f"LATERAL ({sub}) t ORDER BY k, v"
        )
    sub = (
        f"SELECT CAST(count(*) AS BIGINT) AS n, "
        f"CAST(min({q['icol']}) AS BIGINT) AS mn, "
        f"CAST(max({q['icol']}) AS BIGINT) AS mx "
        f"FROM {q['inner']} {where}"
    )
    return (
        f"SELECT o.{q['okey']} AS k, t.n, t.mn, t.mx FROM {q['outer']} o, "
        f"LATERAL ({sub}) t ORDER BY k"
    )


@pytest.mark.parametrize("seed", range(24))
def test_differential_lateral_subquery(seed, spark, duck):
    for t in ("customer", "part", "orders", "lineitem"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").createOrReplaceTempView(t)
    q = _gen_lateral_sub(seed)
    sql = _lateral_sub_sql(q)
    assert_matches_oracle(spark.sql(sql), duck, sql)
