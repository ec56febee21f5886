"""Similarity search over embedding columns (array<float>).

M7 extension. Two paths:

- ``ann_bruteforce_topk``: exact top-k by cosine — broadcast the (small)
  query set against the corpus, one pass, window top-k per query. At 100 TB
  the corpus never shuffles; cost is O(|corpus|·|queries|) map-side work.
- ``ann_lsh_topk``: random-hyperplane LSH — corpus and queries are bucketed
  by sign-pattern key; only same-bucket pairs are scored. Probing multiple
  plane-sets trades recall for cost. Hyperplanes are derived from xxhash64
  (deterministic, seedable, no driver-side RNG state to ship).

Float discipline: dot products fold left-to-right in double precision via
``aggregate`` — the same element order the DuckDB oracle uses with
``list_reduce`` — so similarity values are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def ann_bruteforce_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector (excluding self).

    ``queries`` is broadcast — the corpus is scanned once with no shuffle;
    the only shuffle is the final per-query top-k window over |queries|·k
    candidate rows (Spark pushes a partial top-k under the window)."""
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "rnk", "vec_id", "cos_sim")
    )


# --- LSH (random hyperplane) -------------------------------------------------


def _hyperplane_key(vec: Column, dim: int, planes: int, seed: int) -> Column:
    """Sign-pattern bucket key: bit p = sign(v · h_p), where hyperplane
    h_p[d] = ±1 from xxhash64(seed, p, d). Integer-weight planes keep the
    projection exact (no float nondeterminism in bucketing)."""
    bits = []
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, d: F.when(
                    F.xxhash64(F.lit(seed), F.lit(p), d).bitwiseAND(F.lit(1)) == 1,
                    x.cast("double"),
                ).otherwise(-x.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(F.lit(0).cast("long")))
    key = bits[0]
    for b in bits[1:]:
        key = key.bitwiseOR(b)
    return key


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    planes: int = 4,
    tables: int = 16,
) -> DataFrame:
    """Approximate top-k: score only candidates sharing an LSH bucket with
    the query in any of ``tables`` independent plane-sets. Equi-join on
    (table, key) replaces the cross join — the 100 TB path."""
    def bucketed(df: DataFrame, prefix: str) -> DataFrame:
        rows = [
            F.struct(
                F.lit(t).alias("tbl"),
                _hyperplane_key(F.col(vec_col), dim, planes, seed=1000 + t).alias("key"),
            )
            for t in range(tables)
        ]
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.col(vec_col).alias(f"{prefix}_vec"),
            F.explode(F.array(*rows)).alias("bk"),
        ).select(f"{prefix}_id", f"{prefix}_vec", "bk.tbl", "bk.key")

    cb = bucketed(corpus, "c")
    qb = F.broadcast(bucketed(queries, "q"))
    cand = (
        cb.join(qb, ["tbl", "key"])
        .filter(F.col("c_id") != F.col("q_id"))
        .dropDuplicates(["q_id", "c_id"])
    )
    scored = cand.select(
        F.col("q_id").alias("query_id"),
        F.col("c_id").alias("vec_id"),
        cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "rnk", "vec_id", "cos_sim")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold — brute force all-pairs (exact,
    verification-scale). The LSH bucketing above is the scale path."""
    a = df.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"))
    b = df.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .select("id1", "id2", cosine(F.col("v1"), F.col("v2")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
