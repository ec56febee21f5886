"""Scale probe: how do the headline operators behave when the corpus grows
10×? Runs each probe at sf0.1 and at a synthetic 10× union (ids shifted so
dedup structure is preserved per replica, not collapsed across replicas),
and prints wall-time ratios.

A shuffle-bounded, skew-free operator should scale ~linearly (ratio ≲ 10 on
32 local cores — often much less while scheduling overhead dominates). A
quadratic pair-blowup or an unguarded driver collect shows up as a ratio
≫ 10 or an OOM — this probe is the local stand-in for the 100 TB question.

Usage: python scripts/scale_probe.py [replicas]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlserver2pgsql_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(df: DataFrame, id_col: str, replicas: int, stride: int) -> DataFrame:
    """Union ``replicas`` shifted copies — text payloads repeat but ids
    don't, so per-replica dedup structure is preserved."""
    r = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("__r")
    return (
        df.select("*", r)
        .withColumn(id_col, F.col(id_col) + F.col("__r").cast("long") * stride)
        .drop("__r")
    )


def probe(name, build, base_df, big_df):
    out = {}
    for label, d in (("1x", base_df), ("10x", big_df)):
        t0 = time.time()
        build(d).write.format("noop").mode("overwrite").save()
        out[label] = time.time() - t0
    ratio = out["10x"] / out["1x"]
    print(f"{name:28s} 1x={out['1x']:6.2f}s  10x={out['10x']:7.2f}s  ratio={ratio:5.1f}")
    return ratio


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("scale_probe")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    docs.count(), events.count(), emb.count()  # warm footers

    docs_big = replicate(docs, "doc_id", replicas, 1_000_000)
    events_big = replicate(events, "event_id", replicas, 100_000_000)
    emb_big = replicate(emb, "vec_id", replicas, 1_000_000)

    from sqlserver2pgsql_spark.operators import dedup as D
    from sqlserver2pgsql_spark.operators import similarity as S
    from sqlserver2pgsql_spark.operators import text as X
    from sqlserver2pgsql_spark.operators.curation import pack_sequences

    print(f"-- scale_probe: {SF_DIR} × {replicas} --")
    probe(
        "exact_dedup(hash-groupBy)",
        lambda d: d.groupBy("text").agg(F.min("doc_id").alias("k"), F.count(F.lit(1)).alias("n")),
        docs, docs_big,
    )
    probe(
        "minhash_lsh_pairs",
        lambda d: D.minhash_dedup_pairs(d.select("doc_id", "text"), "doc_id", "text",
                                        n=3, num_hashes=64, bands=16, rows_per_band=4,
                                        threshold=0.6),
        docs, docs_big,
    )
    probe(
        "simhash_signatures",
        lambda d: D.simhash(d.select("doc_id", "text"), "doc_id", "text"),
        docs, docs_big,
    )
    probe(
        "quality+langid+tokens",
        lambda d: X.detect_language(X.quality_metrics(d.select("doc_id", "text"))),
        docs, docs_big,
    )
    probe(
        "tfidf_top_terms",
        lambda d: X.tfidf_top_terms(d.select("doc_id", "text"), "doc_id", "text", k=3),
        docs, docs_big,
    )
    probe(
        "sequence_packing",
        lambda d: pack_sequences(
            d.select("doc_id", "source", X.bpe_token_count(F.col("text")).alias("t")),
            "source", "doc_id", "t", 512,
        ),
        docs, docs_big,
    )
    probe(
        "windowed_event_rollup",
        lambda d: d.groupBy(F.date_trunc("hour", F.col("ts")), "event_type")
        .agg(F.count(F.lit(1)), F.sum(F.col("value").cast("decimal(38,8)"))),
        events, events_big,
    )
    queries = emb.limit(20)
    probe(
        "ann_bruteforce_topk",
        lambda d: S.ann_bruteforce_topk(d, queries, k=10),
        emb, emb_big,
    )
    probe(
        "simhash_neardup_pairs",
        lambda d: D.simhash_neardup_pairs(
            D.simhash(d.select("doc_id", "text"), "doc_id", "text"), max_distance=3
        ),
        docs, docs_big,
    )
    probe(
        "doc_chunking",
        lambda d: d.select(
            "doc_id", X.tokens(F.col("text")).alias("t")
        ).select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.lit(1), F.size(F.col("t"))), F.lit(48)),
                    lambda s: F.array_join(F.slice(F.col("t"), s, 64), " "),
                )
            ).alias("chunk"),
        ),
        docs, docs_big,
    )
    # CC engine round-count comparison on the replicated pair graph
    # (VERDICT r4 item #3: star rounds must be <= min-label's at 20x)
    from sqlserver2pgsql_spark.operators import graph as G

    pairs_big = D.minhash_dedup_pairs(
        docs_big.select("doc_id", "text"), "doc_id", "text",
        n=3, num_hashes=64, bands=16, rows_per_band=4, threshold=0.6,
    ).localCheckpoint()
    t0 = time.time()
    G.connected_components(pairs_big, "id1", "id2").write.format("noop").mode(
        "overwrite"
    ).save()
    t_min = time.time() - t0
    t0 = time.time()
    G.connected_components_star(pairs_big, "id1", "id2")[0].write.format("noop").mode(
        "overwrite"
    ).save()
    t_star = time.time() - t0
    print(
        f"cc_rounds({replicas}x pairs)       minlabel={G.LAST_ROUNDS['minlabel']}r/"
        f"{t_min:.1f}s  star={G.LAST_ROUNDS['star']}r/{t_star:.1f}s"
    )

    from pyspark.sql import Window as W

    probe(
        "zscore_normalize",
        lambda d: d.select(
            "event_id",
            (F.col("value") - F.avg("value").over(W.partitionBy("event_type"))).alias(
                "centered"
            ),
        ),
        events, events_big,
    )

    # --- round-4 operators -------------------------------------------------
    from sqlserver2pgsql_spark.operators.bloom import bloom_build, bloom_probe
    from sqlserver2pgsql_spark.operators.scd import scd2_history
    from sqlserver2pgsql_spark.operators.text import tokens

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    li.count()
    li_big = replicate(li, "l_orderkey", replicas, 100_000_000)

    # pagerank: shift BOTH endpoints so each replica is a disjoint subgraph
    # (the graph itself grows replicas×, not just the edge multiset)
    def graph_edges(d):
        fwd = d.select(
            (F.col("l_partkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        rev = d.select(
            (F.col("l_suppkey") * 2 + 1).alias("src"),
            (F.col("l_partkey") * 2).alias("dst"),
        )
        return fwd.unionByName(rev)

    rr = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("__r")
    li_g_big = (
        li.select("l_partkey", "l_suppkey", rr)
        .select(
            (F.col("l_partkey") + F.col("__r").cast("long") * 1_000_000).alias("l_partkey"),
            (F.col("l_suppkey") + F.col("__r").cast("long") * 1_000_000).alias("l_suppkey"),
        )
    )
    probe(
        "pagerank_fixed_point(3it)",
        lambda d: G.pagerank_fixed_point(graph_edges(d), iterations=3),
        li.select("l_partkey", "l_suppkey"), li_g_big,
    )

    probe(
        "scd2_history(user state)",
        lambda d: scd2_history(
            d.select("user_id", "ts", "event_id", "event_type"),
            ["user_id"], "ts", ["event_type"], order_cols=["event_id"],
        ),
        events, events_big,
    )

    def bloom_pipeline(d):
        bench = docs.filter(F.col("doc_id") % 97 == 0)  # build side FIXED
        bits = bloom_build(
            D.shingle_postings(bench, "doc_id", "text", 3).select("shingle").distinct(),
            "shingle",
        )
        pr = D.shingle_postings(d, "doc_id", "text", 3)
        return bloom_probe(pr, "shingle", bits).groupBy("doc_id").agg(
            F.sum(F.col("bloom_hit").cast("long")).alias("hits")
        )

    probe("bloom_decontaminate", bloom_pipeline, docs, docs_big)

    def lm_quality(d):
        toks = d.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("l"))
        pb = (
            toks.filter(F.size("l") >= 2)
            .select(
                "doc_id",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("l") - 1),
                        lambda i: F.struct(
                            i.alias("pos"),
                            F.element_at("l", i).alias("w1"),
                            F.element_at("l", i + 1).alias("w2"),
                        ),
                    )
                ).alias("bg"),
            )
            .select("doc_id", "bg.pos", "bg.w1", "bg.w2")
            .localCheckpoint(eager=False)
        )
        uni = toks.select(F.explode("l").alias("w1")).groupBy("w1").agg(
            F.count(F.lit(1)).alias("n_tok")
        )
        big = pb.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_ab"))
        return (
            pb.join(big, ["w1", "w2"])
            .join(uni, "w1")
            .groupBy("doc_id")
            .agg(F.min(F.col("n_ab").cast("double") / F.col("n_tok")).alias("min_p"))
        )

    probe("lm_quality(bigram)", lm_quality, docs, docs_big)

    def crosscorpus(d):
        t = tokens(F.col("text"))
        batch = d.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 500_000_000).alias("doc_id"),
            F.array_join(F.slice(t, 1, F.size(t) - 5), " ").alias("text"),
        )
        return D.minhash_join_pairs(
            d.select("doc_id", "text"), batch, "doc_id", "text",
            n=3, num_hashes=64, bands=16, rows_per_band=4, threshold=0.6,
        )

    probe("crosscorpus_minhash_join", crosscorpus, docs, docs_big)

    def checksum(d):
        tgt = d.filter(F.col("l_orderkey") % 997 != 3)
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("l_orderkey").cast("string"),
                                  F.col("l_linenumber").cast("string"))), 1, 15
            ), 16, 10,
        ).cast("long")

        def cks(x):
            return x.groupBy((F.col("l_orderkey") % 64).alias("b")).agg(
                F.count(F.lit(1)).alias("n"), F.bit_xor(h).alias("h")
            )

        s, t = cks(d), cks(tgt)
        return s.join(t.withColumnsRenamed({"n": "n2", "h": "h2"}), "b").filter(
            (F.col("n") != F.col("n2")) | (F.col("h") != F.col("h2"))
        )

    probe("checksum_compare", checksum, li, li_big)

    # --- round-4 continuation operators (q138+) ----------------------------
    from sqlserver2pgsql_spark.operators.sketches import exact_heavy_hitters
    from sqlserver2pgsql_spark.operators.skyline import pareto_frontier
    from sqlserver2pgsql_spark.operators.text import (
        adjacent_pair_counts,
        bpe_apply_top_merge,
        inverted_index,
    )

    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    orders.count()
    orders_big = replicate(orders, "o_orderkey", replicas, 100_000_000)

    probe(
        "heavy_hitters(MG+verify)",
        lambda d: exact_heavy_hitters(d.select("o_custkey"), "o_custkey", k=1000),
        orders, orders_big,
    )
    probe(
        "pareto_frontier",
        lambda d: pareto_frontier(
            d.select(
                "o_orderkey",
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("price"),
                (F.col("o_custkey") % 1000).cast("int").alias("sz"),
            ),
            "price", "sz", "o_orderkey",
        ),
        orders, orders_big,
    )

    def bpe_round(d):
        toks = d.select(F.split(F.trim(F.col("text")), r"\s+").alias("tok"))
        c1 = adjacent_pair_counts(toks, "tok")
        return adjacent_pair_counts(bpe_apply_top_merge(toks, "tok", c1), "tok")

    probe("bpe_merge_round", bpe_round, docs, docs_big)
    probe(
        "inverted_index",
        lambda d: inverted_index(d, "doc_id", "text", min_df=2, postings_cap=20),
        docs, docs_big,
    )

    def kl(d):
        toks = d.select("source", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"))
        st = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c_st")).localCheckpoint(eager=False)
        s = st.groupBy("source").agg(F.sum("c_st").alias("n_s"))
        g = st.groupBy("tok").agg(F.sum("c_st").alias("c_t"))
        tot = st.agg(F.sum("c_st").alias("n"))
        return (
            st.join(F.broadcast(s), "source").join(F.broadcast(g), "tok").crossJoin(F.broadcast(tot))
            .select("source", ((F.col("c_st").cast("double") / F.col("n_s"))
                * F.log((F.col("c_st").cast("double") * F.col("n"))
                        / (F.col("c_t").cast("double") * F.col("n_s")))).cast("decimal(28,15)").alias("d"))
            .groupBy("source").agg(F.sum("d"))
        )

    probe("kl_divergence", kl, docs, docs_big)

    def triangles(d):
        li_s = d.select("l_orderkey", "l_partkey").filter(F.col("l_partkey") % 3 == 0).distinct()
        baskets = li_s.groupBy("l_orderkey").agg(F.array_sort(F.collect_set("l_partkey")).alias("items"))
        items = F.col("items")
        e = (baskets.select(F.explode(F.flatten(F.transform(items,
                lambda x, i: F.transform(F.slice(items, i + 2, F.size(items)),
                    lambda y: F.struct(x.alias("u"), y.alias("v")))))).alias("pr"))
             .select("pr.u", "pr.v").distinct().localCheckpoint(eager=False))
        deg = (e.select(F.col("u").alias("node")).unionByName(e.select(F.col("v").alias("node")))
               .groupBy("node").agg(F.count(F.lit(1)).alias("d")))
        ed = (e.join(deg.withColumnRenamed("node", "u").withColumnRenamed("d", "du"), "u")
              .join(deg.withColumnRenamed("node", "v").withColumnRenamed("d", "dv"), "v")
              .select(F.when(F.struct(F.col("du"), F.col("u")) < F.struct(F.col("dv"), F.col("v")),
                             F.struct(F.col("u").alias("x"), F.col("v").alias("y")))
                      .otherwise(F.struct(F.col("v").alias("x"), F.col("u").alias("y"))).alias("o"))
              .select("o.x", "o.y"))
        nbrs = ed.groupBy("x").agg(F.array_sort(F.collect_list("y")).alias("ys"))
        ys = F.col("ys")
        wedge = (nbrs.select(F.explode(F.flatten(F.transform(ys,
                    lambda a, i: F.transform(F.slice(ys, i + 2, F.size(ys)),
                        lambda b: F.struct(F.least(a, b).alias("u"), F.greatest(a, b).alias("v")))))).alias("w"))
                 .select("w.u", "w.v"))
        return wedge.join(e, ["u", "v"], "left_semi")

    # disjoint subgraphs per replica: shift partkeys by a multiple of 3 so
    # the %3 vertex-coloring class is preserved in every replica
    li_t_big = (
        li.select("l_orderkey", "l_partkey", rr)
        .select(
            (F.col("l_orderkey") + F.col("__r").cast("long") * 100_000_000).alias("l_orderkey"),
            (F.col("l_partkey") + F.col("__r").cast("long") * 300_000).alias("l_partkey"),
        )
    )
    probe("triangle_count(oriented)", triangles, li.select("l_orderkey", "l_partkey"), li_t_big)

    # pointer doubling: replicate events WITHOUT shifting user_id, so each
    # user's chain grows replicas× — this stresses data volume AND chain
    # depth together (rounds grow by ~log2(replicas), the designed behavior)
    def pointer_double(ev):
        import math

        from pyspark.sql import Window as W

        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        max_chain = (
            ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
            .agg(F.max("c")).first()[0] or 1
        )
        labels = ev.repartition(8, "user_id").select(
            "user_id", F.col("event_id").alias("id"),
            F.coalesce(F.lag("event_id").over(w), F.col("event_id")).alias("par"),
        ).select(
            "user_id", "id", "par",
            F.when(F.col("par") == F.col("id"), F.lit(0)).otherwise(1)
            .cast("long").alias("d"),
        ).localCheckpoint()
        import math as _m

        for _ in range(max(1, _m.ceil(_m.log2(max_chain)))):
            hop = labels.select(F.col("id").alias("h_id"),
                                F.col("par").alias("h_par"),
                                F.col("d").alias("h_d"))
            labels = labels.join(hop, labels["par"] == hop["h_id"]).select(
                "user_id", "id", F.col("h_par").alias("par"),
                (F.col("d") + F.col("h_d")).cast("long").alias("d"),
            ).localCheckpoint()
        return labels

    probe(
        "pointer_doubling(chains x10)",
        pointer_double,
        events.select("user_id", "ts", "event_id"),
        events_big.select("user_id", "ts", "event_id"),
    )

    # FIFO allocation: shift partkeys so per-part tape density is constant
    # (the realistic growth mode); the bucketed interval join must scale
    # with the tape, not the per-part cross
    def fifo(li_in):
        from pyspark.sql import Window as W

        pool = li_in.select(
            F.col("l_partkey").alias("part"), F.col("l_linestatus").alias("side"),
            F.col("l_quantity").cast("long").alias("qty"),
            "l_shipdate", "l_orderkey", "l_linenumber",
        )
        w = (W.partitionBy("part", "side")
             .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
        iv = pool.select("part", "side", "qty", F.sum("qty").over(w).alias("hi")) \
                 .select("part", "side", "qty",
                         (F.col("hi") - F.col("qty")).alias("lo"), "hi") \
                 .localCheckpoint(eager=False)
        B = 256

        def bucketed(sdf, lo, hi):
            return sdf.select(
                "part", lo, hi,
                F.explode(F.sequence(
                    ((F.col(lo) - F.col(lo) % B) / B).cast("long"),
                    ((F.col(hi) - 1 - (F.col(hi) - 1) % B) / B).cast("long"),
                )).alias("bucket"),
            )

        s = bucketed(iv.filter(F.col("side") == "F").select(
            "part", F.col("lo").alias("s_lo"), F.col("hi").alias("s_hi")), "s_lo", "s_hi")
        d = bucketed(iv.filter(F.col("side") == "O").select(
            "part", F.col("lo").alias("d_lo"), F.col("hi").alias("d_hi")), "d_lo", "d_hi")
        return (
            s.join(d, ["part", "bucket"])
            .filter((F.col("s_lo") < F.col("d_hi")) & (F.col("d_lo") < F.col("s_hi")))
            .dropDuplicates(["part", "s_lo", "d_lo"])
            .select("part", (F.least("s_hi", "d_hi") - F.greatest("s_lo", "d_lo")).alias("q"))
            .groupBy("part")
            .agg(F.sum("q").alias("matched"), F.count(F.lit(1)).alias("n_pairs"))
        )

    li_fifo = li.filter(F.col("l_partkey") % 10 == 0)
    li_fifo_big = (
        li.filter(F.col("l_partkey") % 10 == 0)
        .select("l_partkey", "l_linestatus", "l_quantity",
                "l_shipdate", "l_orderkey", "l_linenumber", rr)
        .select(
            (F.col("l_partkey") + F.col("__r").cast("long") * 1_000_000).alias("l_partkey"),
            "l_linestatus", "l_quantity", "l_shipdate",
            (F.col("l_orderkey") + F.col("__r").cast("long") * 100_000_000).alias("l_orderkey"),
            "l_linenumber",
        )
    )
    probe("fifo_allocation(bucketed)", fifo, li_fifo, li_fifo_big)

    # --- fourth wave: span dedup, EWMA fold, Merkle manifest ----------------

    def span_dedup(d):
        toks = d.select(
            "doc_id", F.split(F.lower("text"), " ").alias("t")
        ).filter(F.size("t") >= 8)
        spans = toks.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 7),
                    lambda i: F.struct(
                        i.alias("i"),
                        F.md5(F.concat_ws(" ", F.slice("t", i, 8))).alias("h"),
                    ),
                )
            ).alias("sp"),
        ).select("doc_id", F.col("sp.h").alias("h"))
        dup = (
            spans.groupBy("h")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .filter(F.col("nd") >= 2)
            .select("h")
        )
        return (
            spans.join(dup.withColumn("is_dup", F.lit(1)), "h", "left")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_spans"),
                F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).alias("n_dup"),
            )
        )

    probe("span_dedup(postings)", span_dedup, docs, docs_big)

    def ewma(ev):
        seq = ev.groupBy("user_id").agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("hist")
        )
        return seq.select(
            "user_id",
            F.aggregate(
                F.slice("hist", 2, F.size("hist") - 1),
                F.element_at("hist", 1)["value"],
                lambda acc, x: F.lit(0.5) * x["value"] + F.lit(0.5) * acc,
            ).alias("ewma"),
        )

    events_big = replicate(events, "user_id", replicas, 1_000_000)
    probe("ewma_fold(per-user)", ewma, events, events_big)

    def merkle(d):
        leaf = d.select(
            "source",
            (F.col("doc_id") % 16).alias("bucket"),
            F.md5("text").alias("h"),
        )
        shard = leaf.groupBy("source", "bucket").agg(
            F.md5(F.concat_ws("", F.array_sort(F.collect_list("h")))).alias("sh")
        )
        return shard.groupBy("source").agg(
            F.md5(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("bucket", "sh"))),
                        lambda s: s["sh"],
                    ),
                )
            ).alias("root")
        )

    probe("merkle_manifest(2-level)", merkle, docs, docs_big)


    # --- fifth wave (q258-q287 headliners) ----------------------------------
    def sweepline(d):
        iv = d.select(
            F.col("ts").cast("date").alias("s"),
            F.date_add(F.col("ts").cast("date"), (F.col("event_id") % 5).cast("int") + 1).alias("e"),
        )
        deltas = (
            iv.select(F.col("s").alias("d"), F.lit(1).alias("delta"))
            .unionAll(iv.select(F.col("e").alias("d"), F.lit(-1).alias("delta")))
            .groupBy("d").agg(F.sum("delta").alias("delta"))
        )
        return deltas.select(
            "d", F.sum("delta").over(W.orderBy("d")).alias("open_count")
        )

    probe("sweepline_concurrency", sweepline, events, events_big)

    def attribution(d):
        wseq = W.partitionBy("user_id").orderBy("ts", "event_id")
        seq = d.select(
            "user_id", "ts", "event_id", "event_type", "value",
            F.count(F.when(F.col("event_type") == "purchase", 1))
            .over(wseq.rowsBetween(W.unboundedPreceding, -1)).alias("journey"),
        )
        touches = seq.filter(F.col("event_type") != "purchase")
        purchases = seq.filter(F.col("event_type") == "purchase").select(
            "user_id", "journey",
            F.floor(F.col("value") * 100).alias("cents"),
        )
        return (
            touches.join(purchases, ["user_id", "journey"])
            .groupBy("event_type").agg(F.sum("cents").alias("c"))
        )

    probe("journey_attribution", attribution, events, events_big)

    def degenerate_runs(d):
        ts = F.split(F.trim(F.col("text")), r"\s+")
        fold = F.aggregate(
            ts,
            F.expr("named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'mx', 0L)"),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
                F.greatest(acc["mx"], F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))).alias("mx"),
            ),
        )
        return d.select("doc_id", fold["mx"].alias("max_run"))

    probe("degenerate_runs(HOF fold)", degenerate_runs, docs, docs_big)

    def stratum_rank_bh(d):
        strat = (F.col("user_id") % 40).cast("long")
        ranked = d.select(
            strat.alias("stratum"), "event_type",
            F.rank().over(W.partitionBy(strat).orderBy("value")).alias("rmin"),
        )
        return ranked.groupBy("stratum", "event_type").agg(
            F.count(F.lit(1)).alias("n"), F.sum("rmin").alias("r")
        )

    probe("stratified_rank_tests", stratum_rank_bh, events, events_big)

    # --- eighth wave: grid-DBSCAN (q379) -------------------------------------
    # replicas shift the FIRST coordinate by 10*r (whole grid cells apart), so
    # each replica clusters independently — density per cell is preserved and
    # pair work must scale ~linearly; an id-only replica union would instead
    # multiply density 10x and blow pairs up 100x (a replica artifact, not an
    # operator property — same caveat as the simhash pair note).
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    shift = F.col("__r").cast("double") * 10.0
    emb_big = (
        emb.select("*", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("__r"))
        .select(
            (F.col("vec_id") + F.col("__r").cast("long") * 1_000_000).alias("vec_id"),
            F.concat(
                F.array(F.element_at("embedding", 1) + shift),
                F.slice("embedding", 2, 63),
            ).alias("embedding"),
        )
    )

    def dbscan_pairs(d):
        from sqlserver2pgsql_spark.operators.graph import connected_components_star

        eps = 0.02
        pts = d.select(
            "vec_id",
            F.col("embedding").getItem(0).cast("double").alias("x"),
            F.col("embedding").getItem(1).cast("double").alias("y"),
        )
        cell = lambda c: F.floor(c / eps).cast("long")  # noqa: E731
        pr = pts.select(
            F.col("vec_id").alias("pa"), F.col("x").alias("xa"), F.col("y").alias("ya"),
            F.explode(F.array(*[
                F.struct((cell(F.col("x")) + dx).alias("cx"), (cell(F.col("y")) + dy).alias("cy"))
                for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            ])).alias("cell"),
        )
        bu = pts.select(
            F.col("vec_id").alias("pb"), F.col("x").alias("xb"), F.col("y").alias("yb"),
            F.struct(cell(F.col("x")).alias("cx"), cell(F.col("y")).alias("cy")).alias("cell"),
        )
        dx, dy = F.col("xa") - F.col("xb"), F.col("ya") - F.col("yb")
        nbrs = (
            pr.join(bu, "cell")
            .filter((F.col("pa") != F.col("pb")) & (dx * dx + dy * dy <= eps * eps))
            .select("pa", "pb").localCheckpoint(eager=False)
        )
        cores = (
            nbrs.groupBy(F.col("pa").alias("vec_id"))
            .agg((F.count(F.lit(1)) + 1).alias("n"))
            .filter(F.col("n") >= 3).select("vec_id")
        )
        core_edges = (
            nbrs.join(cores.withColumnRenamed("vec_id", "pa"), "pa")
            .join(cores.withColumnRenamed("vec_id", "pb"), "pb").select("pa", "pb")
        )
        cc, _ = connected_components_star(core_edges, "pa", "pb")
        return cc.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("sz"))

    probe("grid_dbscan_star_cc", dbscan_pairs, emb, emb_big)

    # --- round 5: grouped_pairs (q126/q247/q252) ------------------------------
    # Corpus growth = MORE groups at the same basket-size distribution, so the
    # replica shifts the GROUP key (user), not the item — an item-id-only
    # replica would grow each basket 10x and measure the (intentional)
    # quadratic-in-basket-size term, not the operator's scaling. Pair volume
    # and cost must scale ~linearly in group count.
    from sqlserver2pgsql_spark.operators.pairs import grouped_pairs

    baskets = events.select("user_id", (F.col("event_id") % 500).alias("item"))
    baskets_big = replicate(
        baskets.withColumnRenamed("user_id", "g"), "g", replicas, 10_000_000
    )

    def pair_counts(d):
        return (
            grouped_pairs(d, "g", "item")
            .groupBy("p1", "p2")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    probe(
        "grouped_pairs(q247/q252)",
        pair_counts,
        baskets.withColumnRenamed("user_id", "g"),
        baskets_big,
    )


if __name__ == "__main__":
    main()
