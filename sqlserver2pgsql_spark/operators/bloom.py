"""Portable Bloom-filter membership for corpus decontamination.

Exact-set decontamination (operators/curation.py:decontaminate) broadcasts
the benchmark shingle SET; at very large benchmark suites the set itself
gets heavy. The classic fix is a Bloom filter: k hash positions in an
m-bit array, "maybe present" iff all k bits are set.

Portability discipline (same as operators/sketches.py): the k positions
are derived from salted md5 — ``int(md5(f"{salt}:{s}")[:15], 16) % m`` —
identical in Spark (``conv(substring(md5(...),1,15),16,10) % m``) and
DuckDB (``('0x' || substr(md5(...),1,15))::BIGINT % m``), so an oracle can
replay the EXACT filter, false positives included: the bloom verdict is
deterministic, not statistical, for a fixed (m, k, salt) config.

Representation: the filter is a DataFrame of the distinct SET bit
positions (≤ m rows, ≤ a few MB for m = 2^16..2^24) rather than a packed
bitset blob. Semantically identical to testing bits in an array, and it
keeps the probe a broadcast semi-join — fully JVM-side, no UDF. On a
cluster the positions table is broadcast once and probed by every
executor, exactly like a packed bloom would be.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_position(col: Column, salt: int, m_bits: int) -> Column:
    """Bit position for one of the k salted hashes (BIGINT in [0, m))."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt), col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return h % F.lit(m_bits)


def bloom_build(
    items: DataFrame, item_col: str, k_hashes: int = 3, m_bits: int = 1 << 16
) -> DataFrame:
    """Distinct set-bit positions for the item set — the filter itself.
    One explode + distinct; output ≤ m rows regardless of input size."""
    pos = F.array(
        *[bloom_position(F.col(item_col), salt, m_bits) for salt in range(k_hashes)]
    )
    return (
        items.select(F.explode(pos).alias("bit_pos"))
        .distinct()
    )


def bloom_probe(
    probe: DataFrame,
    item_col: str,
    bits: DataFrame,
    k_hashes: int = 3,
    m_bits: int = 1 << 16,
) -> DataFrame:
    """Append ``bloom_hit`` (true iff ALL k salted positions are set).

    Plan shape: explode each probe row into its k (salt, position) pairs,
    broadcast semi-join against the bit table, and count matched salts back
    per row — hit iff k matched. The probe side shuffles only on its own
    row id; the filter side is broadcast.

    The row key is monotonically_increasing_id, which is only stable WITHIN
    one evaluation — the keyed frame is localCheckpoint-pinned because two
    branches reference it (the pair explode and the final join), and a
    speculative re-evaluation could otherwise assign different ids to the
    two branches."""
    keyed = probe.withColumn(
        "__row", F.monotonically_increasing_id()
    ).localCheckpoint(eager=False)
    pairs = keyed.select(
        "__row",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(salt).alias("salt"),
                        bloom_position(F.col(item_col), salt, m_bits).alias("bit_pos"),
                    )
                    for salt in range(k_hashes)
                ]
            )
        ).alias("sp"),
    ).select("__row", "sp.salt", "sp.bit_pos")
    hits = (
        pairs.join(F.broadcast(bits), "bit_pos", "leftsemi")
        .groupBy("__row")
        .agg(F.count(F.lit(1)).alias("__n_set"))
        .filter(F.col("__n_set") == k_hashes)
        .select("__row", F.lit(True).alias("bloom_hit"))
    )
    return (
        keyed.join(hits, "__row", "left")
        .withColumn("bloom_hit", F.coalesce(F.col("bloom_hit"), F.lit(False)))
        .drop("__row")
    )
