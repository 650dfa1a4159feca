"""Relational Bloom filter: build a bitmap from a (small-ish) build-side
key set with pure DataFrame aggregation, probe it with a broadcast + filter
— the semi-join pre-filter pattern Spark's runtime row-level filtering
(`spark.sql.optimizer.runtime.bloomFilter.*`) applies automatically when
statistics allow. Declared here explicitly so the engine controls when a
100 TB probe side is pruned before the shuffle instead of after it.

The filter is approximate (false positives only); callers that need exact
semantics follow it with the real join — the Bloom pass just keeps the
shuffle O(matching rows). Everything stays JVM-side: xxhash64 for the k
probes, `bit_or` of shifted bits for the bitmap words, one single-row
broadcast for the probe side. No UDFs, no driver collect, and — the point
— ZERO shuffles added to the probe side (the filter is a plain codegen
predicate under a broadcast nested-loop of one row).

Parity note: the reference delegates all join execution to DuckDB
(SURVEY.md §4 — "no optimizer, no execution engine"); this operator exists
for the 100 TB extension surface, not reference parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default bitmap geometry: 2^16 bits in 1024 longs (~8 KiB broadcast) at
#: k=3 gives <1% false positives up to ~6k build keys. At 100 TB scale,
#: size m at ~10 bits per expected distinct build key.
DEFAULT_BITS = 1 << 16
DEFAULT_HASHES = 3


def _positions(key: Column, n_hashes: int, n_bits: int) -> list[Column]:
    """k bit positions for a key: xxhash64 seeded per probe, folded mod m."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits)) for i in range(n_hashes)
    ]


def build_bitmap(
    build: DataFrame,
    key: str,
    n_bits: int = DEFAULT_BITS,
    n_hashes: int = DEFAULT_HASHES,
) -> DataFrame:
    """Aggregate the build side into one row:
    ``__bloom_words_{n_bits}: array<bigint>`` — the DENSE m/64-word
    bitmap (index = word_idx; geometry in the column name so mismatched
    probes fail fast).

    Dense array, not a map: ``element_at`` on Spark's MapType is a linear
    scan of the entries, which made the probe O(|probe| · k · m/64)
    (measured 6.2 s at sf0.1 with m=2^19); array indexing is O(1) and
    drops the probe to scan speed. A ``spark.range`` spine left-joined
    with the set words fills the zero words.

    The per-word aggregation is map-side combinable: each partition emits
    at most m/64 partial words and ``bit_or`` merges them — the same merge
    shape ``bloom_filter_agg`` uses internally — so any build-side row
    count reduces to ≤ m/64 rows before the final single-row collect.
    """
    pos = F.explode(F.array(*_positions(F.col(key), n_hashes, n_bits))).alias("pos")
    words = (
        build.select(pos)
        .select(
            (F.col("pos") / 64).cast("bigint").alias("word_idx"),
            # shiftleft's bit-count argument must be a literal in the
            # Python API; the SQL form takes a column
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )
    spine = build.sparkSession.range(n_bits // 64).withColumnRenamed(
        "id", "word_idx"
    )
    dense = spine.join(words, "word_idx", "left").select(
        "word_idx", F.coalesce("word", F.lit(0).cast("bigint")).alias("word")
    )
    # the geometry is encoded in the column NAME so a probe() called with
    # a different n_bits fails fast with a missing-column error instead
    # of silently testing wrong bit positions (or an opaque ANSI
    # INVALID_ARRAY_INDEX)
    return dense.groupBy().agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("word_idx", "word"))),
            lambda s: s["word"],
        ).alias(f"__bloom_words_{n_bits}")
    )


def probe(
    df: DataFrame,
    key: str,
    bitmap: DataFrame,
    n_bits: int = DEFAULT_BITS,
    n_hashes: int = DEFAULT_HASHES,
) -> DataFrame:
    """Keep rows whose key *might* be in the build set (no false negatives).

    Cross-joins the single-row bitmap (broadcast, ~8 KiB) and filters with
    a conjunction of k bit tests — whole-stage-codegen predicates, no added
    exchange, so the probe side's partitioning and pushed-down scan filters
    are untouched.
    """
    words_col = f"__bloom_words_{n_bits}"
    if words_col not in bitmap.columns:
        raise ValueError(
            f"bitmap was built with a different n_bits (columns: "
            f"{bitmap.columns}); probe() requires the same geometry "
            f"(expected {words_col})"
        )
    clash = [c for c in df.columns if c == words_col or c.startswith("__pos")]
    if clash:
        raise ValueError(
            f"probe input already has reserved column(s) {clash}; rename "
            "them before probing (they would be silently overwritten and "
            "dropped)"
        )
    out = df.join(F.broadcast(bitmap))
    cond = F.lit(True)
    for i, p in enumerate(_positions(F.col(key), n_hashes, n_bits)):
        out = out.withColumn(f"__pos{i}", p)
        # array indices are 1-based; the dense bitmap covers every word,
        # so no null check is needed on the lookup
        word = F.element_at(
            F.col(words_col), ((F.col(f"__pos{i}") / 64).cast("int") + 1)
        )
        bit = F.expr(f"shiftleft(cast(1 as bigint), cast(__pos{i} % 64 as int))")
        cond = cond & (word.bitwiseAND(bit) != 0)
    return (
        out.filter(cond)
        .drop(words_col, *[f"__pos{i}" for i in range(n_hashes)])
    )
