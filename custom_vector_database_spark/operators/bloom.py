"""Runtime bloom-filter join pruning, built from pure Catalyst expressions.

Spark's own row-level runtime filtering (`bloom_filter_agg` /
`might_contain`) is optimizer-internal and not callable from SQL, so this
module builds the same structure out of public DataFrame ops:

- **build**: each build-side key sets ``num_hashes`` bits of an
  ``num_bits``-wide filter. A bit is (word_idx = pos div 64, mask =
  1 << pos%64); ``groupBy(word_idx).agg(bit_or(mask))`` folds the whole
  build side into at most ``num_bits/64`` rows — a map-side-combined
  aggregation whose output is tiny regardless of build cardinality.
- **probe**: one broadcast hash join per hash function against the words
  table (map-side only, no shuffle of the probe side), keeping rows whose
  every probed bit is set.

The filter is a *prefilter*: false positives are possible, false negatives
are not. Callers that need exact semantics follow with the real join —
the bloom pass only shrinks what reaches it (at 100 TB the win is that
pruned probe rows never shuffle; this is exactly Spark's
``spark.sql.optimizer.runtime.bloomFilter`` rewrite, spelled out).

Reference parity note: the reference engine has no runtime filters (it is
a full-scan vector store, vectordb.cpp:120-156); this operator is part of
the large-scale-pipeline surface promised in SURVEY.md §2.2.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class BloomFilter:
    """A built filter: the words table PLUS the geometry it was built with.

    num_bits/num_hashes travel with the words so build and probe can never
    disagree — a mismatch would compute different bit positions per side
    and silently drop true members (false negatives), breaking the one
    guarantee this module makes.
    """

    words: DataFrame
    num_bits: int
    num_hashes: int


def _bit_pos(key: Column, seed: int, num_bits: int) -> Column:
    """Bit position of hash #`seed` for `key` — xxhash64 salted by a literal
    extra column (Spark's xxhash64 seed itself is fixed at 42)."""
    return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(num_bits))


def bloom_build(
    build: DataFrame, key: str, num_bits: int = 1 << 16, num_hashes: int = 2
) -> BloomFilter:
    """Fold the build side's keys into a BloomFilter whose words table has
    ≤ num_bits/64 rows — always broadcastable. One shuffle of
    (word_idx, mask) pairs with map-side bit_or combine.
    """
    k = F.col(key)
    bits = F.array(
        *[_bit_pos(k, i, num_bits) for i in range(num_hashes)]
    )
    words = (
        build.select(F.explode(bits).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            # PySpark's shiftleft wrapper wants a literal shift; the SQL
            # builtin takes a column.
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )
    return BloomFilter(words=words, num_bits=num_bits, num_hashes=num_hashes)


def bloom_prune(probe: DataFrame, key: str, bf: BloomFilter) -> DataFrame:
    """Keep probe rows whose key *may* be in the filter (no false negatives).

    One broadcast join per hash function; a missing word row means the word
    is all-zeros, so the row is dropped (inner join suffices).
    """
    num_bits, num_hashes = bf.num_bits, bf.num_hashes
    out = probe
    k = F.col(key)
    for i in range(num_hashes):
        pos = _bit_pos(k, i, num_bits)
        w = F.broadcast(
            bf.words.select(
                F.col("word_idx").alias(f"__wi{i}"), F.col("word").alias(f"__w{i}")
            )
        )
        out = (
            out.withColumn(f"__pos{i}", pos)
            .join(
                w,
                (F.col(f"__pos{i}") / 64).cast("int") == F.col(f"__wi{i}"),
                "inner",
            )
            .filter(
                F.expr(
                    f"shiftright(__w{i}, cast(__pos{i} % 64 as int)) & 1 = 1"
                )
            )
        )
    return out.drop(
        *[c for i in range(num_hashes) for c in (f"__wi{i}", f"__w{i}", f"__pos{i}")]
    )
