"""Deduplication operators for web-scale training data.

Four families, each a composition of built-in DataFrame ops (no Python in
the hot path):

- exact:       hash-groupBy on md5(text)
- MinHash+LSH: word shingles -> K portable min-hashes -> banded buckets
               -> self-join on (band, band-hash) -> candidate pairs
- SimHash:     64-bit sign-aggregated token hashes, hamming-near pairs
- n-gram Jaccard: exploded shingle inverted index -> pair intersection
               counts -> |A∩B| / (|A|+|B|-|A∩B|)

All hashes derive from md5 (portable to the DuckDB oracle); xxhash64
would be faster JVM-side but is not reproducible outside Spark - at
100 TB you swap `md5_long` for `xxhash64` via the ``hash_fn`` knob.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import md5_long


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-shingles as an array column (JVM higher-order functions)."""
    words = F.split(F.trim(F.lower(text)), r"\s+")
    n = F.size(words)
    return F.when(n < k, F.array()).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - F.lit(k)),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, k))))


def exact_duplicate_groups(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: groups of byte-identical documents."""
    return (df
            .withColumn("fp", F.md5(F.col(text_col)))
            .groupBy("fp")
            .agg(F.count("*").alias("n_dups"),
                 F.min(id_col).alias("keep_id"))
            .filter(F.col("n_dups") > 1))


def minhash_signature(text: Column, n_hashes: int = 8, k: int = 3) -> list[Column]:
    """K independent min-hashes over the shingle set.

    Hash i of shingle s = md5_long(f"{i}|" + s); empty shingle sets get
    sentinel -1 (never collides with a real hash, which is >= 0).
    """
    sh = shingles(text, k)
    cols = []
    for i in range(n_hashes):
        hashed = F.transform(sh, _mh_fn(i))
        cols.append(F.coalesce(F.array_min(hashed), F.lit(-1)).alias(f"mh{i}"))
    return cols


def _mh_fn(i: int):
    return lambda s: _mh(s, i)


def _mh(s: Column, i: int) -> Column:
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"{i}|"), s)), 1, 15),
                  16, 10).cast("long")


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n_hashes: int = 8,
                      bands: int = 4, k: int = 3) -> DataFrame:
    """Banded LSH: docs agreeing on ALL rows of any band become a pair.

    Scale shape: one narrow shuffle keyed on (band, hash-of-band-rows);
    bucket sizes are the skew risk, so the band hash includes every row of
    the band (rows_per_band = n_hashes // bands).
    """
    rows_per = n_hashes // bands
    sigs = df.select(F.col(id_col).alias("id"),
                     *minhash_signature(F.col(text_col), n_hashes, k))
    # one pass: explode (band, bucket-hash) pairs instead of unioning
    # per-band branches (a union would recompute the signatures per band)
    band_structs = []
    for b in range(bands):
        cols = [F.col(f"mh{i}") for i in range(b * rows_per, (b + 1) * rows_per)]
        band_structs.append(F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws(",", *[c.cast("string") for c in cols]))
            .alias("bucket")))
    buckets = (sigs
               .select("id", F.explode(F.array(*band_structs)).alias("bb"))
               .select("id", F.col("bb.band").alias("band"),
                       F.col("bb.bucket").alias("bucket")))
    left = buckets.alias("l")
    right = buckets.alias("r")
    return (left.join(right, [F.col("l.band") == F.col("r.band"),
                              F.col("l.bucket") == F.col("r.bucket"),
                              F.col("l.id") < F.col("r.id")])
            .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
            .distinct())


def simhash64(text: Column, k: int = 1) -> Column:
    """64-bit SimHash over word shingles.

    bit_j(doc) = sign( sum over shingles of (bit_j(h(s)) ? +1 : -1) );
    built entirely from higher-order array functions + bit ops.
    """
    sh = shingles(text, k)
    hashed = F.transform(sh, lambda s: _mh(s, 0))
    bits = []

    def vote_fn(j):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1,
            F.lit(1)).otherwise(F.lit(-1))

    for j in range(60):  # md5_long is 60 bits
        votes = F.aggregate(hashed, F.lit(0), vote_fn(j))
        bits.append(F.when(votes > 0, F.lit(1).cast("long"))
                    .otherwise(F.lit(0).cast("long")) * F.lit(2 ** j).cast("long"))
    acc = bits[0]
    for b in bits[1:]:
        acc = acc + b
    return acc


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        threshold: float = 0.8) -> DataFrame:
    """Exact n-gram Jaccard similarity via an inverted shingle index.

    explode -> distinct (id, shingle) -> self-join on shingle ->
    intersection counts -> Jaccard.  The shingle join is the classic
    entity-resolution blocking shuffle; hot shingles would be dropped by
    a frequency cap at real scale (left as the `max_df` knob).
    """
    toks = (df.select(F.col(id_col).alias("id"),
                      F.explode(shingles(F.col(text_col), k)).alias("sh"))
            .distinct())
    sizes = toks.groupBy("id").agg(F.count("*").alias("n"))
    inter = (toks.alias("a")
             .join(toks.alias("b"),
                   [F.col("a.sh") == F.col("b.sh"),
                    F.col("a.id") < F.col("b.id")])
             .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
             .agg(F.count("*").alias("n_common")))
    return (inter
            .join(sizes.withColumnRenamed("id", "id_a")
                       .withColumnRenamed("n", "n_a"), "id_a")
            .join(sizes.withColumnRenamed("id", "id_b")
                       .withColumnRenamed("n", "n_b"), "id_b")
            .withColumn("jaccard", F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))
