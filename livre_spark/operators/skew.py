"""B5/B6: size-bucketed repartitioning + salting for the extraction stage.

Why not AQE: adaptive execution only re-plans *shuffle* skew; a 500 MB PDF
in a 10 KB-median corpus stalls its Python worker regardless of how rows
were shuffled.  The fix is explicit: split the heavy tail onto its own
partitions so each long-running document shares a partition with few
others, while the small-document bulk is salted uniformly.

At 1000-executor / 100 TB scale this plan holds because:

- the split predicate (``length(html) >= threshold``) is evaluated
  JVM-side during the scan - no extra pass;
- both branches shuffle once (round-robin style via salted hash keys),
  which is the minimum possible for re-balancing;
- partition counts scale with ``spark.sql.shuffle.partitions``, the knob
  operators already size to the cluster;
- the salt is a deterministic function of the url (``xxhash64``), so task
  retries and checkpoint resume produce identical placements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LARGE_THRESHOLD = 1 << 20  # 1 MiB: past this a doc dominates a task


def size_bucketed_repartition(pages: DataFrame,
                              url_col: str = "url",
                              html_col: str = "html",
                              threshold: int = DEFAULT_LARGE_THRESHOLD,
                              n_partitions: int | None = None,
                              large_fraction: float = 0.25) -> DataFrame:
    """Split heavy-tail docs onto dedicated partitions, salt the rest.

    Returns a DataFrame with the same columns, repartitioned so that no
    partition mixes many large documents with the small-doc bulk.
    """
    spark = pages.sparkSession
    if n_partitions is None:
        n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    n_large = max(1, int(n_partitions * large_fraction))
    n_small = max(1, n_partitions - n_large)

    sz = F.length(F.col(html_col))
    salt = F.pmod(F.xxhash64(F.col(url_col)), F.lit(2048))

    small = (pages.filter(sz < threshold)
             .withColumn("_salt", salt)
             .repartition(n_small, "_salt")
             .drop("_salt"))
    large = (pages.filter(sz >= threshold)
             .withColumn("_salt", salt)
             .repartition(n_large, "_salt")
             .drop("_salt"))
    return small.unionByName(large)


def latest_per_url(pages: DataFrame, url_col: str = "url",
                   ts_col: str = "warc_ts") -> DataFrame:
    """B12: keep the newest snapshot of each url (window dedup).

    A single hash shuffle on url; at scale this is the unavoidable
    dedup shuffle and doubles as co-location for the checkpoint
    anti-join that follows (same key).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(url_col).orderBy(F.col(ts_col).desc())
    return (pages
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn"))
