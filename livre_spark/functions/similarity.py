"""Similarity search over embedding columns (``array<float>``).

- brute-force cosine top-k: the exact baseline.  ``zip_with`` +
  ``aggregate`` keep the dot product inside whole-stage codegen (double
  math, sequential fold - bit-reproducible against the DuckDB oracle).
- LSH-bucketed ANN: deterministic random-hyperplane signatures prune the
  candidate set; the scale path (bucket join instead of full scan).
- embedding near-duplicate pairs: all pairs above a cosine threshold.

At 100 TB the brute-force path is a broadcast of the query vector and a
single scan (no shuffle); the LSH path shuffles once on the bucket key.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold double dot product (JVM, codegen-friendly)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        a, F.lit(0.0),
        lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _query_literal(query_vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in query_vec])


def topk_cosine(embeddings: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.

    Plan shape: scan -> project (codegen) -> TakeOrderedAndProject; no
    shuffle, the top-k is merged on the driver from per-partition heaps.
    """
    q = _query_literal(query_vec)
    return (embeddings
            .select(F.col(id_col),
                    F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"))
            .orderBy(F.col("cos_sim").desc(), F.col(id_col))
            .limit(k))


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-of-dot-product bit signature packed into a long."""
    acc = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        bit = F.when(dot(vec, _query_literal(plane)) >= 0,
                     F.lit(2 ** j).cast("long")).otherwise(F.lit(0).cast("long"))
        acc = acc + bit
    return acc


def topk_cosine_lsh(embeddings: DataFrame, query_vec: list[float],
                    k: int = 10, n_planes: int = 8, seed: int = 42,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ANN: only vectors in the query's LSH bucket are scored.

    Recall is probabilistic (more planes = smaller buckets); candidates
    are pruned at the scan by a codegen-able signature equality, so at
    scale this reads everything once but *scores* only the bucket.
    A production variant bucketizes the table once and bucket-joins.
    """
    planes = hyperplanes(len(query_vec), n_planes, seed)
    q_sig = 0
    for j, plane in enumerate(planes):
        d = sum(a * b for a, b in zip(query_vec, plane))
        if d >= 0:
            q_sig += 2 ** j
    q = _query_literal(query_vec)
    return (embeddings
            .withColumn("_sig", lsh_signature(F.col(vec_col), planes))
            .filter(F.col("_sig") == q_sig)
            .select(F.col(id_col),
                    F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"))
            .orderBy(F.col("cos_sim").desc(), F.col(id_col))
            .limit(k))


def cosine_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """All embedding pairs with cosine >= threshold.

    O(n^2) cross-join - correct baseline for oracle checking; the LSH
    bucketing above is the scale path (join on signature first).
    """
    # norms are precomputed per side so each of the O(n^2) pairs pays one
    # dot product, not three array folds
    a = embeddings.select(F.col(id_col).alias("id_a"),
                          F.col(vec_col).alias("va"),
                          norm(F.col(vec_col)).alias("na"))
    b = embeddings.select(F.col(id_col).alias("id_b"),
                          F.col(vec_col).alias("vb"),
                          norm(F.col(vec_col)).alias("nb"))
    return (a.join(b, F.col("id_a") < F.col("id_b"))
            .withColumn("cos_sim", F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6))
            .filter(F.col("cos_sim") >= threshold)
            .select("id_a", "id_b", "cos_sim"))
