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
import os
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.skew import ensure_scan_parallelism


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


# NB on the folds above: zip_with/aggregate are CodegenFallback
# (interpreted, ~20 us per dim-64 evaluation).  Do NOT "fix" this by
# unrolling into a getItem/multiply/add expression chain: a single
# dim-64 chain compiles to a >8 KB-bytecode method that HotSpot's JIT
# refuses to compile (DontCompileHugeMethods), and join/scan codegen
# contexts cannot split one expression across methods - measured 3-500x
# SLOWER than the fold at round 7.  Bulk pair scoring belongs in the
# vectorized numpy kernel (see cosine_near_dup_pairs_lsh).


def _query_literal(query_vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in query_vec])


def cosine_rows_arrow(df: DataFrame, a_col: str, b_col: str | None = None,
                      out_col: str = "cos_raw",
                      const_b: list[float] | None = None) -> DataFrame:
    """Append ``out_col`` = the RAW (unrounded) cosine of ``a_col``
    against either a second array column (``b_col``) or a constant
    query vector (``const_b``), in one Arrow-vectorized pass (guide
    §4.2).

    Bit-identical to ``cosine(F.col(a_col), <b>)``: the numpy fast
    path accumulates column-by-column, so every row sees the same IEEE
    multiply/add sequence as the interpreted ``aggregate`` fold
    (f32->f64 widening is exact), ``np.sqrt``/division are the same
    correctly-rounded IEEE ops, and 0/0 stays NaN (the kernel uses
    mapInArrow precisely so NaN survives the boundary as a VALUE, not
    a pandas null - the round-7 near-dup lesson).  Rows the SQL fold
    nulls out - null arrays, length mismatch (zip_with's null
    padding), null elements - take a per-row fallback that returns
    genuine Arrow nulls.  Rounding is deliberately left to the JVM:
    callers apply ``F.round(out_col, 6)`` so ordering/rounding
    semantics are untouched.  (On zero-norm rows the ANSI fold raises
    DIVIDE_BY_ZERO while this kernel - like the DuckDB oracle and the
    near-dup scorer - yields NaN; no testdata row hits that.)

    All columns of ``df`` pass through; project before calling so the
    vectors cross the Python boundary exactly once.
    """
    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(df.schema.fields
                            + [StructField(out_col, DoubleType())])
    ia = df.columns.index(a_col)
    ib = df.columns.index(b_col) if const_b is None else None
    qb = None if const_b is None else [float(x) for x in const_b]
    names = df.columns + [out_col]

    def fn(batches):
        import math

        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        if qb is not None:
            bn_q = 0.0
            for y in qb:
                bn_q += y * y
            nb_q = math.sqrt(bn_q)

        def mat(col, n, d=None):
            """(n, d) float64 matrix, or None if ragged/nulls.  With
            ``d=None`` the uniform length is derived from row 0."""
            if col.null_count:
                return None
            lens = pc.list_value_length(col).to_numpy(
                zero_copy_only=False)
            if d is None:
                d = int(lens[0])
            if not (lens == d).all():
                return None
            flat = col.flatten()
            if flat.null_count:
                return None
            return flat.to_numpy(zero_copy_only=False) \
                .astype(np.float64).reshape(n, d)

        def fast(col_a, col_b, n):
            """Uniform-length, no-null batches: matrixize + dim loop."""
            if n == 0:
                return np.empty(0)
            ma = mat(col_a, n, len(qb) if qb is not None else None)
            if ma is None:
                return None
            d = ma.shape[1]
            if qb is None:
                mb = mat(col_b, n, d)
                if mb is None:
                    return None
            dot = np.zeros(n)
            na = np.zeros(n)
            if qb is None:
                nb = np.zeros(n)
                for k in range(d):
                    x = ma[:, k]
                    y = mb[:, k]
                    dot = dot + x * y
                    na = na + x * x
                    nb = nb + y * y
                nb = np.sqrt(nb)
            else:
                for k in range(d):
                    x = ma[:, k]
                    dot = dot + x * qb[k]
                    na = na + x * x
                nb = nb_q
            with np.errstate(divide="ignore", invalid="ignore"):
                return dot / (np.sqrt(na) * nb)

        def slow(col_a, col_b, n):
            """Per-row replay of the fold's null semantics."""
            va_l = col_a.to_pylist()
            vb_l = [qb] * n if qb is not None else col_b.to_pylist()
            res = np.zeros(n)
            mask = np.zeros(n, dtype=bool)
            for i in range(n):
                va, vb = va_l[i], vb_l[i]
                if va is None or vb is None or len(va) != len(vb) \
                        or any(x is None for x in va) \
                        or any(y is None for y in vb):
                    mask[i] = True
                    continue
                acc = 0.0
                an = 0.0
                bn = 0.0
                for x, y in zip(va, vb):
                    acc += x * y
                    an += x * x
                    bn += y * y
                with np.errstate(divide="ignore", invalid="ignore"):
                    res[i] = np.float64(acc) / np.float64(
                        math.sqrt(an) * math.sqrt(bn))
            return res, mask

        for batch in batches:
            n = batch.num_rows
            col_a = batch.column(ia)
            col_b = batch.column(ib) if qb is None else None
            res = fast(col_a, col_b, n)
            if res is not None:
                out = pa.array(res, type=pa.float64())
            else:
                res, mask = slow(col_a, col_b, n)
                out = pa.array(res, type=pa.float64(), mask=mask)
            yield pa.RecordBatch.from_arrays(
                list(batch.columns) + [out], names=names)

    return df.mapInArrow(fn, out_schema)


def topk_cosine(embeddings: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.

    Plan shape: scan -> Arrow scoring map -> TakeOrderedAndProject; no
    shuffle, the top-k is merged on the driver from per-partition heaps.
    The query vector is a kernel constant (not shipped per row);
    rounding stays in the JVM so values match the fold bit-for-bit.
    """
    scored = cosine_rows_arrow(embeddings.select(F.col(id_col), vec_col),
                               vec_col, const_b=query_vec)
    return (scored
            .select(F.col(id_col),
                    F.round(F.col("cos_raw"), 6).alias("cos_sim"))
            .orderBy(F.col("cos_sim").desc(), F.col(id_col))
            .limit(k))


def topk_cosine_many(embeddings: DataFrame, queries: DataFrame,
                     k: int = 10, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     qid_col: str = "qid",
                     qvec_col: str = "qv",
                     ivf_path: str | None = None,
                     centroids: list[list[float]] | None = None,
                     n_probe: int = 2,
                     route_threshold: int = 64) -> DataFrame:
    """Batch ANN: top-k per query vector, many queries in ONE scan.

    Plan shape: scan -> broadcast nested-loop join against the (small)
    query set - an O(n*Q) scoring map, not a shuffle - then one window
    shuffle of the NARROW (qid, id, cos) projection for the per-query
    top-k.  The window moves n*Q 24-byte rows, so the exact path stops
    scaling with Q: when ``ivf_path``+``centroids`` are given AND the
    query count exceeds ``route_threshold``, the call routes itself to
    :func:`topk_cosine_many_ivf` (one partition-pruned scan of the
    materialized index, each vector scored only against the queries
    probing its cell - approximate, recall set by ``n_probe``).
    Without an index the exact path is used regardless of Q.
    """
    from pyspark.sql.window import Window

    if ivf_path is not None and centroids is not None:
        # limit() bounds the routing probe: only threshold+1 rows of
        # the queries frame are materialized, so a derived queries df
        # (filter over a big table) doesn't pay a full scan just to
        # decide the route
        if queries.limit(route_threshold + 1).count() > route_threshold:
            return topk_cosine_many_ivf(
                embeddings.sparkSession, ivf_path, queries, centroids,
                k=k, n_probe=n_probe, id_col=id_col, qid_col=qid_col,
                qvec_col=qvec_col, vec_col=vec_col)
    # NB: routing this fold through cosine_rows_arrow measured WORSE
    # (0.73 -> 1.13 s at 20k x 3): the crossJoin output would ship BOTH
    # vectors per (row, query) pair across the Python boundary, where
    # the JVM fold scores the narrow join output in place.  Kept as the
    # interpreted fold on purpose.
    scored = (embeddings
              .crossJoin(F.broadcast(queries))
              .select(F.col(qid_col),
                      F.col(id_col),
                      F.round(cosine(F.col(vec_col), F.col(qvec_col)), 6)
                      .alias("cos_sim")))
    w = Window.partitionBy(qid_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(qid_col, id_col, "cos_sim",
                    F.col("rank").cast("long").alias("rank")))


def topk_cosine_many_ivf(spark, path: str, queries: DataFrame,
                         centroids: list[list[float]], k: int = 10,
                         n_probe: int = 2, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         qid_col: str = "qid",
                         qvec_col: str = "qv") -> DataFrame:
    """Batch IVF search: many queries against a materialized index
    (:func:`ivf_build_index`) in ONE partition-pruned scan.

    Probed cells are computed driver-side per query (centroids are
    tiny), giving a (qid, qv, cell) probe map exploded over each
    query's ``n_probe`` cells.  The scan filters ``cell IN <union of
    all probed cells>`` (a partition filter - unprobed cells' files are
    never read), broadcast-joins the probe map ON cell so each vector
    is scored only against the queries probing its cell (work is
    sum-of-bucket-sizes, not n*Q), then one narrow window shuffle ranks
    per query.  With ``n_probe == len(centroids)`` results equal the
    exact path.  Output schema matches :func:`topk_cosine_many`.
    """
    from pyspark.sql.window import Window

    from pyspark.sql.types import IntegerType, StructField, StructType

    qrows = queries.select(qid_col, qvec_col).collect()
    probe_rows = []
    for row in qrows:
        qv = [float(x) for x in row[qvec_col]]
        # same sequential-fold distance as the single-query IVF path
        # (bit-stable vs the Spark/DuckDB folds)
        dists = []
        for c in centroids:
            d = 0.0
            for x, y in zip(qv, c):
                d += (x - float(y)) * (x - float(y))
            dists.append(d)
        probed = sorted(range(len(centroids)),
                        key=lambda i: dists[i])[:n_probe]
        for cell in probed:
            probe_rows.append((row[qid_col], cell))
    # qid keeps the CALLER's type; qv rides along from the queries df
    # (broadcast x broadcast - both tiny) so its element type is
    # untouched and scoring matches the exact path bit-for-bit
    cells_df = spark.createDataFrame(probe_rows, StructType([
        StructField(qid_col, queries.schema[qid_col].dataType),
        StructField("cell", IntegerType())]))
    probe_df = cells_df.join(queries.select(qid_col, qvec_col), qid_col)
    all_cells = sorted({cell for _, cell in probe_rows})
    scored = (spark.read.parquet(path)
              .filter(F.col("cell").isin(all_cells))
              .join(F.broadcast(probe_df), "cell")
              .select(F.col(qid_col),
                      F.col(id_col),
                      F.round(cosine(F.col(vec_col), F.col(qvec_col)), 6)
                      .alias("cos_sim")))
    w = Window.partitionBy(qid_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(qid_col, id_col, "cos_sim",
                    F.col("rank").cast("long").alias("rank")))


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-of-dot-product bit signature packed into a long.

    Kept as the fold-based dot: a single signature expression with
    ``len(planes)`` unrolled dim-wide dots would exceed janino's 64 KB
    method limit and degrade its whole stage to interpreted mode
    (callers that need codegen materialize the per-plane dots as
    separate columns instead - see ``cosine_near_dup_pairs_lsh``).
    """
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
    cands = (embeddings
             .withColumn("_sig", lsh_signature(F.col(vec_col), planes))
             .filter(F.col("_sig") == q_sig)
             .select(F.col(id_col), vec_col))
    return (cosine_rows_arrow(cands, vec_col, const_b=query_vec)
            .select(F.col(id_col),
                    F.round(F.col("cos_raw"), 6).alias("cos_sim"))
            .orderBy(F.col("cos_sim").desc(), F.col(id_col))
            .limit(k))


def ivf_centroids(embeddings: DataFrame, n_cells: int = 8,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  iters: int = 2) -> list[list[float]]:
    """Deterministic mini k-means for the IVF coarse quantizer.

    Seeds from the ``n_cells`` lowest-id vectors, then runs a couple of
    Lloyd iterations with all heavy lifting in Spark aggregations (the
    driver only holds the centroids).  At 100 TB you run this on a
    sampled slice; the index build is a one-time batch job.
    """
    import numpy as np
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.stat import Summarizer

    seed_rows = (embeddings.orderBy(id_col).limit(n_cells).collect())
    centroids = [np.asarray(list(r[vec_col]), dtype=np.float64)
                 for r in seed_rows]
    for _ in range(iters):
        assigned = embeddings.select(
            ivf_cell(F.col(vec_col), [c.tolist() for c in centroids])
            .alias("cell"), vec_col)
        # one vector-sum expression per group (Summarizer), not dim
        # separate F.sum columns - the dim-1024 path stays one aggregate
        sums = (assigned.groupBy("cell")
                .agg(F.count("*").alias("n"),
                     Summarizer.sum(
                         array_to_vector(F.col(vec_col))).alias("s"))
                .collect())
        for row in sums:
            centroids[row["cell"]] = np.asarray(
                row["s"].toArray(), dtype=np.float64) / row["n"]
    return [c.tolist() for c in centroids]


def ivf_cell(vec: Column, centroids: list[list[float]]) -> Column:
    """Index of the nearest centroid (squared L2), pure JVM expressions."""
    best_idx = F.lit(0)
    best_dist = _sq_dist(vec, centroids[0])
    for i, c in enumerate(centroids[1:], start=1):
        d = _sq_dist(vec, c)
        cond = d < best_dist
        best_idx = F.when(cond, F.lit(i)).otherwise(best_idx)
        best_dist = F.when(cond, d).otherwise(best_dist)
    return best_idx


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    return F.aggregate(
        F.zip_with(vec, _query_literal(centroid),
                   lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0), lambda acc, v: acc + v)


def topk_cosine_ivf(embeddings: DataFrame, query_vec: list[float],
                    centroids: list[list[float]], k: int = 10,
                    n_probe: int = 2, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """IVF search: score only vectors in the query's ``n_probe`` nearest
    cells.  The scale path bucketizes the table once (write ``cell`` as a
    partition column) so a query reads only its probed cells.

    The probe selection uses a plain sequential f64 fold (not numpy's
    pairwise summation) so it is bit-identical to the Spark/DuckDB
    sequential list folds used everywhere else - required for the oracle.
    """
    dists = []
    for c in centroids:
        d = 0.0
        for x, y in zip(query_vec, c):
            d += (float(x) - float(y)) * (float(x) - float(y))
        dists.append(d)
    probed = sorted(range(len(centroids)), key=lambda i: dists[i])[:n_probe]
    qcol = _query_literal(query_vec)
    return (embeddings
            .withColumn("_cell", ivf_cell(F.col(vec_col), centroids))
            .filter(F.col("_cell").isin(probed))
            .select(F.col(id_col),
                    F.round(cosine(F.col(vec_col), qcol), 6).alias("cos_sim"))
            .orderBy(F.col("cos_sim").desc(), F.col(id_col))
            .limit(k))


def ivf_build_index(embeddings: DataFrame, centroids: list[list[float]],
                    path: str, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> None:
    """Materialize the IVF index: the table written once, PARTITIONED BY
    the coarse cell.  This is the 100 TB search path: a query then reads
    only its probed cells' files (partition pruning at the source), not
    the whole table - the one-time build cost buys every query a
    1/n_cells * n_probe scan.
    """
    (embeddings
     .withColumn("cell", ivf_cell(F.col(vec_col), centroids))
     .write.mode("overwrite").partitionBy("cell").parquet(path))


def topk_cosine_ivf_indexed(spark, path: str, query_vec: list[float],
                            centroids: list[list[float]], k: int = 10,
                            n_probe: int = 2, id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Search a materialized IVF index: ``cell IN probed`` is a partition
    filter, so the scan touches only the probed cells' files.  Results
    are identical to :func:`topk_cosine_ivf` over the same centroids."""
    dists = []
    for c in centroids:
        d = 0.0
        for x, y in zip(query_vec, c):
            d += (float(x) - float(y)) * (float(x) - float(y))
        dists.append(d)
    probed = sorted(range(len(centroids)), key=lambda i: dists[i])[:n_probe]
    q = _query_literal(query_vec)
    return (spark.read.parquet(path)
            .filter(F.col("cell").isin(probed))
            .select(F.col(id_col),
                    F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"))
            .orderBy(F.col("cos_sim").desc(), F.col(id_col))
            .limit(k))


def embed_text(text: Column, dim: int = 16, k: int = 2) -> Column:
    """Hashing-trick TF embedding: word k-shingles -> md5 bucket ->
    integer term-frequency counts (``array<int>`` of length ``dim``).

    Pure Column expressions - one ``aggregate`` fold with a dim-wide
    accumulator, the same shape as the simhash vote fold.  Counts stay
    integers so downstream cosine is a sequential f64 fold over exact
    values - bit-stable against the DuckDB twin.  This is the bridge
    from the text pipeline into the similarity family (crawl -> text ->
    vector -> ANN) without an external embedding model.
    """
    from .dedup import _mh, shingles

    hashed = F.transform(shingles(text, k),
                         lambda s: F.pmod(_mh(s, 0), F.lit(dim)))
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    return F.aggregate(
        hashed, F.array_repeat(F.lit(0), dim),
        lambda acc, b: F.zip_with(
            acc, idx,
            lambda a, j: a + F.when(b == j.cast("long"), 1).otherwise(0)))


def embed_text_table(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", dim: int = 256,
                     k: int = 2) -> DataFrame:
    """Hashing-trick TF embedding as a TABLE op - the large-dim path.

    ``embed_text`` above is a pure Column fold whose accumulator rebuild
    costs O(shingles x dim) work AND allocation per row (measured on the
    sf0.1 documents table, 5k docs at local[32]: fold 2.5s vs table
    0.48s at dim 16; fold 7.3s vs table 0.39s at dim 256 - the fold
    scales with dim, the table path doesn't).  This variant is
    O(shingles + dim) per doc: explode the shingle stream, hash to a
    bucket, count by (doc, bucket) - Spark's partial aggregation
    collapses each doc's shingles map-side, so the one shuffle moves at
    most ``min(shingles, dim)`` (doc, bucket, tf) rows per doc, never
    the raw shingle stream - then assemble the dense ``array<int>``
    from a map lookup per index.

    Returns (id_col, ``embedding`` array<int>); docs with no shingles
    (empty/short text) keep an all-zero vector, matching ``embed_text``.
    Routing: this table op whenever the embedding is materialized as a
    table (it composes with the ANN family, which takes a table of
    vectors) - at ANY dim; keep the ``embed_text`` Column fold only for
    embedding a handful of rows inline (e.g. the single query row)
    where a shuffle stage isn't worth scheduling.
    """
    from .dedup import _mh, shingles

    base = ensure_scan_parallelism(
        df.select(F.col(id_col), F.col(text_col)), id_col)
    tf = (base.select(F.col(id_col),
                      F.explode(shingles(F.col(text_col), k)).alias("_sh"))
          .select(id_col, F.pmod(_mh(F.col("_sh"), 0), F.lit(dim))
                  .alias("_b")))
    if dim <= 64:
        # ONE hash aggregate of dim conditional sums (whole-stage
        # codegen), assembling the dense array directly - drops the
        # second groupBy + map assembly + interpreted per-index
        # transform of the map path below (same integer counts: a sum
        # of equality indicators IS the bucket count).  Bounded at 64
        # aggregates so the codegen stays compact; larger dims keep the
        # sparse (doc, bucket) path whose shuffle width is capped at
        # min(shingles, dim) rows per doc.
        emb = (tf.groupBy(id_col)
               .agg(*[F.sum((F.col("_b") == j).cast("int"))
                      .alias(f"_c{j}") for j in range(dim)])
               .select(id_col,
                       F.array(*[F.col(f"_c{j}").cast("int")
                                 for j in range(dim)]).alias("embedding")))
    else:
        grouped = tf.groupBy(id_col, "_b").agg(F.count("*").alias("_tf"))
        idx = F.sequence(F.lit(0), F.lit(dim - 1))
        dense = F.transform(
            idx, lambda j: F.coalesce(F.element_at(F.col("_m"),
                                                   j.cast("long")),
                                      F.lit(0)).cast("int"))
        emb = (grouped.groupBy(id_col)
               .agg(F.map_from_entries(
                   F.collect_list(F.struct(F.col("_b"),
                                           F.col("_tf").cast("int"))))
                   .alias("_m"))
               .select(id_col, dense.alias("embedding")))
    # empty-text docs vanish in the explode; restore them with zeros
    return (df.select(id_col).join(emb, id_col, "left")
            .select(id_col,
                    F.coalesce(F.col("embedding"),
                               F.array_repeat(F.lit(0).cast("int"), dim))
                    .alias("embedding")))


def cosine_near_dup_pairs_lsh(embeddings: DataFrame, dim: int,
                              threshold: float = 0.95, bands: int = 4,
                              planes_per_band: int = 2, seed: int = 42,
                              max_bucket: int | None = None,
                              max_bucket_factor: float | None = None,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding") -> DataFrame:
    """Embedding near-dup pairs via banded sign-LSH - the scale path.

    OR-amplified signatures (as in MinHash LSH): ``bands`` independent
    groups of ``planes_per_band`` hyperplanes; a pair becomes a candidate
    if it agrees on ALL planes of ANY band, then candidates get the exact
    cosine.  Recall for a pair at angle theta is
    ``1 - (1 - p^planes_per_band)^bands`` with ``p = 1 - theta/pi``
    (~0.89 at cos 0.45 with 4x2) - tune bands up / planes down for more
    recall, the reverse for smaller buckets.

    Sizing at scale: a band has only ``2^planes_per_band`` buckets, so
    uniform data puts ``n / 2^planes_per_band`` ids in EVERY bucket and
    the self-join is O(n^2 / 2^planes_per_band) - the cure for uniform
    mass is ``planes_per_band ~ log2(n) - log2(target_bucket)`` (e.g.
    ~20 planes for 10^9 rows and ~1000-id buckets), NOT a cap.  The caps
    below bound the *skew* a plane count cannot fix (degenerate/
    all-zero embedding clusters piling into one bucket):

    ``max_bucket``: drop (band, chunk) buckets holding more than this
    many ids before the self-join - the identical broadcast anti-join
    bound as ``simhash_hamming_pairs``.  Absolute, so right when the
    caller knows the bucket budget.

    ``max_bucket_factor``: drop buckets holding more than
    ``factor * n / 2^planes_per_band`` ids (factor x the uniform share).
    Scale-free skew guard: on uniform data it drops nothing at ANY n,
    while a degenerate cluster exceeding factor x its fair share is
    excluded.  The per-band total (= n) comes from a window over the
    already-aggregated bucket counts - no second scan, no scalar join.

    Both caps report a deterministic SUBSET: a pair is missed only if
    every band it agrees on is hot (same trade as max_df in
    ``ngram_jaccard_pairs``).  The hot list is tiny, so the exclusion is
    a broadcast anti-join, not a shuffle.

    Plan shape (round-7 restructure, guide sections 2.3/2.4/4.2): one
    explode (x bands) of (id, band, chunk, vec), then each (band,
    chunk) bucket is scored by a VECTORIZED native kernel
    (``applyInPandas`` + numpy GEMM) instead of a relational self-join.
    The previous shape joined the bucket with itself, shuffled the FULL
    O(sum bucket^2) candidate set through a ``distinct`` and
    re-attached the vectors with two more joins, then paid an
    interpreted ~20 us array fold per pair - measured 316 s at sf1.0
    (2*10^8 candidates).  Now each vector crosses the Python boundary
    once per bucket membership (n * bands rows, NOT n^2), pair scoring
    runs at GEMM speed, and only final pairs reach a shuffle (the
    closing cross-band ``distinct``).

    Bit-parity with the SQL fold (the oracle contract) is kept by a
    two-phase score: the GEMM result plus a rigorous floating-point
    error bound selects candidate pairs (a provable SUPERSET of
    ``round(cos, 6) >= threshold``), then each candidate is re-scored
    with the exact sequential f64 fold and Spark's exact HALF_UP
    6-decimal rounding (``Decimal(repr(x))`` mirrors
    ``BigDecimal.valueOf``).  NaN pairs (zero-norm vectors) follow
    Spark/DuckDB NaN-is-greatest comparison semantics.

    Parallelism is by construction: each bucket's ids are split into
    ``n_blocks`` deterministic blocks (``LIVRE_ND_BLOCKS``, default 4)
    and every block PAIR is an independent task, so one hot bucket
    spreads over ``n_blocks * (n_blocks + 1) / 2`` tasks instead of
    one - the knob to raise with cluster size.  Never a cross join;
    the all-pairs variant below is the small-scale twin.
    """
    planes = hyperplanes(dim, bands * planes_per_band, seed)
    # parallelize BEFORE the signature folds: the interpreted per-plane
    # fold costs ~80 us/row and is evaluated by the work frame AND the
    # hot-bucket counts branch - on a starved single-task scan that
    # serialized the whole front of the query (guide 2.5)
    src = ensure_scan_parallelism(
        embeddings.select(F.col(id_col).alias("id"),
                          F.col(vec_col).alias("v")))
    buckets = (src
               .select("id", "v",
                       F.explode(F.array(*[
                           F.struct(F.lit(b).alias("band"),
                                    lsh_signature(
                                        F.col("v"),
                                        planes[b * planes_per_band:
                                               (b + 1) * planes_per_band])
                                    .alias("chunk"))
                           for b in range(bands)])).alias("bb"))
               .select("id", "v",
                       F.col("bb.band").alias("band"),
                       F.col("bb.chunk").alias("chunk")))
    if max_bucket is not None or max_bucket_factor is not None:
        # the cap needs a counting pass over buckets before the scoring
        # pass; a lazy localCheckpoint materializes the (id, vec, band,
        # chunk) frame once so the signature folds are not recomputed
        # by the second consumer (same durability trade as the dedup
        # pairs functions)
        buckets = buckets.localCheckpoint(eager=False)
        n_buckets = 2 ** planes_per_band
        if bands * n_buckets <= 4096:
            # the whole (band, chunk) count table is at most
            # bands * 2^planes_per_band rows - collect it and inline
            # the hot set as a literal filter instead of a
            # counts-groupBy + per-band window + broadcast anti-join
            # (three plan stages the main job had to wait on; the
            # arithmetic below replays the SQL expressions op for op,
            # so the hot set is identical to the oracle's)
            rows = (buckets.groupBy("band", "chunk")
                    .agg(F.count("*").alias("n_ids")).collect())
            band_totals: dict[int, int] = {}
            for r in rows:
                band_totals[r["band"]] = band_totals.get(r["band"], 0) \
                    + r["n_ids"]
            hot_keys = []
            for r in rows:
                is_hot = (max_bucket is not None
                          and r["n_ids"] > max_bucket)
                if not is_hot and max_bucket_factor is not None:
                    share = (band_totals[r["band"]] * max_bucket_factor
                             / n_buckets)
                    is_hot = r["n_ids"] > share
                if is_hot:
                    hot_keys.append(r["band"] * (1 << 60) + r["chunk"])
            if hot_keys:
                buckets = buckets.filter(
                    ~(F.col("band").cast("long") * F.lit(1 << 60)
                      + F.col("chunk")).isin(hot_keys))
        else:
            # planes_per_band sized for real scale: the count table is
            # too wide to collect - keep the distributed shape
            counts = (buckets.groupBy("band", "chunk")
                      .agg(F.count("*").alias("n_ids")))
            hot_cond = F.lit(False)
            if max_bucket is not None:
                hot_cond = hot_cond | (F.col("n_ids") > max_bucket)
            if max_bucket_factor is not None:
                # each id appears exactly once per band, so the band
                # total IS n; the window runs over <= bands * 2^planes
                # aggregate rows
                band_total = F.sum("n_ids").over(Window.partitionBy("band"))
                share = (band_total * max_bucket_factor
                         / (2 ** planes_per_band))
                counts = counts.withColumn("uniform_cap", share)
                hot_cond = hot_cond | (F.col("n_ids") > F.col("uniform_cap"))
            hot = counts.filter(hot_cond).select("band", "chunk")
            buckets = buckets.join(F.broadcast(hot), ["band", "chunk"],
                                   "left_anti")
    n_blocks = int(os.environ.get("LIVRE_ND_BLOCKS", "4"))
    # deterministic block per id (placement only - never in results),
    # every row replicated to each block pair it participates in
    blk = F.pmod(F.xxhash64(F.col("id")), F.lit(n_blocks))
    entries = []
    for j in range(n_blocks):
        entries.append(F.struct(
            F.least(blk, F.lit(j)).alias("lo"),
            F.greatest(blk, F.lit(j)).alias("hi"),
            F.when(blk < j, F.lit("a")).when(blk > j, F.lit("b"))
            .otherwise(F.lit("x")).alias("side")))
    work = (buckets
            .select("id", "v", "band", "chunk",
                    F.explode(F.array(*entries)).alias("e"))
            .select("id", "v", "band", "chunk",
                    F.col("e.lo").alias("lo"), F.col("e.hi").alias("hi"),
                    F.col("e.side").alias("side")))
    id_type = embeddings.schema[id_col].dataType.simpleString()
    pairs = (work.groupBy("band", "chunk", "lo", "hi")
             .applyInPandas(_block_pair_scorer(threshold, dim),
                            schema=f"id_a {id_type}, id_b {id_type},"
                                   f" cos_sim double"))
    # pandas NaN crosses Arrow as NULL; the scorer never emits null, so
    # restore the SQL fold's true NaN for zero-norm pairs (Spark and
    # DuckDB both compare/group NaN as a greatest VALUE, not null)
    pairs = pairs.select(
        "id_a", "id_b",
        F.coalesce(F.col("cos_sim"), F.lit(float("nan"))).alias("cos_sim"))
    return pairs.distinct()


def _block_pair_scorer(threshold: float, dim: int):
    """Pandas kernel scoring one (band, chunk, block-lo, block-hi)
    group: GEMM + error-bounded candidate mask, exact sequential-fold
    rescore of candidates (see cosine_near_dup_pairs_lsh).

    Precondition (as the hyperplane signatures already assume): vectors
    are length-``dim`` with non-null elements.  Null or wrong-length
    vectors are excluded from pairing here, mirroring the SQL fold
    where any null element nulls the dot and the pair is filtered out.
    """

    def score(pdf):
        import math
        from decimal import ROUND_HALF_UP, Decimal

        import numpy as np
        import pandas as pd

        empty = pd.DataFrame({"id_a": pdf["id"].iloc[0:0],
                              "id_b": pdf["id"].iloc[0:0],
                              "cos_sim": pd.Series([], dtype="float64")})
        ok = pdf["v"].map(lambda v: v is not None and len(v) == dim)
        pdf = pdf[ok]
        if len(pdf) == 0:
            return empty
        triangular = bool(pdf["lo"].iat[0] == pdf["hi"].iat[0])
        if triangular:
            a_rows = b_rows = pdf
        else:
            a_rows = pdf[pdf["side"] == "a"]
            b_rows = pdf[pdf["side"] == "b"]
        if len(a_rows) == 0 or len(b_rows) == 0:
            return empty
        # float32 -> float64 widening is exact, matching cast(double)
        va = np.stack(a_rows["v"].to_numpy()).astype(np.float64)
        vb = va if triangular else \
            np.stack(b_rows["v"].to_numpy()).astype(np.float64)
        ida = a_rows["id"].to_numpy()
        idb = ida if triangular else b_rows["id"].to_numpy()

        def seq_norm(m):
            # per-column accumulation: one IEEE multiply + one IEEE add
            # per element in array order - bit-identical to the SQL fold
            acc = np.zeros(len(m))
            for k in range(m.shape[1]):
                x = m[:, k]
                acc = acc + x * x
            return np.sqrt(acc)

        na = seq_norm(va)
        nb = na if triangular else seq_norm(vb)
        dot_m = va @ vb.T
        abs_m = np.abs(va) @ np.abs(vb).T
        denom = na[:, None] * nb[None, :]
        # |GEMM - sequential fold| <= 2*gamma_dim*sum|a_i b_i| with
        # gamma_dim ~ dim*eps ~ 1.4e-14 at dim 64; the 1e-12 factor is
        # ~70x that bound, and the 2e-6 slack covers the half-up
        # rounding boundary (round(x,6) >= t implies x >= t - 5.1e-7)
        err = 1e-12 * abs_m * m_dim_factor(va.shape[1])
        cand = (dot_m + err) >= (threshold - 2e-6) * denom
        if triangular:
            cand = np.triu(cand, k=1)
        out_a, out_b, out_c = [], [], []
        for i, j in zip(*np.nonzero(cand)):
            x, y = va[i], vb[j]
            acc = 0.0
            an = 0.0
            bn = 0.0
            for k in range(x.shape[0]):
                acc += float(x[k]) * float(y[k])
                an += float(x[k]) * float(x[k])
                bn += float(y[k]) * float(y[k])
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = float(np.float64(acc)
                            / np.float64(math.sqrt(an) * math.sqrt(bn)))
            if math.isnan(cos):
                keep, cval = True, float("nan")  # NaN >= t in Spark/DuckDB
            elif math.isinf(cos):
                keep, cval = cos > 0, cos
            else:
                cval = float(Decimal(repr(cos))
                             .quantize(Decimal("0.000001"),
                                       rounding=ROUND_HALF_UP))
                keep = cval >= threshold
            if keep:
                pa, pb = (ida[i], idb[j]) if ida[i] < idb[j] \
                    else (idb[j], ida[i])
                out_a.append(pa)
                out_b.append(pb)
                out_c.append(cval)
        if not out_a:
            return empty
        return pd.DataFrame({"id_a": out_a, "id_b": out_b,
                             "cos_sim": out_c})

    return score


def m_dim_factor(dim: int) -> float:
    """Error-bound scale for the GEMM candidate mask: grows linearly
    with dimension so the 1e-12 base factor stays ~70x above the real
    gamma bound at any dim."""
    return max(1.0, dim / 64.0)


def cosine_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """All embedding pairs with cosine >= threshold.

    O(n^2) cross-join - correct baseline for oracle checking; use
    ``cosine_near_dup_pairs_lsh`` at scale (join on signature first).
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
