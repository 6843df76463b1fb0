"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exactness baseline; axis-sign LSH
bucketing is the scale path (bucket first, score only within the
query's bucket — at 10^12 rows the bucket join replaces the full scan).

Engine-portability: element-wise ops fold left-to-right over the array
in both Spark (``aggregate``) and DuckDB (``list_inner_product``), on
doubles cast from the same float32 values — bit-identical results,
then rounded for the value-hash compare.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# axis-aligned sign planes; 4 bits -> 16 buckets (tune #planes to the
# corpus size: candidates-per-bucket ~ N / 2^planes)
LSH_DIMS = (0, 16, 32, 48)


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(_as_double(a), _as_double(b),
                                  lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(_as_double(a), lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(embeddings: DataFrame, query_vec_id: int, k: int = 10,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k vs one stored vector.

    The 1-row query side is cross-broadcast (scan stays a single
    narrow pass over the big side); total order (sim desc, vec_id asc)
    makes the top-k partition-invariant.
    """
    query = embeddings.filter(F.col(id_col) == query_vec_id) \
                      .select(F.col(vec_col).alias("qvec"))
    scored = (embeddings.crossJoin(F.broadcast(query))
              .filter(F.col(id_col) != query_vec_id)
              .select(F.col(id_col),
                      F.round(cosine(F.col(vec_col), F.col("qvec")), 6)
                      .alias("sim")))
    return scored.orderBy(F.desc("sim"), F.asc(id_col)).limit(k)


def axis_sign_bucket(vec_col: Column, dims=LSH_DIMS) -> Column:
    """LSH bucket id: sign bits of fixed dimensions, as a bit-string."""
    bits = [F.when(F.element_at(vec_col, d + 1) >= 0, F.lit("1"))
            .otherwise(F.lit("0")) for d in dims]
    return F.concat(*bits)


def lsh_bucket_counts(embeddings: DataFrame,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id") -> DataFrame:
    """(bucket, n_vecs, min_vec_id): the bucket histogram — the shape
    that decides ANN candidate-list sizes at scale."""
    return (embeddings
            .withColumn("bucket", axis_sign_bucket(F.col(vec_col)))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 F.min(id_col).alias("min_vec_id")))


def lsh_topk(embeddings: DataFrame, query_vec_id: int, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dims=LSH_DIMS) -> DataFrame:
    """ANN: score only vectors sharing the query's LSH bucket."""
    with_bucket = embeddings.withColumn(
        "bucket", axis_sign_bucket(F.col(vec_col), dims))
    query = (with_bucket.filter(F.col(id_col) == query_vec_id)
             .select(F.col(vec_col).alias("qvec"),
                     F.col("bucket").alias("qbucket")))
    cands = (with_bucket.join(F.broadcast(query),
                              F.col("bucket") == F.col("qbucket"))
             .filter(F.col(id_col) != query_vec_id))
    scored = cands.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("qvec")), 6).alias("sim"))
    return scored.orderBy(F.desc("sim"), F.asc(id_col)).limit(k)


def embedding_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.35,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-dup pairs: same axis-sign LSH bucket AND
    round(cosine, 6) >= threshold.

    The bucket equi-join bounds the quadratic candidate term to
    bucket-local pairs — at 10^12 rows you add sign planes so
    candidates-per-bucket stays ~constant; the oracle implements the
    identical bucket restriction, so results are exact-comparable."""
    e = embeddings.select(F.col(id_col), F.col(vec_col),
                          axis_sign_bucket(F.col(vec_col)).alias("bucket"))
    a = e.select(F.col(id_col).alias("vec_a"),
                 F.col(vec_col).alias("va"), "bucket")
    b = e.select(F.col(id_col).alias("vec_b"),
                 F.col(vec_col).alias("vb"), "bucket")
    return (a.join(b, "bucket")
            .filter(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b",
                    F.round(cosine(F.col("va"), F.col("vb")), 6).alias("sim"))
            .filter(F.col("sim") >= threshold))


# -- IVF-style ANN -----------------------------------------------------------

IVF_K = 8  # coarse cells; production uses k-means centroids — here the
           # centroid set is pinned deterministically (vec_id < K) so the
           # assignment is reproducible in any engine


def auto_n_cells(n_vectors: int) -> int:
    """Data-derived IVF cell count: ~sqrt(N), the standard IVF sizing
    (cells and per-cell candidate lists both grow as sqrt(N), so probe
    cost is balanced between the coarse scan and the cell scan).
    Clamped to [1, 65536]: above that the broadcast centroid table and
    the k x d driver round-trip in Lloyd stop being 'small' — at 10^12
    vectors you shard the coarse quantizer instead (IVF-HNSW
    territory), which is out of scope here and called out in SURVEY."""
    return max(1, min(65536, round(n_vectors ** 0.5)))


def ivf_cells(embeddings: DataFrame, n_cells: int | None = IVF_K,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(vec_id, embedding, cid): assign every vector to its max-cosine
    coarse centroid (tie -> lowest cid).

    Scale shape: the centroid table is tiny and broadcast; assignment
    is a narrow x K expansion reduced by a per-vector argmax — the only
    shuffle is the argmax window on vec_id, which AQE coalesces.

    ``n_cells=None`` derives ~sqrt(N) cells from the corpus size
    (auto_n_cells) instead of the fixture-sized default.  Past
    VECTORIZE_ASSIGN_OVER cells the assignment switches to the
    Arrow+GEMM path (see _assign_numpy) — the interpreted cosine fold
    is O(k·d) per vector and dominates the build in the sqrt(N)-cells
    regime."""
    if n_cells is None:
        n_cells = auto_n_cells(embeddings.count())
    cents = (embeddings.filter(F.col(id_col) < n_cells)
             .select(F.col(id_col).alias("cid"),
                     F.col(vec_col).alias("cvec")))
    if n_cells > VECTORIZE_ASSIGN_OVER:
        rows = [(int(r["cid"]), [float(x) for x in r["cvec"]])
                for r in cents.collect()]           # k x d, driver-bounded
        return _assign_numpy(embeddings, rows, id_col, vec_col)
    scored = (embeddings.crossJoin(F.broadcast(cents))
              .withColumn("csim", cosine(F.col(vec_col), F.col("cvec"))))
    # min-struct argmax (sim desc, cid asc as a total order) — a
    # partial-aggregating hash agg, not a row_number window sort; same
    # pattern as ivf_assign/kmeans_centroids below
    return (scored.groupBy(id_col)
            .agg(F.min(F.struct(F.negate("csim").alias("neg"),
                                F.col("cid"),
                                F.col(vec_col).alias("v"))).alias("best"))
            .select(F.col(id_col),
                    F.col("best.v").alias(vec_col),
                    F.col("best.cid").alias("cid")))


def ivf_cell_sizes(embeddings: DataFrame,
                   n_cells: int | None = IVF_K) -> DataFrame:
    """(cid, n_vecs, min_vec_id): the IVF cell histogram — decides the
    candidate-list size the ANN probe scans per query.  ``n_cells=None``
    sizes the quantizer from the data (auto_n_cells ~ sqrt(N))."""
    return (ivf_cells(embeddings, n_cells)
            .groupBy("cid")
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 F.min("vec_id").alias("min_vec_id")))


def ivf_topk(embeddings: DataFrame, query_vec_id: int, k: int = 10,
             n_cells: int = IVF_K, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """ANN: exact cosine top-k restricted to the query's IVF cell."""
    cells = ivf_cells(embeddings, n_cells, id_col, vec_col)
    # the query's cell from a 1-row x K scoring of the query vector
    # alone — NOT by filtering `cells`, which would execute the full
    # corpus-wide assignment pipeline a second time just to look up
    # one row (the candidate side below is the only corpus-wide pass)
    cents = (embeddings.filter(F.col(id_col) < n_cells)
             .select(F.col(id_col).alias("cid"),
                     F.col(vec_col).alias("cvec")))
    qside = (embeddings.filter(F.col(id_col) == query_vec_id)
             .select(F.col(vec_col).alias("qvec")))
    query = (qside.crossJoin(F.broadcast(cents))
             .withColumn("csim", cosine(F.col("qvec"), F.col("cvec")))
             .groupBy()
             .agg(F.min(F.struct(F.negate("csim").alias("neg"),
                                 F.col("cid"),
                                 F.col("qvec").alias("q"))).alias("best"))
             .select(F.col("best.q").alias("qvec"),
                     F.col("best.cid").alias("qcid")))
    cands = (cells.join(F.broadcast(query), F.col("cid") == F.col("qcid"))
             .filter(F.col(id_col) != query_vec_id))
    scored = cands.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("qvec")), 6).alias("sim"))
    return scored.orderBy(F.desc("sim"), F.asc(id_col)).limit(k)


# -- k-means coarse quantization (the production IVF path) -------------------

# above this many centroids the per-vector assignment switches from the
# SQL min-struct argmax (whole-stage codegen, bit-pinned vs the DuckDB
# twins at fixture scale) to one Arrow-batched numpy matmul: the k x N
# cosine matrix is a BLAS GEMM, ~100x the interpreted higher-order-fn
# fold once k reaches the sqrt(N) sizing real corpora need
VECTORIZE_ASSIGN_OVER = 32


def _assign_numpy(df: DataFrame, cents_list, id_col: str, vec_col: str):
    """(id, vec, cid) via a vectorized centroid argmax: the ascending-cid
    centroid matrix rides into each Arrow batch, normalized rows x
    normalized centroids is one GEMM, argmax(first-max) reproduces the
    min-struct tie-break (lowest cid among equals).  Driver holds only
    k x d floats — the same bounded round-trip Lloyd already makes.
    Numeric caveat (documented on the callers): float64 GEMM and the
    left-fold SQL cosine can disagree in the last ulp, so near-exact
    centroid ties may assign differently; the learned-quantizer path is
    verified by its recall contract, not by byte equality."""
    import numpy as np

    cents_list = sorted(cents_list, key=lambda cv: cv[0])
    cids = np.asarray([c for c, _ in cents_list], dtype=np.int64)
    c_mat = np.asarray([v for _, v in cents_list], dtype=np.float64)
    c_mat = c_mat / np.maximum(
        np.linalg.norm(c_mat, axis=1, keepdims=True), 1e-300)
    types = dict(df.dtypes)
    schema = f"`{id_col}` {types[id_col]}, `{vec_col}` {types[vec_col]}, " \
             "cid int"

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            v = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True),
                               1e-300)
            best = (v @ c_mat.T).argmax(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col],
                                vec_col: pdf[vec_col],
                                "cid": cids[best].astype("int32")})

    return df.select(id_col, vec_col).mapInPandas(assign, schema)


def kmeans_centroids(embeddings: DataFrame, n_cells: int | None = IVF_K,
                     iters: int = 5, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Lloyd iterations as DataFrame ops: broadcast the k centroids,
    assign every vector to its max-cosine centroid (tie -> lowest cid),
    recompute each centroid as the element-wise mean of its members
    (posexplode to (cid, pos, val) -> avg -> regroup: a d-fold narrow
    expansion + one shuffle per iteration, no collect_list of vectors).

    Deterministic: seeded from the first ``n_cells`` vectors by id,
    fixed iteration count, total-order tie-breaks.  Only the k x d
    centroid table itself touches the driver between iterations (the
    same bounded-collect pattern MLlib uses — centers are O(k·d), not
    O(N)); an empty cell keeps its previous centroid.
    """
    spark = embeddings.sparkSession
    if n_cells is None:
        n_cells = auto_n_cells(embeddings.count())
    # seed from the n_cells SMALLEST ids (not `id < n_cells`, which
    # silently yields fewer/zero centroids on a non-0-based id space)
    seeds = (embeddings.select(id_col, vec_col)
             .orderBy(id_col).limit(n_cells).collect())
    if len(seeds) < n_cells:
        raise ValueError(f"kmeans_centroids: corpus has only "
                         f"{len(seeds)} vectors for {n_cells} cells")
    cents = [(cid, [float(x) for x in r[1]])
             for cid, r in enumerate(seeds)]
    base = embeddings.select(F.col(id_col).alias("vec_id"),
                             F.col(vec_col).alias("v"))
    vectorized = n_cells > VECTORIZE_ASSIGN_OVER
    for _ in range(iters):
        if vectorized:
            assigned = _assign_numpy(base, cents, "vec_id", "v") \
                .select("cid", "v")
        else:
            cdf = spark.createDataFrame(cents, "cid int, cvec array<double>")
            assigned = (base.crossJoin(F.broadcast(cdf))
                        .withColumn("csim",
                                    cosine(F.col("v"), F.col("cvec")))
                        .groupBy("vec_id")
                        .agg(F.min(F.struct(F.negate("csim"), "cid", "v"))
                             .alias("best"))
                        .select(F.col("best.cid").alias("cid"),
                                F.col("best.v").alias("v")))
        # decimal-exact mean: a double F.avg's partial-aggregation
        # order varies with task scheduling, which would break the
        # documented bit-determinism of the centroids (and downstream
        # assignments) run-to-run.  Decimal addition is associative-
        # exact, so the sum — and hence the mean — is order-independent.
        means = (assigned.select("cid", F.posexplode("v").alias("pos", "x"))
                 .groupBy("cid", "pos")
                 .agg((F.sum(F.col("x").cast("decimal(38,18)"))
                       / F.count(F.lit(1))).cast("double").alias("m"))
                 .groupBy("cid")
                 .agg(F.array_sort(F.collect_list(F.struct("pos", "m")))
                      .alias("pm"))
                 .select("cid", F.col("pm.m").alias("cvec")))
        new = {int(r[0]): [float(x) for x in r[1]] for r in means.collect()}
        cents = [(cid, new.get(cid, vec)) for cid, vec in cents]
    return spark.createDataFrame(cents, "cid int, cvec array<double>")


def ivf_assign(embeddings: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id",
               vec_col: str = "embedding",
               vectorized: bool | None = None) -> DataFrame:
    """(vec_id, embedding, cid): max-cosine assignment against an
    arbitrary (broadcast) centroid table — the generalization of
    ivf_cells to learned centroids.  ``vectorized=None`` auto-selects
    the Arrow+GEMM path once the centroid count passes
    VECTORIZE_ASSIGN_OVER (the sqrt(N)-cells regime where the
    interpreted cosine fold dominates the whole IVF build)."""
    if vectorized is None or vectorized:
        cents_rows = [(int(r["cid"]), [float(x) for x in r["cvec"]])
                      for r in centroids.collect()]  # k x d, driver-bounded
        if vectorized is None:
            vectorized = len(cents_rows) > VECTORIZE_ASSIGN_OVER
        if vectorized:
            return _assign_numpy(embeddings, cents_rows, id_col, vec_col)
    scored = (embeddings.crossJoin(F.broadcast(centroids))
              .withColumn("csim", cosine(F.col(vec_col), F.col("cvec"))))
    # min-struct argmax (negated sim asc, then cid asc == sim desc, cid
    # asc): a partial-aggregating hash agg instead of a window sort —
    # same pattern as kmeans_centroids above and the link-scoring
    # best-pick (operators/kg.py).  No row_number, no per-key sort.
    return (scored.groupBy(id_col)
            .agg(F.min(F.struct(F.negate("csim").alias("neg"),
                                F.col("cid"),
                                F.col(vec_col).alias("v"))).alias("best"))
            .select(F.col(id_col),
                    F.col("best.v").alias(vec_col),
                    F.col("best.cid").alias("cid")))


def ivf_kmeans_recall(embeddings: DataFrame, n_queries: int = 20,
                      k: int = 10, n_cells: int | None = IVF_K,
                      iters: int = 5,
                      nprobe: int = 5, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """One-row (n_queries, recall, recall_ge_09): average recall@k of
    k-means-IVF with ``nprobe`` probed cells against brute-force cosine
    top-k, over the first ``n_queries`` stored vectors.

    The verification harness for the production ANN path: brute force
    is the exactness baseline, the IVF side is the plan that survives
    10^12 rows (broadcast centroids, per-cell candidate lists — scan
    cost ~ nprobe/n_cells of the corpus per query).

    Caveat pinned by tests/test_ivf_kmeans.py: the synthetic embeddings
    are near-isotropic (no cluster structure — avg pairwise cosine
    ~3e-4), which is IVF's worst case: recall ~ fraction of corpus
    scanned, hence the high default nprobe here.  On real embedding
    corpora (which cluster), recall >> scan fraction at small nprobe;
    the recall/nprobe curve is the tuning artifact either way."""
    # guard the denominator: with fewer than n_queries vectors (or a
    # corpus of <= k) the fixed n_queries*k denominator would silently
    # deflate recall and the output row would misstate the query count
    n_avail = embeddings.count()
    if n_cells is None:
        n_cells = auto_n_cells(n_avail)
    if n_avail < n_queries or n_avail <= k:
        raise ValueError(
            f"ivf_kmeans_recall needs > {k} vectors and >= {n_queries} "
            f"queries; corpus has {n_avail}")
    cents = kmeans_centroids(embeddings, n_cells, iters, id_col, vec_col)
    assigned = ivf_assign(embeddings, cents, id_col, vec_col)
    # query set = the n_queries SMALLEST ids (id-space-agnostic)
    qids = embeddings.select(id_col).orderBy(id_col).limit(n_queries)
    queries = (assigned.join(F.broadcast(qids), id_col, "left_semi")
               .select(F.col(id_col).alias("qid"),
                       F.col(vec_col).alias("qvec")))

    def topk(cands):
        w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc(id_col))
        return (cands.withColumn("sim", F.round(
                    cosine(F.col(vec_col), F.col("qvec")), 6))
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= k).select("qid", id_col))

    bf = topk(embeddings.crossJoin(F.broadcast(queries))
              .filter(F.col(id_col) != F.col("qid")))

    wq = Window.partitionBy("qid").orderBy(F.desc("qsim"), F.asc("cid"))
    qcells = (queries.crossJoin(F.broadcast(cents))
              .withColumn("qsim", cosine(F.col("qvec"), F.col("cvec")))
              .withColumn("rn", F.row_number().over(wq))
              .filter(F.col("rn") <= nprobe)
              .select("qid", "qvec", "cid"))
    iv = topk(assigned.join(F.broadcast(qcells), "cid")
              .filter(F.col(id_col) != F.col("qid")))

    hits = bf.join(iv, ["qid", id_col], "left_semi")
    return (hits.agg((F.count(F.lit(1)) / (n_queries * k)).alias("recall"))
            .select(F.lit(n_queries).alias("n_queries"),
                    F.round("recall", 6).alias("recall"),
                    (F.col("recall") >= 0.9).alias("recall_ge_09")))


# -- SQL twins ---------------------------------------------------------------

def sql_cosine(a: str, b: str) -> str:
    """DuckDB cosine on double-cast lists (same left fold as Spark)."""
    return (f"(list_inner_product({a}::DOUBLE[], {b}::DOUBLE[]) / "
            f"(sqrt(list_inner_product({a}::DOUBLE[], {a}::DOUBLE[])) * "
            f"sqrt(list_inner_product({b}::DOUBLE[], {b}::DOUBLE[]))))")


def sql_axis_sign_bucket(vec: str, dims=LSH_DIMS) -> str:
    bits = " || ".join(
        f"(CASE WHEN {vec}[{d + 1}] >= 0 THEN '1' ELSE '0' END)" for d in dims)
    return f"({bits})"


# -- SemDeDup: semantic dedup inside k-means cells ---------------------------


def semdedup(embeddings: DataFrame, n_cells: int | None = IVF_K,
             threshold: float = 0.9,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """(vec_id, cid, centroid_sim, dup_of, semdedup_drop): SemDeDup
    (Abbas et al., 2023 — "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): cluster the embedding
    space into IVF cells, and WITHIN each cell drop every vector whose
    cosine to a kept-priority predecessor reaches ``threshold``.
    Kept-priority follows the paper's finding that low-centroid-
    similarity ("edge of cluster") examples are the better survivors:
    the order is (centroid_sim ASC, vec_id ASC), and x is dropped iff
    some same-cell y earlier in that order has round(cos(x,y),6) >=
    threshold — exactly the reference implementation's
    triu-of-the-sorted-similarity-matrix rule, made engine-portable by
    rounding both the pair cosine and the ordering key.  ``dup_of``
    reports MIN(vec_id) among a dropped vector's eliminators (a
    deterministic witness, not the full set).

    Scale shape: cell assignment is ivf_cells (broadcast centroids /
    GEMM past 32 cells); the pair stage is ONE equi-join on cid whose
    cost is sum(cell_size^2) — the same quadratic SemDeDup itself pays
    per cluster, bounded by sqrt(N)-sized cells under auto_n_cells
    sizing; the eliminator argmin combines map-side.  No corpus-wide
    cartesian: every pair shares a cid."""
    k = n_cells if n_cells is not None else auto_n_cells(
        embeddings.count())
    cells = ivf_cells(embeddings, k, id_col, vec_col)
    cents = (embeddings.filter(F.col(id_col) < k)
             .select(F.col(id_col).alias("c_cid"),
                     F.col(vec_col).alias("cvec")))
    cs = (cells.join(F.broadcast(cents), F.col("cid") == F.col("c_cid"))
          .select(F.col(id_col), F.col(vec_col), F.col("cid"),
                  F.round(cosine(F.col(vec_col), F.col("cvec")), 6)
                  .alias("centroid_sim")))
    x = cs.select(F.col(id_col).alias("x_id"),
                  F.col(vec_col).alias("x_vec"),
                  F.col("cid").alias("x_cid"),
                  F.col("centroid_sim").alias("x_sim"))
    y = cs.select(F.col(id_col).alias("y_id"),
                  F.col(vec_col).alias("y_vec"),
                  F.col("cid").alias("y_cid"),
                  F.col("centroid_sim").alias("y_sim"))
    earlier = (F.col("y_sim") < F.col("x_sim")) | \
              ((F.col("y_sim") == F.col("x_sim"))
               & (F.col("y_id") < F.col("x_id")))
    elim = (x.join(y, F.col("x_cid") == F.col("y_cid"))
            .filter(earlier)
            .filter(F.round(cosine(F.col("x_vec"), F.col("y_vec")), 6)
                    >= threshold)
            .groupBy("x_id")
            .agg(F.min("y_id").alias("dup_of")))
    return (cs.join(elim, cs[id_col] == F.col("x_id"), "left")
            .select(F.col(id_col), F.col("cid"), F.col("centroid_sim"),
                    F.col("dup_of"),
                    F.col("dup_of").isNotNull().alias("semdedup_drop")))


def sql_semdedup(table: str, n_cells: int = IVF_K,
                 threshold: float = 0.9,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> str:
    """DuckDB twin of semdedup over ``table`` (fixed ``n_cells``)."""
    cos_xc = sql_cosine("e.embedding", "c.cvec")
    cos_xy = sql_cosine("x.embedding", "y.embedding")
    return f"""
WITH c AS (SELECT {id_col} AS cid, {vec_col} AS cvec
           FROM {table} WHERE {id_col} < {n_cells}),
scored AS (
  SELECT e.{id_col} AS vec_id, e.{vec_col} AS embedding, c.cid,
         {cos_xc} AS csim
  FROM {table} e CROSS JOIN c
),
ranked AS (
  SELECT vec_id, embedding, cid, csim,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY csim DESC, cid ASC) AS rn
  FROM scored
),
cells AS (SELECT vec_id, embedding, cid,
                 round(csim, 6) AS centroid_sim
          FROM ranked WHERE rn = 1),
elim AS (
  SELECT x.vec_id, MIN(y.vec_id) AS dup_of
  FROM cells x JOIN cells y ON x.cid = y.cid
   AND ((y.centroid_sim < x.centroid_sim)
        OR (y.centroid_sim = x.centroid_sim AND y.vec_id < x.vec_id))
   AND round({cos_xy}, 6) >= {threshold}
  GROUP BY x.vec_id
)
SELECT cells.vec_id, cells.cid, cells.centroid_sim,
       elim.dup_of, elim.dup_of IS NOT NULL AS semdedup_drop
FROM cells LEFT JOIN elim USING (vec_id)
"""
