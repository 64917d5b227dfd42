"""Similarity search over embedding columns (array<float>).

Two paths:
- cosine_topk:      brute-force exact top-k. The query set is broadcast, so
                    the big side streams once with no shuffle; cost is
                    O(N x |Q| x dim) FLOPs JVM-side. Exact baseline.
- lsh_cosine_topk:  random-hyperplane LSH bucketing, then exact rerank
                    inside buckets. The 100 TB path: candidate generation is
                    a keyed join instead of a full cross product. Signatures
                    are computed in a vectorized Arrow batch (mapInPandas) —
                    the sanctioned slow path, ~100x faster than row-at-a-time.

Dot products fold left-to-right (F.aggregate), so scores are deterministic
for a fixed element order — required for differential testing and stable
top-k membership.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    `queries` must have (query_id_col, vec_col). The query side is
    broadcast; ranking uses a per-query window with id tiebreak. Scores are
    rounded to 6 dp AFTER ranking-relevant comparison (rank on rounded score
    + id) so results are reproducible across engines.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    scored = (
        embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec"))
        .join(q, F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("vec"), F.col("q_vec"))
                / (_norm(F.col("vec")) * _norm(F.col("q_vec"))),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_signatures(
    embeddings: DataFrame,
    num_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (sign-bit signature packed
    into an int). Vectorized numpy matmul over Arrow batches — one pass, no
    shuffle; planes are derived from the seed on each executor (no broadcast
    of Python state needed)."""
    import numpy as np
    import pandas as pd

    out_schema = f"{id_col} long, bucket long"

    def signer(batches):
        planes = np.random.RandomState(seed).standard_normal((dim, num_planes))
        weights = 1 << np.arange(num_planes, dtype=np.int64)
        for pdf in batches:
            mat = np.vstack(pdf[vec_col].to_numpy())  # (batch, dim) float32
            bits = (mat.astype(np.float64) @ planes) > 0
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "bucket": bits @ weights}
            )

    return embeddings.select(id_col, vec_col).mapInPandas(signer, out_schema)


def lsh_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate cosine top-k: bucket by hyperplane signature, exact rerank
    within the query's bucket. Recall < 1 by construction (single probe);
    raise recall with fewer planes or multi-probe. Join is keyed on bucket,
    so the big side never cross-joins."""
    sig = hyperplane_signatures(embeddings, num_planes, dim, seed, id_col, vec_col)
    base = embeddings.join(sig, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        "bucket",
    )
    qsig = hyperplane_signatures(
        queries.withColumnRenamed(query_id_col, id_col), num_planes, dim, seed, id_col, vec_col
    )
    q = (
        queries.withColumnRenamed(query_id_col, id_col)
        .join(qsig, id_col)
        .select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "bucket"
        )
    )
    scored = (
        base.join(q, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("vec"), F.col("q_vec"))
                / (_norm(F.col("vec")) * _norm(F.col("q_vec"))),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
