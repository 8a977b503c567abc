"""Embedding similarity search: brute-force cosine top-k baseline and an
LSH-bucketed approximate path, plus embedding-cosine near-dup pairs.

The embedding column is array<float|double>. Dot products / norms are
built-in higher-order functions (F.aggregate / F.zip_with) — JVM-side, no
Python in the hot path. The LSH path (random hyperplanes derived
deterministically from xxhash64, no RNG state to ship) buckets vectors so
query-time work is O(bucket), the 100 TB scale path.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def topk_cosine(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k by cosine to a constant query vector.
    One scan + one top-k (sort spilled partially, limit pushed into the
    shuffle as TakeOrderedAndProject) — the correctness baseline."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        embeddings.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane from a hash — identical
    on every executor with zero RNG state shipped."""
    import numpy as np

    rs = np.random.RandomState(0xC0FFEE + plane_idx)
    v = rs.standard_normal(dim)
    return (v / np.linalg.norm(v)).tolist()


def with_lsh_bucket(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 8,
    vec_col: str = "embedding",
    out: str = "lsh_bucket",
) -> DataFrame:
    """Random-hyperplane (SimHash-for-vectors) bucket id: n_planes sign
    bits packed into a long. Vectors in the same bucket are likely close
    in angle; query probes its own bucket (optionally multi-probe)."""
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, i)])
        bit = (dot(F.col(vec_col), plane) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return embeddings.withColumn(out, bucket)


def _bucket_of(query_vec: list[float], n_planes: int) -> int:
    b = 0
    for i in range(n_planes):
        plane = _hyperplane(len(query_vec), i)
        s = sum(p * q for p, q in zip(plane, query_vec))
        if s > 0:
            b |= 1 << i
    return b


def ann_topk_lsh(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    multiprobe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: scan only buckets within `multiprobe_hamming` of
    the query's bucket. With a bucketed/partitioned table this is partition
    pruning; here it's a pushed-down IN filter."""
    dim = len(query_vec)
    qb = _bucket_of(query_vec, n_planes)
    probes = [qb]
    if multiprobe_hamming >= 1:
        probes += [qb ^ (1 << i) for i in range(n_planes)]
    if multiprobe_hamming >= 2:
        probes += [
            qb ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    bucketed = with_lsh_bucket(embeddings, dim, n_planes, vec_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        bucketed.where(F.col("lsh_bucket").isin(probes))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_seed_centroids(
    embeddings: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic IVF-Flat coarse quantizer: the n_centroids lowest-id
    vectors serve as centroids (collected driver-side — n_centroids*dim
    floats, tiny at any corpus size). A k-means refinement would drop in
    here (each Lloyd iteration is one broadcast argmax + one groupBy
    mean), but training is orthogonal to the query path; seed centroids
    keep the whole index reproducible with zero iterations."""
    rows = (
        embeddings.select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
        )
        .orderBy("cid")
        .limit(n_centroids)  # n LOWEST ids — works for any id space,
        .collect()           # not just 0-based dense ids
    )
    if not rows:
        raise ValueError("ivf_seed_centroids: embeddings table is empty")
    return [(int(r["cid"]), [float(x) for x in r["cvec"]]) for r in rows]


def with_ivf_cell(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    out: str = "ivf_cell",
) -> DataFrame:
    """Assign each vector to its max-cosine centroid — one narrow map
    over an array of centroid literals (same zero-shuffle shape as
    with_lsh_bucket): no join, no aggregation, scales embarrassingly.
    Ties break to the lower centroid id (max over (sim, -cid))."""
    structs = [
        F.struct(
            cosine(
                F.col(vec_col), F.array(*[F.lit(float(x)) for x in cv])
            ).alias("sim"),
            F.lit(-cid).alias("negcid"),
        )
        for cid, cv in centroids
    ]
    best = F.array_max(F.array(*structs))
    return embeddings.withColumn(out, (-best["negcid"]).cast("int"))


def ann_topk_ivf(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-Flat approximate top-k: probe only the n_probe inverted lists
    whose centroids are most cosine-similar to the query. With the
    assignment written as a partition column (write_ann_index's pattern),
    the probe set becomes partition pruning; here it is a pushed-down IN
    filter over the map-computed cell id. Driver-side centroid ranking
    uses the same left-fold dot/sqrt arithmetic as the engine, so the
    probe set is reproducible."""
    cents = ivf_seed_centroids(embeddings, n_centroids, id_col, vec_col)

    def _cos(a: list[float], b: list[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    ranked = sorted(
        cents, key=lambda c: (-_cos(c[1], query_vec), c[0])
    )
    probes = [cid for cid, _ in ranked[:n_probe]]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        with_ivf_cell(embeddings, cents, vec_col)
        .where(F.col("ivf_cell").isin(probes))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def write_ann_index(
    embeddings: DataFrame,
    path: str,
    dim: int,
    n_planes: int = 8,
    vec_col: str = "embedding",
) -> None:
    """Materialize the ANN index: the embedding table WRITTEN partitioned
    by lsh_bucket. At query time the probe set becomes PARTITION PRUNING
    (directory-level skip, asserted in tests/test_plans.py) instead of a
    full-scan filter — the difference between O(buckets_probed/2^n_planes
    of the data) and O(all data) I/O per query at 100 TB. Repartitioning
    by bucket before the write keeps one writer per bucket partition
    (no small-file explosion at cluster scale)."""
    b = with_lsh_bucket(embeddings, dim, n_planes, vec_col)
    (
        b.repartition("lsh_bucket")
        .write.mode("overwrite")
        .partitionBy("lsh_bucket")
        .parquet(path)
    )


def ann_topk_lsh_indexed(
    spark,
    index_path: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    multiprobe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query the materialized index: identical semantics to ann_topk_lsh
    but the bucket probe list prunes PARTITIONS of the written table."""
    qb = _bucket_of(query_vec, n_planes)
    probes = [qb]
    if multiprobe_hamming >= 1:
        probes += [qb ^ (1 << i) for i in range(n_planes)]
    if multiprobe_hamming >= 2:
        probes += [
            qb ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        spark.read.parquet(index_path)
        .where(F.col("lsh_bucket").isin(probes))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket self-join (only
    same-bucket vectors meet) + exact cosine verify. The scale path for
    embedding dedup of a 100 TB corpus; brute force would be O(n^2)."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    b = with_lsh_bucket(embeddings, dim, n_planes, vec_col).select(
        F.col(id_col), F.col(vec_col), "lsh_bucket"
    )
    x, y = b.alias("x"), b.alias("y")
    return (
        x.join(
            y,
            (F.col("x.lsh_bucket") == F.col("y.lsh_bucket"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
            F.round(
                cosine(F.col(f"x.{vec_col}"), F.col(f"y.{vec_col}")), 6
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
