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


def lsh_bucket_sizes(
    embeddings: DataFrame,
    dim: int | None = None,
    n_planes: int = 8,
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucket-size histogram for the near-dup LSH: the operational check
    that sizes max_bucket (and counts what a given cap would skip).
    One narrow map + one map-side-combining groupBy."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    return (
        with_lsh_bucket(embeddings, dim, n_planes, vec_col)
        .groupBy("lsh_bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
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


def ivf_lloyd_iterate(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    iterations: int = 1,
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Distributed Lloyd refinement of the IVF coarse quantizer. Each
    iteration is exactly the two cheap distributed steps: assign =
    broadcast argmax over centroid literals (with_ivf_cell, no shuffle),
    update = per-(cell, dim) mean via one posexplode + map-side-combining
    groupBy (n*dim rows through one shuffle of |cells|*dim groups).
    Collected result is n_centroids*dim floats — tiny at any corpus size.
    Empty cells keep their previous centroid (standard k-means handling).
    Means are then L2-normalized so the argmax stays a pure cosine
    quantizer (spherical k-means)."""
    for _ in range(iterations):
        assigned = with_ivf_cell(embeddings, centroids, vec_col)
        rows = (
            assigned.select(
                "ivf_cell", F.posexplode(F.col(vec_col)).alias("pos", "v")
            )
            .groupBy("ivf_cell", "pos")
            .agg(F.avg("v").alias("m"))
            .groupBy("ivf_cell")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("pm")
            )
            .collect()
        )
        new = {
            int(r["ivf_cell"]): [float(x["m"]) for x in r["pm"]]
            for r in rows
        }

        def _unit(v: list[float]) -> list[float]:
            n = math.sqrt(sum(x * x for x in v)) or 1.0
            return [x / n for x in v]

        centroids = [
            (cid, _unit(new[cid])) if cid in new else (cid, cv)
            for cid, cv in centroids
        ]
    return centroids


def recall_at_k(
    approx: DataFrame, exact: DataFrame, id_col: str = "vec_id"
) -> float:
    """recall@k of an approximate top-k result against the exact one:
    |approx ids ∩ exact ids| / |exact ids|. Driver-side over two k-row
    results — the standard ANN quality metric."""
    exact_ids = {r[id_col] for r in exact.select(id_col).collect()}
    if not exact_ids:
        return 1.0
    approx_ids = {r[id_col] for r in approx.select(id_col).collect()}
    return len(approx_ids & exact_ids) / len(exact_ids)


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
    lloyd_iters: int = 0,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF-Flat approximate top-k: probe only the n_probe inverted lists
    whose centroids are most cosine-similar to the query. With the
    assignment written as a partition column (write_ann_index's pattern),
    the probe set becomes partition pruning; here it is a pushed-down IN
    filter over the map-computed cell id. Driver-side centroid ranking
    uses the same left-fold dot/sqrt arithmetic as the engine, so the
    probe set is reproducible. lloyd_iters > 0 refines the seed quantizer
    with that many spherical-k-means iterations (better-balanced cells,
    higher recall at the same n_probe; see tests/test_ann_recall.py for
    the measured effect). The default 0 keeps the index bit-reproducible
    independent of float-summation order. Pass `centroids` (from
    ivf_seed_centroids / ivf_lloyd_iterate) to reuse a quantizer across
    many queries — building it is query-independent work, the
    index-once/query-many contract (n_centroids/lloyd_iters are then
    ignored)."""
    cents = centroids
    if cents is None:
        cents = ivf_seed_centroids(embeddings, n_centroids, id_col, vec_col)
        if lloyd_iters:
            cents = ivf_lloyd_iterate(
                embeddings, cents, lloyd_iters, vec_col
            )

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
    but the bucket probe list prunes PARTITIONS of the written table.
    A query whose dimensionality differs from the stored vectors fails
    loud here — zip_with over unequal arrays would otherwise yield NULL
    dot products and a silently-garbage top-k."""
    idx = spark.read.parquet(index_path)
    first = idx.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is not None and first["d"] != len(query_vec):
        raise ValueError(
            f"query vector has dim {len(query_vec)} but index "
            f"{index_path} stores dim {first['d']} vectors"
        )
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
        idx.where(F.col("lsh_bucket").isin(probes))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def write_ivf_index(
    embeddings: DataFrame,
    path: str,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF-Flat index — the index-once/query-many analogue
    of write_ann_index for the coarse-quantizer path: the embedding table
    WRITTEN partitioned by ivf_cell, so ann_topk_ivf_indexed probes the
    n_probe most-similar inverted lists via PARTITION PRUNING
    (directory-level skip) instead of recomputing the full-table cell
    assignment per query. At 100 TB that is the difference between
    O(probed cells / n_centroids of the data) and O(all data) per query.

    The quantizer (centroids from ivf_seed_centroids /
    ivf_lloyd_iterate) is persisted ALONGSIDE the data as a tiny parquet
    table under <path>/_quantizer — an underscore directory, so table
    reads skip it, and it travels with the index on any Hadoop-compatible
    filesystem (no driver-local file I/O). Repartitioning by cell keeps
    one writer per cell partition — no small-file explosion."""
    spark = embeddings.sparkSession
    b = with_ivf_cell(embeddings, centroids, vec_col)
    (
        b.repartition("ivf_cell")
        .write.mode("overwrite")
        .partitionBy("ivf_cell")
        .parquet(path)
    )
    q = spark.createDataFrame(
        [(int(cid), [float(x) for x in cv]) for cid, cv in centroids],
        "cid int, cvec array<double>",
    )
    q.coalesce(1).write.mode("overwrite").parquet(f"{path}/_quantizer")


def load_ivf_quantizer(spark, path: str) -> list[tuple[int, list[float]]]:
    """Read back the persisted quantizer (sorted by centroid id —
    deterministic regardless of file layout)."""
    rows = spark.read.parquet(f"{path}/_quantizer").orderBy("cid").collect()
    return [(int(r["cid"]), [float(x) for x in r["cvec"]]) for r in rows]


def ann_topk_ivf_indexed(
    spark,
    index_path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query the materialized IVF index: identical semantics to
    ann_topk_ivf with a prebuilt quantizer, but the probe set prunes
    PARTITIONS of the written table (asserted in
    tests/test_similarity.py) — no per-query assignment scan. Centroid
    ranking reuses the same driver-side cosine as ann_topk_ivf so the
    probe set is identical. Dimension mismatches fail loud, same
    contract as ann_topk_lsh_indexed."""
    cents = load_ivf_quantizer(spark, index_path)
    if cents and len(cents[0][1]) != len(query_vec):
        raise ValueError(
            f"query vector has dim {len(query_vec)} but index "
            f"{index_path} stores dim {len(cents[0][1])} vectors"
        )

    def _cos(a: list[float], b: list[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    ranked = sorted(cents, key=lambda c: (-_cos(c[1], query_vec), c[0]))
    probes = [cid for cid, _ in ranked[:n_probe]]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    idx = spark.read.parquet(index_path)
    return (
        idx.where(F.col("ivf_cell").isin(probes))
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
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket self-join (only
    same-bucket vectors meet) + exact cosine verify. The scale path for
    embedding dedup of a 100 TB corpus; brute force would be O(n^2).

    max_bucket bounds the worst case the same way lsh_candidate_pairs
    does for MinHash (functions/text.py): with only 2^n_planes buckets an
    angularly clustered corpus can drop a large fraction of all vectors
    into ONE bucket, making the same-bucket self-join O(n^2) inside a
    single key. Buckets above the cap are excluded from candidate
    generation (count them via lsh_bucket_sizes below — at cluster scale,
    re-run the oversized buckets with more planes rather than eating a
    quadratic join). Default None = exhaustive (the cap is OPT-IN, like
    minhash_dedup_pairs' — a silent default cap would drop near-dups of
    hot buckets with no signal to the caller); production jobs at corpus
    scale should pass a cap and watch lsh_bucket_sizes."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    b = with_lsh_bucket(embeddings, dim, n_planes, vec_col).select(
        F.col(id_col), F.col(vec_col), "lsh_bucket"
    )
    if max_bucket is not None:
        sizes = b.groupBy("lsh_bucket").agg(
            F.count(F.lit(1)).alias("_bucket_n")
        )
        b = b.join(
            sizes.where(F.col("_bucket_n") <= max_bucket), "lsh_bucket"
        ).drop("_bucket_n")
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
