"""Similarity search over embedding columns (array<float>).

Extension surface (north star): brute-force cosine top-k as the exact
baseline, and an LSH-bucketed (random hyperplane / sign-LSH) variant as
the 100 TB scale path. Vector math is expressed with F.zip_with /
F.aggregate — JVM-side, no Python in the loop. Accumulation is cast to
double before summing so results are engine-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dvec(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    """Dot product of two array columns (double accumulation)."""
    return F.aggregate(
        F.zip_with(_dvec(a), _dvec(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a) -> Column:
    return F.sqrt(
        F.aggregate(_dvec(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    probe: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors of a single probe vector.

    probe: 1-row frame with (id_col, vec_col). Cross-joined as broadcast —
    a map-only pass over the corpus followed by TakeOrderedAndProject;
    at 100 TB this is the embarrassingly-parallel exact scan.
    """
    p = F.broadcast(
        probe.select(
            F.col(id_col).alias("__probe_id"), F.col(vec_col).alias("__probe_vec")
        )
    )
    scored = df.crossJoin(p)
    if exclude_self:
        scored = scored.where(F.col(id_col) != F.col("__probe_id"))
    return (
        scored.select(
            F.col(id_col),
            F.round(cosine(vec_col, "__probe_vec"), 6).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def hyperplane_lsh_bucket(vec_col, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit b = sign(v · plane_b). ``planes`` is a small
    driver-side list of random hyperplanes (deterministic seed upstream).
    Candidate search restricts cosine scoring to the probe's bucket
    (± multi-probe neighbors), turning the all-pairs scan into a
    bucket-equi-join — the scale path for ANN."""
    bucket = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        pl = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket.bitwiseOR(
            F.when(
                dot(vec_col, pl) >= 0, F.shiftleft(F.lit(1).cast("long"), b)
            ).otherwise(F.lit(0).cast("long"))
        )
    return bucket


def ivf_topk(
    df: DataFrame,
    probe: DataFrame,
    id_col: str,
    vec_col: str,
    n_clusters: int = 16,
    n_probe: int = 2,
    k: int = 10,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means-partition the corpus, search only
    the ``n_probe`` clusters nearest to the probe vector.

    Index build = one Spark ML KMeans fit (sampled at cluster scale) +
    a cluster-id column on the corpus — amortized across queries; each
    query scans ~n_probe/n_clusters of the data. Recall grows with
    n_probe; n_probe == n_clusters degenerates to exact search.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus = df.withColumn("__v", array_to_vector(_dvec(vec_col)))
    km = KMeans(k=n_clusters, seed=seed, featuresCol="__v", predictionCol="__c")
    model = km.fit(corpus)
    assigned = model.transform(corpus).drop("__v")

    # rank clusters by distance to the probe vector (driver-side: there
    # are n_clusters centers, a codelist-sized structure)
    import math

    pvec = [
        float(x)
        for x in probe.select(vec_col).limit(1).collect()[0][0]
    ]
    dists = [
        (ci, math.dist(pvec, list(c)))
        for ci, c in enumerate(model.clusterCenters())
    ]
    nearest = [ci for ci, _ in sorted(dists, key=lambda t: t[1])[:n_probe]]

    p = F.broadcast(
        probe.select(
            F.col(id_col).alias("__probe_id"), F.col(vec_col).alias("__probe_vec")
        )
    )
    cand = assigned.where(F.col("__c").isin(nearest)).crossJoin(p).where(
        F.col(id_col) != F.col("__probe_id")
    )
    return (
        cand.select(
            F.col(id_col),
            F.round(cosine(vec_col, "__probe_vec"), 6).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def bucketed_topk(
    df: DataFrame,
    probe: DataFrame,
    id_col: str,
    vec_col: str,
    planes: list[list[float]],
    k: int = 10,
) -> DataFrame:
    """ANN top-k: score only vectors in the probe's LSH bucket. Recall
    depends on bucket bits / multi-probing; exactness is traded for a
    ~2^bits candidate reduction."""
    with_b = df.withColumn("__bucket", hyperplane_lsh_bucket(vec_col, planes))
    p = probe.select(
        F.col(id_col).alias("__probe_id"),
        F.col(vec_col).alias("__probe_vec"),
        hyperplane_lsh_bucket(vec_col, planes).alias("__bucket"),
    )
    cand = with_b.join(F.broadcast(p), "__bucket").where(
        F.col(id_col) != F.col("__probe_id")
    )
    return (
        cand.select(
            F.col(id_col),
            F.round(cosine(vec_col, "__probe_vec"), 6).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )
