"""Similarity search over embedding columns (``array<float>``).

Two tiers, per the standard ANN playbook:

- **brute-force cosine top-k** — the exactness baseline: one map pass
  computing cosine per row + a ``row_number`` top-k.  At 100 TB this
  is a full scan but embarrassingly parallel; still the right tool for
  one-off queries and for verifying the approximate path.
- **IVF (inverted-file) top-k** — the scale path: every vector is
  assigned to its nearest centroid (one broadcast join at write time,
  stored as a partition column), queries probe only the ``nprobe``
  nearest cells — scanning ``nprobe/ncells`` of the data.

All arithmetic is sequential-order double math over the vector
elements (``zip_with`` + ``aggregate``) so results are bit-identical
to any engine that sums in index order; similarities surface
rounded(6).

Centroid choice here is deterministic seeding (first ``k`` vectors);
production systems drop in k-means centroids — the query plumbing is
identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _lit_vec(vals: list[float]) -> Column:
    return F.array(*[F.lit(float(v)).cast("double") for v in vals])


def dot_col(a: Column, b: Column) -> Column:
    """Sequential-order dot product (index order, double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_sim_col(vec: Column, query: list[float]) -> Column:
    """Cosine similarity of a vector column against a literal query."""
    v = _as_double(vec)
    q = _lit_vec(query)
    return dot_col(v, q) / (norm_col(v) * norm_col(q))


def sqdist_col(a: Column, b: Column) -> Column:
    """Squared euclidean distance, sequential order (no sqrt — it's
    only ever compared, and dropping it keeps cross-engine argmins
    bit-stable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    df: DataFrame, vec_col: str, id_col: str, query: list[float], k: int = 10
) -> DataFrame:
    """Brute-force cosine top-k: ``(id, round(sim,6))`` for the k most
    similar vectors.  Deterministic tiebreak: (-sim, id)."""
    sim = cosine_sim_col(F.col(vec_col), query)
    scored = df.select(F.col(id_col).alias("id"), F.round(sim, 6).alias("sim"))
    w = Window.orderBy(F.col("sim").desc(), F.col("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "sim", F.col("rank").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------


def seed_centroids(
    df: DataFrame, vec_col: str, id_col: str, ncells: int = 8
) -> list[tuple[int, list[float]]]:
    """Deterministic centroid seeding: the ``ncells`` lowest-id
    vectors.  (Swap-in point for k-means.)  Driver-side by design —
    centroids are tiny metadata, like the fact catalog."""
    rows = df.select(id_col, vec_col).orderBy(id_col).limit(ncells).collect()
    return [(i, list(r[vec_col])) for i, r in enumerate(rows)]


def ivf_assign(
    df: DataFrame,
    vec_col: str,
    centroids: list[tuple[int, list[float]]],
) -> DataFrame:
    """Assign every vector to its nearest centroid (cell).

    Pure expression over a literal centroid table — no join, no
    shuffle; at write time the ``cell`` column becomes the partition
    key of the vector store.
    """
    v = _as_double(F.col(vec_col))
    scored = F.array(
        *[
            F.struct(sqdist_col(v, _lit_vec(c)).alias("d"), F.lit(cid).alias("cell"))
            for cid, c in centroids
        ]
    )
    # array_min on (dist, cell) structs = argmin with cell-id tiebreak
    return df.withColumn("cell", F.array_min(scored)["cell"])


def probe_cells(
    centroids: list[tuple[int, list[float]]], query: list[float], nprobe: int
) -> list[int]:
    """The nprobe nearest cells to the query (driver-side: ncells is
    metadata-sized)."""

    def d2(c):
        return sum((x - y) * (x - y) for x, y in zip(c, query))

    return [cid for cid, _ in sorted(centroids, key=lambda t: (d2(t[1]), t[0]))[:nprobe]]


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    ncells: int = 8,
    nprobe: int = 2,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: restrict the brute-force scan to the
    ``nprobe`` cells nearest the query.  With the cell as a partition
    column, the non-probed cells are pruned at the file level — the
    scan touches ``nprobe/ncells`` of the store."""
    cents = centroids or seed_centroids(df, vec_col, id_col, ncells)
    cells = probe_cells(cents, query, nprobe)
    assigned = ivf_assign(df, vec_col, cents)
    pool = assigned.filter(F.col("cell").isin(cells))
    return cosine_topk(pool, vec_col, id_col, query, k)


def embedding_dup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    bucket_col: str,
    threshold: float = 0.99,
) -> DataFrame:
    """Embedding near-dup: pairs with cosine ≥ threshold, compared only
    within ``bucket_col`` groups (the blocking key — an LSH band, an
    IVF cell, or any cheap partitioner).  The bucket join keeps the
    pair space linear-ish instead of corpus²."""
    sel = df.select(
        F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("v"),
        F.col(bucket_col).alias("bk"),
    )
    a, b = sel.alias("a"), sel.alias("b")
    cos = dot_col(F.col("a.v"), F.col("b.v")) / (
        norm_col(F.col("a.v")) * norm_col(F.col("b.v"))
    )
    return (
        a.join(b, (F.col("a.bk") == F.col("b.bk")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
