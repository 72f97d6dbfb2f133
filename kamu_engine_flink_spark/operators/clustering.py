"""Distributed k-means (Lloyd) over embedding columns.

The clustering workhorse behind several pipeline operators in this
engine — IVF list building (operators/similarity.py uses a bounded
driver-side sample), SemDeDup-style semantic dedup (training_data.py
uses sign-LSH as the deterministic stand-in), and corpus curation
(cluster-then-inspect). This module is the full distributed version:
every assignment pass is a Catalyst expression over all rows; only the
k x dim centroid statistics ever reach the driver (the classic
broadcast-centroids / aggregate-partials k-means shape — mini-batch or
k-means|| init are drop-in variants at extreme scale).

Exactness design (functions/portable_hash.py philosophy): vectors are
quantized to the integer grid (round(x * scale)), and after every
update the new centroid mean is ROUNDED BACK to that grid with the
exact rational floor((2*s + c) / (2*c)) = round-half-up(s/c) — pure
integer arithmetic driver-side, and reproducible in SQL as
floor((2*s + c) / (2.0*c)) because the double division of two exact
integers can never cross the floor boundary (|true quotient - integer|
is either 0 or >= 1/(2c), dwarfing the ~1e-10 division ulp). Squared
L2 scores between grid points are exact BIGINTs, ties break on the
smaller centroid id, and the whole fit is bit-reproducible in any
engine: the DuckDB oracle replays the full two-round fit as SQL CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _quantize(vec_col: str, scale: int):
    return F.expr(
        f"transform({vec_col}, x -> cast(round(cast(x as double) * {scale}d, 0) as bigint))"
    )


def _assign_expr(cents: list[tuple[int, list[int]]]):
    """Column: id of the nearest (exact squared-L2, smaller-id ties)
    grid centroid for the quantized vector column `__qe`. Centroids are
    embedded as literals — k x dim integers, the broadcast-variable
    pattern without a join (they are driver-known between rounds)."""
    entries = []
    for cid, m in cents:
        m_lit = "array(" + ", ".join(f"{x}L" for x in m) + ")"
        d2 = (
            f"aggregate(zip_with(__qe, {m_lit}, (x, y) -> (x - y) * (x - y)), "
            f"0L, (a, v) -> a + v)"
        )
        entries.append(f"struct({d2} as score, {cid}L as cid)")
    return F.expr(f"array_min(array({', '.join(entries)})).cid")


def kmeans_quantized(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    scale: int = 1000,
) -> DataFrame:
    """Lloyd k-means on grid-quantized vectors: centroids initialize
    from the k smallest-id rows, then `iters` assignment rounds run
    with a centroid update (mean, rounded back to the grid) between
    consecutive rounds — iters=2 means assign(init) -> update ->
    assign -> output. Returns (id, cluster) where cluster is the
    INITIAL seed id of the centroid (stable label). Clusters that lose
    all members drop out deterministically.

    Scale: each round is one full-table Catalyst expression pass
    (centroids inlined as literals — no join, no shuffle) plus one
    posexplode + (cluster, dim) integer-sum aggregate whose k x dim
    result is collected to the driver."""
    if k < 1 or iters < 1:
        raise ValueError("kmeans_quantized: k and iters must be >= 1")
    q = df.select(
        F.col(id_col).alias("__id"), _quantize(vec_col, scale).alias("__qe")
    ).persist()

    init = q.orderBy("__id").limit(k).select("__id", "__qe").collect()
    cents = [(r["__id"], list(r["__qe"])) for r in init]

    assign = None
    for rnd in range(iters):
        assign = q.select("__id", "__qe", _assign_expr(cents).alias("cluster"))
        if rnd == iters - 1:
            break
        sums = (
            assign.select("cluster", F.posexplode("__qe").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cid: dict[int, dict] = {}
        for r in sums:
            e = by_cid.setdefault(r.cluster, {"s": {}, "n": r.n})
            e["s"][r.pos] = r.s
        # Exact rational round-half-up(s/n) back onto the integer grid;
        # Python's // floors, matching SQL floor((2*s + n) / (2.0*n)).
        cents = [
            (
                cid,
                [(2 * e["s"][i] + e["n"]) // (2 * e["n"]) for i in range(len(e["s"]))],
            )
            for cid, e in sorted(by_cid.items())
        ]
    return assign.select(
        F.col("__id").alias(id_col), F.col("cluster").cast("long").alias("cluster")
    )
