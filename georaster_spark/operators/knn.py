"""Op E6 — cell-keyed kNN join (SURVEY §2.2).

k nearest centers (e.g. zone centroids) per point.  Technique per the
filter-refine + ring-expansion family (cf. distributed stream kNN-join
literature, PAPERS.md): candidates come from an equi-join on cell keys
within a Chebyshev ring around each point's cell; exact L2 refine +
windowed top-k; a driver loop doubles the ring only for points whose
current k-th candidate cannot yet be proven global.

Termination proof: after exploring all cells within Chebyshev distance
R of the point's cell, every unexplored center is at world distance
>= R*s (s = cell edge).  So once a point holds >= k candidates with
k-th squared distance <= (R*s)^2, its top-k is final.

Determinism: candidates rank by (d2, center_id) — total order, identical
float64 arithmetic in the DuckDB oracle -> bit-for-bit reproducible
across parallelism levels (north-rule).

Scale notes: the per-round candidate join is an equi-join on cell_id; the
centers side is broadcast when dims-sized, else shuffled.  Points that
finish early leave the loop (anti-join), so ring growth touches only the
starved tail (typically isolated points).  A final brute-force fallback
covers pathological inputs (fewer centers than k in the whole domain) —
bounded because it only sees the post-loop remainder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..constants import DOMAIN
from ..functions import cells


def _topk(cand: DataFrame, k: int, id_col: str, center_id: str) -> DataFrame:
    win = Window.partitionBy(id_col).orderBy(F.col("d2").asc(), F.col(center_id).asc())
    return cand.withColumn("rank", F.row_number().over(win)).where(F.col("rank") <= k)


def knn_join(
    points: DataFrame,
    centers: DataFrame,
    k: int,
    r: int = 10,
    id_col: str = "point_id",
    x_col: str = "x",
    y_col: str = "y",
    center_id: str = "zone_id",
    cx_col: str = "cx",
    cy_col: str = "cy",
    broadcast_centers: bool = True,
    max_rounds: int = 6,
) -> DataFrame:
    """(id_col, rank, center_id, d2) — exact k nearest centers per point."""
    s = float(DOMAIN >> r)
    cen = centers.select(
        F.col(center_id),
        F.col(cx_col).alias("_cx"),
        F.col(cy_col).alias("_cy"),
        cells.cell_encode(F.col(cx_col), F.col(cy_col), r).alias("_ccell"),
    )
    if broadcast_centers:
        cen = F.broadcast(cen)

    remaining = points.select(
        F.col(id_col),
        F.col(x_col).alias("_px"),
        F.col(y_col).alias("_py"),
        cells.cell_encode(F.col(x_col), F.col(y_col), r).alias("_pcell"),
    )
    # explicit multiplies, not pow(): bit-identical to the DuckDB oracle
    d2 = (F.col("_px") - F.col("_cx")) * (F.col("_px") - F.col("_cx")) + (
        F.col("_py") - F.col("_cy")
    ) * (F.col("_py") - F.col("_cy"))

    finished = []
    radius = 1
    persisted: list[DataFrame] = []  # frontier cache handles, released as superseded
    for _ in range(max_rounds):
        ring = cells.cell_neighbors(F.col("_pcell"), r, ring=radius)
        cand = (
            remaining.withColumn("_rc", F.explode(ring))
            .join(cen, F.col("_rc") == F.col("_ccell"))
            .withColumn("d2", d2)
        )
        top = _topk(cand, k, id_col, center_id)
        # a point is DONE iff it has k candidates and the k-th is provably
        # global: d2_k <= (radius * s)^2
        stats = top.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("_cnt"), F.max("d2").alias("_dk")
        )
        done_ids = stats.where(
            (F.col("_cnt") >= k) & (F.col("_dk") <= F.lit((radius * s) ** 2))
        ).select(id_col)
        finished.append(
            top.join(F.broadcast(done_ids), id_col).select(id_col, "rank", center_id, "d2")
        )
        # materialize the shrinking frontier so each round's lineage doesn't
        # re-execute all previous rounds (driver-loop posture, SURVEY §3.2);
        # isEmpty() forces it, after which the superseded round's cache is
        # released — a long-lived session never accumulates frontier blocks.
        remaining = remaining.join(done_ids, id_col, "left_anti").persist()
        is_empty = remaining.isEmpty()
        for p in persisted:
            p.unpersist()
        persisted = [remaining]
        if is_empty:
            # common exit: swap the (empty, still-cached) frontier for a
            # trivially-empty plan so the brute fallback below costs nothing
            # and no cache blocks outlive the call.
            remaining.unpersist()
            persisted = []
            remaining = remaining.sparkSession.createDataFrame([], remaining.schema)
            break
        radius *= 2
        if radius * s >= DOMAIN:
            break
    # NOTE: on the rare non-empty exit (max_rounds / domain-radius bound) one
    # frontier stays cached because the brute fallback still reads it; it is
    # the terminal frontier only, never a per-round accumulation.

    # brute-force remainder (rare: starved corners / k > total centers)
    brute = remaining.crossJoin(cen).withColumn("d2", d2)
    finished.append(_topk(brute, k, id_col, center_id).select(id_col, "rank", center_id, "d2"))

    out = finished[0]
    for f in finished[1:]:
        out = out.unionByName(f)
    return out
