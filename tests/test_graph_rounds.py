"""Round-count pins for the O(log n) CC machinery (VERDICT r3 item 3:
"pin round counts in the census").

`connected_components_star` claims O(log n) rounds on ANY topology —
including the adversarial long chain where min-label propagation needs
diameter rounds.  These tests build worst-case chains and assert both
the LABELS and the ROUND CENSUS (graph.last_star_rounds), so a
regression that silently re-introduces diameter-bound behavior fails
here, not in a 100 TB run.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from georaster_spark.operators import graph as G


def _chain(spark, n: int):
    """Path graph 0-1-2-...-(n-1): diameter n-1, the min-label worst case."""
    edges = spark.range(n - 1).select(
        F.col("id").alias("a_id"), (F.col("id") + 1).alias("b_id")
    )
    verts = spark.range(n).select(F.col("id").alias("doc_id"))
    return edges, verts


@pytest.mark.parametrize("n", [64, 257])
def test_star_cc_chain_labels_and_log_rounds(spark, n):
    edges, verts = _chain(spark, n)
    comp = G.connected_components_star(edges, verts)
    rows = comp.collect()
    assert len(rows) == n
    assert all(r["component"] == 0 for r in rows)
    # star contraction halves component height per round pair; allow a
    # generous constant over ceil(log2 n) for the init + confirm rounds
    bound = math.ceil(math.log2(n)) + 4
    assert G.last_star_rounds <= bound, (
        f"chain of {n}: {G.last_star_rounds} rounds > log-bound {bound}"
    )


def test_star_cc_pre_contract_cuts_rounds(spark):
    n = 257
    edges, verts = _chain(spark, n)
    G.connected_components_star(edges, verts)
    plain = G.last_star_rounds
    comp = G.connected_components_star(edges, verts, pre_contract=4)
    rows = comp.collect()
    assert all(r["component"] == 0 for r in rows) and len(rows) == n
    assert G.last_star_rounds <= plain, (
        f"pre-contraction should not add rounds: {G.last_star_rounds} > {plain}"
    )
    assert G.last_star_rounds <= 4


def test_star_cc_two_components_and_isolated(spark):
    e1, _ = _chain(spark, 10)
    e2 = e1.select((F.col("a_id") + 100).alias("a_id"), (F.col("b_id") + 100).alias("b_id"))
    edges = e1.union(e2)
    verts = (
        spark.range(10)
        .select(F.col("id").alias("doc_id"))
        .union(spark.range(100, 110).select(F.col("id").alias("doc_id")))
        .union(spark.range(999, 1000).select(F.col("id").alias("doc_id")))
    )
    comp = {r["doc_id"]: r["component"] for r in
            G.connected_components_star(edges, verts).collect()}
    assert all(comp[i] == 0 for i in range(10))
    assert all(comp[i] == 100 for i in range(100, 110))
    assert comp[999] == 999  # isolated vertex keeps its own id
