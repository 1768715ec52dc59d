"""Embedding similarity operators over the driver's `embeddings` table
(vec_id bigint, embedding array<float>, label int) — the ANN layer of a
training-data pipeline (near-dup removal + similarity search).

Pairing rule as in textops.py: every operator is a (Spark builder,
DuckDB oracle SQL) pair computing identical results.  The pixel-side
mandate applies here too (BASELINE.json.input_hint: batched NumPy inside
pandas/Arrow UDFs, no per-row Python): all scoring is NumPy GEMM over
Arrow batches.  GEMM accumulates doubles in a different order than the
oracle's sequential fold, so floats are never value-compared: every
cross-engine-compared column is an integer (ids, ranks), and decision
thresholds (COS_TAU) are chosen >= 6e-4 away from any data value so a
~1e-14 summation-order wobble cannot flip a row.

Scale shapes (10^12 rows):

* `cosine_near_dup` — EXACT all-pairs via block-GEMM: vectors are
  bucketed into fixed-size blocks, the (upper-triangle) block-pair grid
  becomes the shuffle key, and each (bi, bj) group multiplies two
  ~(B x dim) matrices in one `applyInPandas`.  O(n^2/B^2) evenly-sized
  tasks, no hot keys; B tunes task granularity vs replication (each
  vector ships to n/B block-pairs).
* `ann_topk_brute` — broadcast the query matrix; each corpus Arrow
  batch emits only its per-batch top-K per query (mapInPandas), and one
  final window over (n_batches x Q x K) rows finishes the exact top-K.
  The corpus never shuffles.
* `ann_lsh` — the sublinear path: random-hyperplane bucketing (one
  GEMM against a constant plane matrix, map-only), hamming-1 multiprobe
  on the query side, bucket equi-join, exact rescoring of candidates
  only.  An IVF variant would swap `_bucket` for k-means assignment.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

DIM = 64

COS_TAU = 0.46  # near-dup threshold; >= 6e-4 from any sf0.01 pair value
BLOCK = 1024  # block-GEMM block size (rows per block)

TOPK = 10
QUERY_MOD = 50  # queries = vec_id % QUERY_MOD == 0

# deterministic integer hyperplanes (LCG), identical formula in SQL
N_PLANES = 8
LSH_TOPK = 5


def _planes() -> np.ndarray:
    p = np.arange(N_PLANES)[:, None]
    d = np.arange(DIM)[None, :]
    return (((1103515245 * (p * DIM + d + 1) + 12345) % 2001) - 1000).astype(np.float64)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _mat(col: pd.Series) -> np.ndarray:
    """pandas Series of float lists -> (n, DIM) float64 matrix."""
    return np.array([np.asarray(v, dtype=np.float64) for v in col], dtype=np.float64)


_SQL_DOT = (
    "list_sum(list_transform(range(1, len({a}) + 1),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _sql_dot(a: str, b: str) -> str:
    return _SQL_DOT.format(a=a, b=b)


# ---------------------------------------------------------------------------
# V1 — embedding-cosine near-duplicate pairs (exact, block-GEMM)
# ---------------------------------------------------------------------------


def cosine_near_dup(spark: SparkSession, sf_dir: str, block: int = BLOCK) -> DataFrame:
    """All pairs with cosine >= COS_TAU, exactly, via the block-GEMM
    shape described in the module header."""
    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    e = e.withColumn("blk", (F.col("vec_id") / block).cast("int"))
    n_blocks = e.agg(F.max("blk")).collect()[0][0] + 1

    grid = [(bi, bj) for bi in range(n_blocks) for bj in range(bi, n_blocks)]
    pairs = spark.createDataFrame(grid, "bi int, bj int")

    left = e.join(F.broadcast(pairs), F.col("blk") == F.col("bi")).select(
        "bi", "bj", F.lit(0).alias("side"), "vec_id", "embedding"
    )
    right = e.join(F.broadcast(pairs), F.col("blk") == F.col("bj")).select(
        "bi", "bj", F.lit(1).alias("side"), "vec_id", "embedding"
    )
    both = left.unionAll(right)

    out_schema = StructType(
        [StructField("a_id", LongType()), StructField("b_id", LongType())]
    )

    def score(key, pdf: pd.DataFrame):
        bi, bj = key
        la = pdf[pdf["side"] == 0]
        lb = pdf[pdf["side"] == 1] if bi != bj else la
        if len(la) == 0 or len(lb) == 0:
            return pd.DataFrame({"a_id": [], "b_id": []}).astype({"a_id": "int64", "b_id": "int64"})
        A = _mat(la["embedding"])
        B = _mat(lb["embedding"])
        An = A / np.linalg.norm(A, axis=1, keepdims=True)
        Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
        cos = An @ Bn.T
        ia, ib = np.nonzero(cos >= COS_TAU)
        a_ids = la["vec_id"].to_numpy()[ia]
        b_ids = lb["vec_id"].to_numpy()[ib]
        keep = a_ids < b_ids  # dedupe diagonal block + orient pairs
        return pd.DataFrame({"a_id": a_ids[keep], "b_id": b_ids[keep]})

    return (
        both.groupBy("bi", "bj")
        .applyInPandas(score, schema=out_schema)
        .repartition(1).sortWithinPartitions("a_id", "b_id")
    )


def cosine_near_dup_sql() -> str:
    dot = _sql_dot("a.embedding", "b.embedding")
    na = _sql_dot("a.embedding", "a.embedding")
    nb = _sql_dot("b.embedding", "b.embedding")
    return f"""
SELECT a.vec_id AS a_id, b.vec_id AS b_id
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {dot} / sqrt(({na}) * ({nb})) >= {COS_TAU}
ORDER BY a_id, b_id
"""


# ---------------------------------------------------------------------------
# V2 — brute-force cosine top-k (the exact ANN baseline)
# ---------------------------------------------------------------------------


def _scored_candidates(
    e: DataFrame, q_ids: np.ndarray, Qn: np.ndarray, k: int
) -> DataFrame:
    """mapInPandas: per Arrow batch, GEMM against the (broadcast) query
    matrix and emit only the per-batch top-k per query."""
    schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("vec_id", LongType()),
            StructField("cos", DoubleType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = _mat(pdf["embedding"])
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            cos = Qn @ Mn.T  # (Q, batch)
            ids = pdf["vec_id"].to_numpy()
            kk = min(k + 1, cos.shape[1])  # +1: self may be in batch
            top = np.argpartition(-cos, kk - 1, axis=1)[:, :kk]
            rows_q = np.repeat(q_ids, kk)
            rows_v = ids[top.ravel()]
            rows_c = np.take_along_axis(cos, top, axis=1).ravel()
            keep = rows_q != rows_v  # exclude self
            yield pd.DataFrame(
                {"query_id": rows_q[keep], "vec_id": rows_v[keep], "cos": rows_c[keep]}
            )

    return e.mapInPandas(gen, schema=schema)


def ann_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-K cosine neighbors for the query subset (vec_id %
    QUERY_MOD == 0), self excluded; ties broken by vec_id."""
    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    qpd = e.where(F.col("vec_id") % QUERY_MOD == 0).toPandas()
    q_ids = qpd["vec_id"].to_numpy()
    Q = _mat(qpd["embedding"])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    scored = _scored_candidates(e, q_ids, Qn, TOPK)
    win = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= TOPK)
        .select("query_id", "rank", "vec_id")
        .repartition(1).sortWithinPartitions("query_id", "rank")
    )


def ann_topk_brute_sql() -> str:
    dot = _sql_dot("q.embedding", "e.embedding")
    nq = _sql_dot("q.embedding", "q.embedding")
    ne = _sql_dot("e.embedding", "e.embedding")
    return f"""
SELECT query_id, rank, vec_id FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY {dot} / sqrt(({nq}) * ({ne})) DESC, e.vec_id ASC) AS rank
  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
  WHERE q.vec_id % {QUERY_MOD} = 0)
WHERE rank <= {TOPK} ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# V3 — LSH-bucketed ANN (the sublinear scale path)
# ---------------------------------------------------------------------------


def _with_bucket(e: DataFrame) -> DataFrame:
    """Map-only: hyperplane sign bucket per vector (one small GEMM per
    Arrow batch against the constant plane matrix)."""
    planes = _planes()
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", e.schema["embedding"].dataType),
            StructField("bucket", IntegerType()),
        ]
    )

    def gen(batches):
        weights = 1 << np.arange(N_PLANES)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = _mat(pdf["embedding"])
            bits = (M @ planes.T) > 0  # (n, P)
            pdf = pdf[["vec_id", "embedding"]].copy()
            pdf["bucket"] = (bits * weights).sum(axis=1).astype(np.int32)
            yield pdf

    return e.mapInPandas(gen, schema=schema)


def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-K: bucket corpus once, queries probe their bucket
    + all hamming-1 buckets, exact cosine rescoring of candidates only."""
    e = _with_bucket(_emb(spark, sf_dir).select("vec_id", "embedding"))
    q = e.where(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("eq"),
        F.col("bucket").alias("qb"),
    )
    probes = q.select(
        "query_id",
        "eq",
        F.explode(
            F.array_union(
                F.array(F.col("qb")),
                F.array(*[F.col("qb").bitwiseXOR(F.lit(1 << p)) for p in range(N_PLANES)]),
            )
        ).alias("bucket"),
    )
    cand = (
        e.join(F.broadcast(probes), "bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "eq", "embedding")
    )

    schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("vec_id", LongType()),
            StructField("cos", DoubleType()),
        ]
    )

    def rescore(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = _mat(pdf["eq"])
            B = _mat(pdf["embedding"])
            cos = np.einsum("ij,ij->i", A, B) / (
                np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
            )
            yield pd.DataFrame(
                {"query_id": pdf["query_id"], "vec_id": pdf["vec_id"], "cos": cos}
            )

    scored = cand.mapInPandas(rescore, schema=schema)
    win = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= LSH_TOPK)
        .select("query_id", "rank", "vec_id")
        .repartition(1).sortWithinPartitions("query_id", "rank")
    )


def ann_lsh_sql() -> str:
    planes = _planes().astype(int)
    plane_lits = ", ".join(
        "[" + ", ".join(f"{v}.0" for v in plane) + "]" for plane in planes
    )
    bucket_expr = " + ".join(
        f"(CASE WHEN {_sql_dot('embedding', f'planes[{p + 1}]')} > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(N_PLANES)
    )
    probe_exprs = ", ".join(f"xor(qb, {1 << p})" for p in range(N_PLANES))
    dot = _sql_dot("q.eq", "e.embedding")
    return f"""
WITH pl AS (SELECT [{plane_lits}] AS planes),
b AS (
  SELECT vec_id, embedding, {bucket_expr} AS bucket
  FROM embeddings, pl
),
q AS (
  SELECT vec_id AS query_id, embedding AS eq, bucket AS qb
  FROM b WHERE vec_id % {QUERY_MOD} = 0
),
probes AS (
  SELECT query_id, eq, unnest(list_distinct([qb, {probe_exprs}])) AS bucket FROM q
),
scored AS (
  SELECT q.query_id, e.vec_id,
         {dot} / sqrt(({_sql_dot('q.eq', 'q.eq')}) * ({_sql_dot('e.embedding', 'e.embedding')})) AS cos
  FROM probes q JOIN b e ON e.bucket = q.bucket AND e.vec_id <> q.query_id
)
SELECT query_id, rank, vec_id FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored)
WHERE rank <= {LSH_TOPK} ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def vector_queries():
    return {
        "cosine_near_dup": cosine_near_dup,
        "ann_topk_brute": ann_topk_brute,
        "ann_lsh": ann_lsh,
    }


def vector_oracles() -> dict[str, str]:
    return {
        "cosine_near_dup": cosine_near_dup_sql(),
        "ann_topk_brute": ann_topk_brute_sql(),
        "ann_lsh": ann_lsh_sql(),
    }
