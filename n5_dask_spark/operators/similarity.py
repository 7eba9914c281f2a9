"""Similarity search over ``embeddings`` (driver-mandated; no reference
counterpart — SURVEY.md §2.B).

- knn_bruteforce_cosine: exact top-k neighbors for a query set, cosine via
  built-in higher-order array functions (zip_with + aggregate — stays
  JVM-side, no Python in the hot path).
- knn_signbucket_lsh:    sign-LSH over the first 8 dimensions (axis-aligned
  hyperplanes): candidates restricted to the query's bucket. Deterministic,
  hence fully oracle-checkable. The production variant with md5-seeded
  pseudo-random hyperplanes is `random_hyperplane_lsh` below (same plan
  shape, used by tests, not oracle-gated).
- embedding_near_duplicates: all pairs with cosine >= threshold — the
  embedding-cosine near-dup detector for the dedup family.

Determinism: cosine values are rounded to 6 decimals BEFORE ranking, and
ranking carries vec_id tiebreakers, so last-ulp float differences between
engines cannot reorder results.

Scale notes (100 TB / billions of vectors):
- Brute-force is O(Q x N) per query batch: fine for small Q (the query set
  is broadcast), unusable for all-pairs — that is what the LSH bucket join
  fixes: shuffle keys are bucket ids, candidates only within buckets.
- At scale the bucket table would be written bucketed-by(bucket) so repeated
  queries co-locate without reshuffling; IVF (k-means cells) drops in with
  the same join shape (cell id instead of sign bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from n5_dask_spark.catalog import load_tables, widen
from n5_dask_spark.registry import register

N_QUERIES = 5  # query vectors = vec_id < 5
TOP_K = 10

# Cosine similarity between two float arrays using built-in higher-order
# functions — executes in the JVM, no UDF. (a.b) / (|a| |b|), with a
# DEFINED zero-vector convention: cosine(0-vector, anything) = 0.0 on
# BOTH engines. Without the guard a single zero-norm embedding (padding
# rows are legal at corpus scale) crashes the whole Spark job — ANSI mode
# throws DIVIDE_BY_ZERO for double division too — while DuckDB's bare
# list_cosine_similarity returns a nonsense -1.0 artifact. try_divide
# evaluates dot and norms exactly once (no CASE re-evaluation) and is
# bit-identical to plain division whenever the denominator is nonzero.
# A NULL array propagates NULL (the outer if) rather than being folded to
# 0.0 by the coalesce — DuckDB's CASE falls through to
# list_cosine_similarity(NULL, ...) = NULL there, and NULL-in-NULL-out is
# the SQL-natural reading; downstream cosine DESC rankings agree because
# both engines place NULLS LAST on DESC.
COSINE = """
    if({a} IS NULL OR {b} IS NULL, CAST(NULL AS DOUBLE),
    coalesce(try_divide(
      aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                CAST(0.0 AS DOUBLE), (acc, v) -> acc + v),
      sqrt(aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                     CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))
      * sqrt(aggregate(transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                       CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))),
    CAST(0.0 AS DOUBLE)))
"""


def cosine_col(a: str, b: str) -> Column:
    return F.expr(COSINE.format(a=a, b=b))


# r14 optimization (guide §1.2 per-task work): the inline COSINE recomputes
# BOTH vector norms for every pair — in an O(n²) pair expansion that is
# 2/3 of the arithmetic, re-derived n times per vector. These helpers
# split the norm out as a per-ROW column (computed once per vector before
# the pair join) and divide the per-pair dot product by the precomputed
# product. BIT-IDENTICAL to COSINE by construction: NORM_SQL is textually
# the same sqrt(aggregate(...)) subtree the inline form evaluates, the
# same doubles flow into the same try_divide, and the NULL-array /
# zero-vector conventions are unchanged (outer if; try_divide + coalesce).
# Pinned by tests/test_oracle_parity.py::test_cosine_prenorm_bit_identity.
NORM_SQL = (
    "sqrt(aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
    " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
)

COSINE_PRENORM = """
    if({a} IS NULL OR {b} IS NULL, CAST(NULL AS DOUBLE),
    coalesce(try_divide(
      aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                CAST(0.0 AS DOUBLE), (acc, v) -> acc + v),
      {na} * {nb}),
    CAST(0.0 AS DOUBLE)))
"""


def norm_col(a: str) -> Column:
    """Per-row L2 norm, same expression subtree as COSINE's denominators."""
    return F.expr(NORM_SQL.format(a=a))


def cosine_prenorm_col(a: str, b: str, na: str, nb: str) -> Column:
    """Pairwise cosine with the norms read from precomputed columns."""
    return F.expr(COSINE_PRENORM.format(a=a, b=b, na=na, nb=nb))


# DuckDB: list_cosine_similarity computes in double over FLOAT[] the same
# dot/norm formula; both sides round to 6dp so ulp ordering can't differ.
# The CASE pins the same cosine = 0.0 zero-vector convention as the Spark
# side (bare list_cosine_similarity yields -1.0 for a zero vector).
DUCK_COSINE = """CASE WHEN list_dot_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[]))
         * list_dot_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[])) = 0
    THEN 0.0
    ELSE list_cosine_similarity(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[])) END"""


@register(
    "knn_bruteforce_cosine",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES}),
         scored AS (
           SELECT q.qid, e.vec_id,
                  ROUND({DUCK_COSINE.format(a='q.qe', b='e.embedding')}, 6) + 0.0 AS cosine
           FROM q CROSS JOIN embeddings e
           WHERE e.vec_id <> q.qid
         ), ranked AS (
           SELECT qid, vec_id, cosine,
                  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
           FROM scored
         )
    SELECT qid, CAST(rn AS BIGINT) AS rn, vec_id, cosine
    FROM ranked WHERE rn <= {TOP_K}
    ORDER BY qid, rn
    """,
    doc="Exact brute-force cosine top-k for a broadcast query set.",
)
def knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("embeddings",))
    # narrow local scans fan out so the per-row cosine parallelizes;
    # norms precomputed once per vector (r14) — the pair loop pays only
    # the dot product
    emb = widen(t["embeddings"]).select(
        "vec_id", "embedding", norm_col("embedding").alias("nrm")
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(cosine_prenorm_col("qe", "embedding", "qn", "nrm"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= TOP_K)
        .select("qid", "rn", "vec_id", "cosine")
        .orderBy("qid", "rn")
    )


# Sign bucket over first 8 dims: bit d set iff embedding[d] > 0.
# try_element_at (1-based, NULL out of bounds): a vector shorter than 8
# dims contributes 0 for its missing bits — exactly DuckDB's NULL
# subscript falling to ELSE 0 — instead of an ANSI ArrayIndexOutOfBounds
# killing the whole job (embeddings-sweep find, dim-3 corpus).
SPARK_BUCKET = (
    "aggregate(sequence(1, 8), 0, (acc, d) ->"
    " acc + CASE WHEN try_element_at(embedding, d) > 0"
    " THEN CAST(round(pow(2, d - 1)) AS INT) ELSE 0 END)"
)
DUCK_BUCKET = (
    "list_sum(list_transform(range(1, 9), d ->"
    " CASE WHEN embedding[d] > 0 THEN CAST(round(pow(2, d - 1)) AS INT) ELSE 0 END))"
)


@register(
    "knn_signbucket_lsh",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, CAST({DUCK_BUCKET} AS INT) AS bucket FROM embeddings
    ), q AS (SELECT vec_id AS qid, embedding AS qe, bucket AS qb FROM b WHERE vec_id < {N_QUERIES}),
       scored AS (
         SELECT q.qid, e.vec_id,
                ROUND({DUCK_COSINE.format(a='q.qe', b='e.embedding')}, 6) + 0.0 AS cosine
         FROM q JOIN b e ON e.bucket = q.qb AND e.vec_id <> q.qid
       ), ranked AS (
         SELECT qid, vec_id, cosine,
                ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
         FROM scored
       )
    SELECT qid, CAST(rn AS BIGINT) AS rn, vec_id, cosine
    FROM ranked WHERE rn <= {TOP_K}
    ORDER BY qid, rn
    """,
    doc=(
        "Bucketed ANN: sign-LSH bucket join (candidates share the query's "
        "bucket), then exact cosine rank within bucket."
    ),
)
def knn_signbucket_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("embeddings",))
    b = widen(t["embeddings"]).select(
        "vec_id",
        "embedding",
        F.expr(SPARK_BUCKET).cast("int").alias("bucket"),
        norm_col("embedding").alias("nrm"),  # once per vector (r14)
    )
    q = b.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("bucket").alias("qb"),
        F.col("nrm").alias("qn"),
    )
    scored = (
        b.join(F.broadcast(q), (F.col("bucket") == F.col("qb")) & (F.col("vec_id") != F.col("qid")))
        .select(
            "qid",
            "vec_id",
            F.round(cosine_prenorm_col("qe", "embedding", "qn", "nrm"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= TOP_K)
        .select("qid", "rn", "vec_id", "cosine")
        .orderBy("qid", "rn")
    )


@register(
    "embedding_near_duplicates",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND({DUCK_COSINE.format(a='a.embedding', b='b.embedding')}, 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE ROUND({DUCK_COSINE.format(a='a.embedding', b='b.embedding')}, 6) >= 0.45
    ORDER BY vec_a, vec_b
    """,
    doc="Embedding-cosine near-dup pairs (cosine >= 0.45).",
)
def embedding_near_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("embeddings",))
    # fan the probe side out across cores; the build side is broadcast
    # EXPLICITLY — without the hint this non-equi join silently degrades to
    # a both-sides-shuffled CartesianProduct once embeddings outgrows
    # autoBroadcastJoinThreshold (the knn queries pin the same shape).
    # Norms precomputed per vector (r14): in this O(n²) expansion the two
    # inline norms were 2/3 of the arithmetic, paid n times per vector —
    # measured 9.6 s -> see OPTIMIZATION_r14.md.
    a = widen(t["embeddings"]).select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        norm_col("embedding").alias("na"),
    )
    b = t["embeddings"].select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        norm_col("embedding").alias("nb"),
    )
    return (
        a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b", F.round(cosine_prenorm_col("ea", "eb", "na", "nb"), 6).alias("cosine")
        )
        .filter(F.col("cosine") >= 0.45)
        .orderBy("vec_a", "vec_b")
    )


def lsh_planes(n_planes: int, dim: int) -> list[list[float]]:
    """The md5-seeded plane matrix, computed once driver-side.

    plane[p][d] in [-1, 1): first 8 hex digits of md5(f"{p}|{d}") / 16^8,
    scaled — the exact value the old in-plan SQL expression
    (conv(substring(md5(concat(p,'|',d)),1,8),16,10) / 2^32 * 2 - 1)
    produced, so bucket assignments are unchanged."""
    import hashlib as _hashlib

    return [
        [
            int(_hashlib.md5(f"{p}|{d}".encode()).hexdigest()[:8], 16)
            / 4294967296.0
            * 2.0
            - 1.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def random_hyperplane_lsh(spark: SparkSession, sf_dir: str, n_planes: int = 16) -> DataFrame:
    """Production-shape LSH: md5-seeded pseudo-random hyperplanes
    (deterministic but not practically SQL-expressible), signature = sign
    bits of plane dot products. Same bucket-join plan as
    knn_signbucket_lsh; stress-driven at 5M vectors (tools/stress.py).

    The plane matrix is computed ONCE on the driver and embedded as a
    nested array literal. The previous formulation built it with an
    in-plan md5 lambda expression over constant sequences — row-invariant,
    but lambda bodies sit outside Catalyst's constant folding, so every
    ROW re-derived all n_planes x dim md5s: ~1.3 BILLION md5 calls at 5M
    vectors (found by the similarity stress leg timing out). repr() round
    trips every double exactly, so the literal is bit-identical to the
    old expression and bucket assignments are unchanged (pinned by test)."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    # derive the plane length from the data: zip_with NULL-pads a length
    # mismatch, w * NULL = NULL, and the sign bit silently reads 0 —
    # every row would land in wrong buckets with no error
    first = t["embeddings"].select(F.size("embedding").alias("d")).first()
    if first is None:
        raise ValueError("embeddings table is empty; cannot derive the LSH plane length")
    dim = int(first["d"])
    planes_lit = (
        "array("
        + ",".join(
            "array(" + ",".join(f"{v!r}D" for v in row) + ")"
            for row in lsh_planes(n_planes, dim)
        )
        + ")"
    )
    sig = F.expr(
        f"aggregate(sequence(0, {n_planes - 1}), CAST(0 AS BIGINT), (acc, p) -> acc + "
        f"CASE WHEN aggregate(zip_with({planes_lit}[p], embedding, (w, x) -> w * CAST(x AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (a, v) -> a + v) > 0"
        " THEN shiftleft(CAST(1 AS BIGINT), p) ELSE CAST(0 AS BIGINT) END)"
    )
    return t["embeddings"].select("vec_id", "embedding", sig.alias("bucket"))
