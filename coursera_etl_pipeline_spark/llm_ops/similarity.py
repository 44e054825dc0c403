"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline (oracle-checked);
the random-hyperplane LSH variant is the scale path — at 100 TB you
never enumerate all pairs, you bucket-join signatures and only score
within buckets.

Cosine is computed JVM-side (zip_with + aggregate over doubles, no
Python), sequentially over the 64 dims; the oracle mirrors the same
double-precision accumulation (see _duck_cosine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from coursera_etl_pipeline_spark.catalog import load_table
from coursera_etl_pipeline_spark.registry import query

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors in the fixture corpus
NEARDUP_COSINE = 0.42


def _duck_cosine(a: str, b: str) -> str:
    """Double-precision cosine in DuckDB SQL, accumulation order
    matching Spark's aggregate() exactly. (DuckDB's built-in
    list_cosine_similarity accumulates in float32 — NOT bit-identical,
    hence the explicit form.)"""
    def ss(x: str, y: str) -> str:
        return (f"list_sum(list_transform(range(1, len({x})+1), "
                f"i -> CAST({x}[i] AS DOUBLE) * CAST({y}[i] AS DOUBLE)))")
    return f"({ss(a, b)} / (sqrt({ss(a, a)}) * sqrt({ss(b, b)})))"


def dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        f" 0D, (acc, v) -> acc + v)")


def norm(a: str) -> Column:
    return F.sqrt(F.expr(
        f"aggregate({a}, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))"))


def cosine(a: str, b: str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


@query(
    "similarity_topk_bruteforce",
    oracle=f"""
    SELECT query_id, neighbor_id, rank, round(sim, 6) AS sim
    FROM (
      SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
             {_duck_cosine('q.embedding', 'n.embedding')} AS sim,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_duck_cosine('q.embedding', 'n.embedding')} DESC,
                        n.vec_id) AS rank
      FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ) WHERE rank <= {TOP_K}
    """,
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k per query vector: broadcast the (small) query
    set against the corpus, rank per query. The corpus side never
    shuffles — only the per-query heap does (window over query_id)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = (emb.filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")))
    n = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nv"))
    from pyspark.sql import Window as W
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        F.broadcast(q).crossJoin(n)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine("qv", "nv"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


@query(
    "similarity_neardup_pairs",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_duck_cosine('a.embedding', 'b.embedding')}, 6) AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_duck_cosine('a.embedding', 'b.embedding')} >= {NEARDUP_COSINE}
    """,
)
def similarity_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, exact, as a
    block-partitioned equi-join (see neardup_pairs_blocked)."""
    return neardup_pairs_blocked(load_table(spark, sf_dir, "embeddings"))


N_BLOCKS = 32  # B(B+1)/2 = 528 uniform work units; pick B ~ sqrt(2*cores)


def neardup_pairs_blocked(emb: DataFrame, threshold: float = NEARDUP_COSINE,
                          n_blocks: int = N_BLOCKS) -> DataFrame:
    """Exact all-pairs cosine >= threshold via block-pair equi-join.

    Why not LSH candidates here: at threshold 0.42 (theta ~ 65 deg)
    random-hyperplane banding cannot reach recall 1.0 sub-quadratically
    — p_bit = 1 - theta/pi ~ 0.64, so the ~50 four-bit bands needed for
    recall ~1 admit ~98% of ALL pairs as candidates, i.e. LSH degrades
    to brute force plus explode overhead. Exact low-threshold all-pairs
    is inherently Theta(n^2) comparisons; the scalable form distributes
    them evenly instead of pruning: split the corpus into B blocks,
    make every unordered block pair (bi <= bj) one work unit keyed by
    (bi, bj), and realize the pairing as a shuffled equi-join — no
    BroadcastNestedLoopJoin, no driver fan-out, B(B+1)/2 uniform tasks
    that a 1000-executor cluster spreads evenly. Each side is
    replicated ~B/2x into the shuffle, which is dwarfed by the n^2/2
    comparison output it feeds. At high thresholds (>= ~0.8, where
    p_band is selective) prefer the banded candidates+verify path
    (ann_topk_lsh / minhash_lsh_pairs shape) instead.
    """
    spark = emb.sparkSession
    bp = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "bi INT, bj INT")
    v = emb.select(
        "vec_id", "embedding",
        F.pmod(F.col("vec_id"), F.lit(n_blocks)).cast("int").alias("blk"))
    left = (v.join(F.broadcast(bp), F.col("blk") == F.col("bi"))
            .select(F.col("vec_id").alias("id_l"),
                    F.col("embedding").alias("vl"), "bi", "bj"))
    right = (v.join(F.broadcast(bp), F.col("blk") == F.col("bj"))
             .select(F.col("vec_id").alias("id_r"),
                     F.col("embedding").alias("vr"), "bi", "bj"))
    return (
        left.join(right, ["bi", "bj"])
        .filter((F.col("bi") < F.col("bj")) | (F.col("id_l") < F.col("id_r")))
        .withColumn("sim", cosine("vl", "vr"))
        .filter(F.col("sim") >= threshold)
        .select(F.least("id_l", "id_r").alias("vec_a"),
                F.greatest("id_l", "id_r").alias("vec_b"),
                F.round("sim", 6).alias("sim"))
    )


# --- LSH-bucketed ANN (the scale path) --------------------------------------

N_PLANES = 12
N_BANDS_ANN = 3  # three 4-bit bands: P(candidate) = 1-(1-(1-θ/π)^4)^3


def _hyperplanes(dim: int = 64) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes without an RNG: plane
    component p[i][d] = sin(1 + i * dim + d) — fixed, reproducible,
    direction-uniform enough for bucketing."""
    import math
    return [[math.sin(1 + i * dim + d) for d in range(dim)]
            for i in range(N_PLANES)]


def signatures(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Sign-bit signature per plane, banded into N_BANDS_ANN ints.
    Built-in expressions only: one zip_with dot product per plane."""
    planes = _hyperplanes()
    bits = [
        F.when(F.expr(
            f"aggregate(zip_with({vec_col}, array({', '.join(f'{x}D' for x in p)}),"
            f" (x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)") > 0, 1
        ).otherwise(0).alias(f"bit{i}")
        for i, p in enumerate(planes)
    ]
    df = emb.select("*", *bits)
    per_band = N_PLANES // N_BANDS_ANN
    bands = [
        sum(F.col(f"bit{b * per_band + j}") * (2 ** j) for j in range(per_band))
        .alias(f"band{b}")
        for b in range(N_BANDS_ANN)
    ]
    return df.select(*emb.columns, *bands)


def ann_topk_lsh(emb: DataFrame, k: int = TOP_K,
                 n_queries: int = N_QUERIES) -> DataFrame:
    """Approximate top-k: score only pairs sharing an LSH band bucket.
    At 100 TB the bucket join replaces the cross join — candidates per
    query ~ corpus/2^bits per band, tunable via N_PLANES/N_BANDS_ANN."""
    from pyspark.sql import Window as W

    from coursera_etl_pipeline_spark.llm_ops.dedup import _materialize

    sig = signatures(emb)
    # materialized: both the query side and the corpus side of the
    # bucket join read this — without it the 12 hyperplane dot products
    # per vector run twice
    banded = _materialize(sig.select(
        "vec_id", "embedding",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("bucket"))
            for b in range(N_BANDS_ANN)])).alias("bb"),
    ).select("vec_id", "embedding", "bb.band", "bb.bucket"))

    q = (banded.filter(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"),
                 "band", "bucket"))
    n = banded.select(F.col("vec_id").alias("neighbor_id"),
                      F.col("embedding").alias("nv"), "band", "bucket")
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        q.join(n, ["band", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        # score BEFORE deduplicating: a pair colliding in 2-3 bands is
        # scored that many times (cosine is cheap), but the dedup then
        # shuffles only (id, id, sim) rows — never a distinct() keyed on
        # the 64-float embedding arrays, which dominated this plan's cost
        .withColumn("sim", cosine("qv", "nv"))
        .groupBy("query_id", "neighbor_id").agg(F.min("sim").alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


def _duck_lsh_sig() -> str:
    """DuckDB replica of signatures(): band buckets from the same
    sin-derived hyperplanes. Plane i component d = sin(1 + i*64 + d),
    d 0-based; with x = d+1 the term is sin((band*4 + j)*64 + x)."""
    dot_plane = ("list_sum(list_transform(range(1, 65), x -> "
                 "CAST(embedding[x] AS DOUBLE) * sin((b.band * 4 + j) * 64 + x)))")
    return f"""
    SELECT vec_id, b.band,
           list_sum(list_transform(range(0, 4), j ->
             CASE WHEN {dot_plane} > 0 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END))
             AS bucket
    FROM embeddings, (SELECT unnest([0, 1, 2]) AS band) b
    """


@query(
    "similarity_ann_lsh",
    oracle=f"""
    WITH sig AS ({_duck_lsh_sig()}
    ), cand AS (
      SELECT DISTINCT qs.vec_id AS query_id, ns.vec_id AS neighbor_id
      FROM sig qs JOIN sig ns ON qs.band = ns.band AND qs.bucket = ns.bucket
      WHERE qs.vec_id < {N_QUERIES} AND qs.vec_id <> ns.vec_id
    )
    SELECT query_id, neighbor_id, rank, round(sim, 6) AS sim FROM (
      SELECT c.query_id, c.neighbor_id,
             {_duck_cosine('q.embedding', 'n.embedding')} AS sim,
             row_number() OVER (
               PARTITION BY c.query_id
               ORDER BY {_duck_cosine('q.embedding', 'n.embedding')} DESC,
                        c.neighbor_id) AS rank
      FROM cand c JOIN embeddings q ON q.vec_id = c.query_id
                  JOIN embeddings n ON n.vec_id = c.neighbor_id
    ) WHERE rank <= {TOP_K}
    """,
)
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH ANN top-k. Deterministic (fixed sin-derived hyperplanes), so
    despite being 'approximate' relative to exact search, its OUTPUT is
    an exact expectation — the oracle replicates bucketing + in-bucket
    ranking in SQL and the rows value-hash match."""
    return ann_topk_lsh(load_table(spark, sf_dir, "embeddings"))


@query(
    "similarity_ann_recall",
    oracle=f"""
    WITH exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_duck_cosine('q.embedding', 'n.embedding')} DESC,
                          n.vec_id) AS rank
        FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
        WHERE q.vec_id < {N_QUERIES}
      ) WHERE rank <= {TOP_K}
    ), sig AS ({_duck_lsh_sig()}
    ), cand AS (
      SELECT DISTINCT qs.vec_id AS query_id, ns.vec_id AS neighbor_id
      FROM sig qs JOIN sig ns ON qs.band = ns.band AND qs.bucket = ns.bucket
      WHERE qs.vec_id < {N_QUERIES} AND qs.vec_id <> ns.vec_id
    ), ann AS (
      SELECT query_id, neighbor_id FROM (
        SELECT c.query_id, c.neighbor_id,
               row_number() OVER (
                 PARTITION BY c.query_id
                 ORDER BY {_duck_cosine('q.embedding', 'n.embedding')} DESC,
                          c.neighbor_id) AS rank
        FROM cand c JOIN embeddings q ON q.vec_id = c.query_id
                    JOIN embeddings n ON n.vec_id = c.neighbor_id
      ) WHERE rank <= {TOP_K}
    )
    SELECT e.query_id,
           round(count(a.neighbor_id) * 1.0 / {TOP_K}, 6) AS recall
    FROM exact e LEFT JOIN ann a USING (query_id, neighbor_id)
    GROUP BY e.query_id
    """,
)
def similarity_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k of the LSH ANN against the exact brute-force top-k,
    per query vector. The hyperplanes are fixed (no RNG), so this is a
    DETERMINISTIC quality metric with an exact SQL oracle — it pins the
    (planes, bands) operating point under the value-hash gate instead
    of a rows-only count, and regresses loudly if bucketing drifts."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = similarity_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    ann = (ann_topk_lsh(emb).select("query_id", "neighbor_id")
           .withColumn("_hit", F.lit(1)))
    return (
        exact.join(ann, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.round(F.count("_hit") * 1.0 / TOP_K, 6).alias("recall"))
    )


# --- IVF (inverted-file) ANN — the centroid-probe scale path ----------------

N_CELLS = 16
N_PROBE = 3


def _cosine_lambda_sql(a: str, b: str) -> str:
    """The cosine() expression as SQL text usable inside a
    higher-order-function lambda body (same zip_with/aggregate
    accumulation order, so the doubles are bit-identical to cosine()
    and to _duck_cosine)."""
    def ss(x: str, y: str) -> str:
        return (f"aggregate(zip_with({x}, {y}, "
                f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
                f"0D, (acc, v) -> acc + v)")
    return f"({ss(a, b)} / (sqrt({ss(a, a)}) * sqrt({ss(b, b)})))"


def _collect_centroids(centroids: DataFrame) -> DataFrame:
    """The frozen centroid table as ONE broadcast row holding an
    ascending-cell_id array of (cell_id, cv) structs — the form the
    map-side assignment and probe expressions fold over.

    CONTRACT (ADVICE r18): the centroid input must be NON-EMPTY. The
    aggregate emits one row even for an empty table, so downstream
    array_max over the empty _cents array would yield NULL cell_id
    rows where the pre-r18 crossJoin(broadcast(empty)) produced zero
    rows. Unreachable with the fixed N_CELLS/PQ codebooks every caller
    uses; a filter guard would change the physical plan of all ten
    certified IVF/PQ consumers, which the r19 rotation window cannot
    absorb (window math in __spark_entry__), so the contract is pinned
    here and by test_collect_centroids_empty_contract instead."""
    return F.broadcast(centroids.agg(
        F.sort_array(F.collect_list(F.struct("cell_id", "cv")))
        .alias("_cents")))


def _scored_cells(vec_col: str) -> "Column":
    """array<struct<s, neg, cell_id>> of a row's similarity to every
    broadcast centroid: struct ordering (max s, then max neg = MIN
    cell_id) reproduces row_number() OVER (ORDER BY sim DESC, cell_id
    ASC) rank semantics as pure array expressions."""
    return F.expr(
        "transform(_cents, c -> struct("
        f"{_cosine_lambda_sql(vec_col, 'c.cv')} AS s, "
        "-c.cell_id AS neg, c.cell_id AS cell_id))")


def assign_to_centroids(emb: DataFrame, centroids: DataFrame,
                        vec_col: str = "embedding") -> DataFrame:
    """Nearest-centroid assignment against a FROZEN centroid table —
    the per-row pure function both the initial IVF build and every
    later append evaluate. Extracted from ``ivf_assign`` in round 9;
    ``ivf_index_append`` reuses it so an append is, by construction,
    the same function the rebuild would apply.

    MAP-ONLY (optimization r18, guide §2.4/§1.2): nearest-centroid is
    a pure function of (row, broadcast centroids), so it is computed
    with transform() + array_max() over a broadcast centroid ARRAY —
    zero exchange. The previous form (cross join + row_number window
    partitioned by vec_id) shuffled the ENTIRE |corpus| x n_cells
    expansion — each expansion row carrying the full embedding vector
    — just to pick each row's own maximum. Same cosine expression
    (bit-identical doubles), same tie-break (max sim, then min
    cell_id via the neg field), so the assignment is value-identical;
    every IVF consumer re-proved against its DuckDB oracle."""
    return (
        emb.crossJoin(_collect_centroids(centroids))
        .withColumn("_best", F.array_max(_scored_cells(vec_col)))
        .select("vec_id", vec_col, F.col("_best.cell_id").alias("cell_id"))
    )


def ivf_assign(emb: DataFrame, vec_col: str = "embedding",
               n_cells: int = N_CELLS) -> tuple[DataFrame, DataFrame]:
    """One-pass IVF index: the first n_cells corpus vectors (by vec_id)
    act as fixed centroids (deterministic, no iterative k-means — at
    100 TB you'd train centroids offline on a sample and broadcast
    them, exactly as here); every vector is assigned to its nearest
    centroid via a broadcast cross join + one window."""
    centroids = (emb.orderBy("vec_id").limit(n_cells)
                 .select(F.col("vec_id").alias("cell_id"),
                         F.col(vec_col).alias("cv")))
    return assign_to_centroids(emb, centroids, vec_col), centroids


def ann_topk_ivf(emb: DataFrame, k: int = TOP_K, n_queries: int = N_QUERIES,
                 n_probe: int = N_PROBE) -> DataFrame:
    """IVF search: each query scores only vectors in its n_probe
    nearest cells — corpus contact ~ n_probe/n_cells of brute force.
    The cell equi-join replaces the cross join; skewed cells are AQE's
    problem, not ours."""
    from pyspark.sql import Window as W

    assigned, centroids = ivf_assign(emb)
    queries = emb.filter(F.col("vec_id") < n_queries) \
                 .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    # top-n_probe cells per query, map-only (r18, same rewrite as
    # assign_to_centroids): ascending array_sort of (s, neg, cell)
    # reversed = ORDER BY sim DESC, cell_id ASC, then slice + explode.
    probes = (
        queries.crossJoin(_collect_centroids(centroids))
        .withColumn("_top",
                    F.slice(F.reverse(F.array_sort(_scored_cells("qv"))),
                            1, n_probe))
        .select("query_id", "qv",
                F.explode(F.col("_top.cell_id")).alias("cell_id"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        probes.join(assigned.select(F.col("vec_id").alias("neighbor_id"),
                                    F.col("embedding").alias("nv"), "cell_id"),
                    "cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine("qv", "nv"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


_DUCK_IVF_ANN = f"""
    WITH cent AS (
      SELECT vec_id AS cell_id, embedding AS cv
      FROM embeddings ORDER BY vec_id LIMIT {N_CELLS}
    ), assigned AS (
      SELECT vec_id, cell_id FROM (
        SELECT e.vec_id, c.cell_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_duck_cosine('e.embedding', 'c.cv')} DESC, c.cell_id) AS rk
        FROM embeddings e, cent c
      ) WHERE rk = 1
    ), probes AS (
      SELECT query_id, cell_id FROM (
        SELECT q.vec_id AS query_id, c.cell_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_duck_cosine('q.embedding', 'c.cv')} DESC, c.cell_id) AS rk
        FROM embeddings q, cent c WHERE q.vec_id < {N_QUERIES}
      ) WHERE rk <= {N_PROBE}
    )
"""


@query(
    "similarity_ann_ivf",
    oracle=f"""
    {_DUCK_IVF_ANN}
    SELECT query_id, neighbor_id, rank, round(sim, 6) AS sim FROM (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             {_duck_cosine('q.embedding', 'n.embedding')} AS sim,
             row_number() OVER (
               PARTITION BY p.query_id
               ORDER BY {_duck_cosine('q.embedding', 'n.embedding')} DESC, a.vec_id) AS rank
      FROM probes p JOIN assigned a ON a.cell_id = p.cell_id
           JOIN embeddings q ON q.vec_id = p.query_id
           JOIN embeddings n ON n.vec_id = a.vec_id
      WHERE a.vec_id <> p.query_id
    ) WHERE rank <= {TOP_K}
    """,
)
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-k — deterministic (fixed first-N centroids,
    tie-broken assignment/probes), so the oracle replicates the full
    assign -> probe -> rank pipeline in SQL and rows value-hash match."""
    return ann_topk_ivf(load_table(spark, sf_dir, "embeddings"))


@query(
    "similarity_ivf_recall",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cell_id, embedding AS cv
      FROM embeddings ORDER BY vec_id LIMIT {N_CELLS}
    ), assigned AS (
      SELECT vec_id, cell_id FROM (
        SELECT e.vec_id, c.cell_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_duck_cosine('e.embedding', 'c.cv')} DESC, c.cell_id) AS rk
        FROM embeddings e, cent c
      ) WHERE rk = 1
    ), probes AS (
      SELECT query_id, cell_id FROM (
        SELECT q.vec_id AS query_id, c.cell_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_duck_cosine('q.embedding', 'c.cv')} DESC, c.cell_id) AS rk
        FROM embeddings q, cent c WHERE q.vec_id < {N_QUERIES}
      ) WHERE rk <= {N_PROBE}
    ), ann AS (
      SELECT query_id, neighbor_id FROM (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY p.query_id
                 ORDER BY {_duck_cosine('q.embedding', 'n.embedding')} DESC, a.vec_id) AS rank
        FROM probes p JOIN assigned a ON a.cell_id = p.cell_id
             JOIN embeddings q ON q.vec_id = p.query_id
             JOIN embeddings n ON n.vec_id = a.vec_id
        WHERE a.vec_id <> p.query_id
      ) WHERE rank <= {TOP_K}
    ), exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_duck_cosine('q.embedding', 'n.embedding')} DESC,
                          n.vec_id) AS rank
        FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
        WHERE q.vec_id < {N_QUERIES}
      ) WHERE rank <= {TOP_K}
    )
    SELECT e.query_id,
           round(count(a.neighbor_id) * 1.0 / {TOP_K}, 6) AS recall
    FROM exact e LEFT JOIN ann a USING (query_id, neighbor_id)
    GROUP BY e.query_id
    """,
)
def similarity_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k of the IVF probe search vs exact top-k — deterministic
    (fixed first-N centroids, tie-broken assignments), so it carries an
    exact SQL oracle pinning the (n_cells, n_probe) operating point."""
    exact = similarity_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    ann = (ann_topk_ivf(load_table(spark, sf_dir, "embeddings"))
           .select("query_id", "neighbor_id").withColumn("_hit", F.lit(1)))
    return (
        exact.join(ann, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.round(F.count("_hit") * 1.0 / TOP_K, 6).alias("recall"))
    )


# --- ANN index lifecycle: the append path (round 9) -------------------------
#
# What a production embedding store does on every ingest tick: new
# vectors are assigned against the FROZEN centroid table (IVF) or the
# constant hyperplanes (LSH) and their index rows appended — the
# corpus is never re-assigned, centroids are never re-trained inline.
# Because both signatures are per-row pure functions of (vector,
# frozen parameters), append-equals-rebuild is a THEOREM here — the
# oracle certifies the implementation actually has that shape (no
# union-order dependence, no accidental centroid refresh from the
# post-append corpus).

ANN_BATCH_MOD = 10  # vec_id % 10 == 0 plays "this tick's new vectors"


def ivf_index_append(batch_emb: DataFrame, centroids: DataFrame,
                     assigned: DataFrame,
                     vec_col: str = "embedding") -> DataFrame:
    """index(t+1) = index(t) ∪ assign(batch, frozen centroids). The
    existing assignment is untouched (append-only; in parquet terms a
    blind directory append — no read-modify-write, so none of the
    dedup lifecycle's cache-invalidation hazards apply)."""
    return assigned.unionByName(
        assign_to_centroids(batch_emb, centroids, vec_col))


def lsh_index_append(batch_emb: DataFrame, banded: DataFrame,
                     vec_col: str = "embedding") -> DataFrame:
    """LSH twin of ``ivf_index_append``: band signatures come from
    compile-time hyperplane constants, so an append IS the rebuild of
    the batch slice. Kept as the explicit lifecycle verb so storage
    code has one name per index family."""
    return banded.unionByName(signatures(batch_emb, vec_col))


def _duck_ivf_index_rebuild() -> str:
    """Full-rebuild oracle of the post-append IVF index: centroids
    frozen from the CORPUS slice (first N_CELLS by vec_id, exactly the
    state at build time), every vector — corpus and batch alike —
    assigned in one pass. A hash match against the Spark append plan
    certifies append == rebuild."""
    return f"""
    WITH cent AS (
      SELECT vec_id AS cell_id, embedding AS cv
      FROM embeddings WHERE vec_id % {ANN_BATCH_MOD} <> 0
      ORDER BY vec_id LIMIT {N_CELLS}
    )
    SELECT vec_id, cell_id FROM (
      SELECT e.vec_id, c.cell_id,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_duck_cosine('e.embedding', 'c.cv')} DESC,
                        c.cell_id) AS rk
      FROM embeddings e, cent c
    ) WHERE rk = 1
    """


@query("similarity_index_update", oracle=_duck_ivf_index_rebuild())
def similarity_index_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN index's append verb on the embeddings table: build the
    IVF index over the 90% corpus slice (centroids = its first
    N_CELLS vectors, frozen), then append this tick's batch
    (vec_id % 10 == 0) via ``ivf_index_append``. The oracle assigns
    ALL vectors against the same frozen centroids from scratch, so
    the driver hash certifies the append path never re-derives
    centroids from the grown corpus and never re-assigns old rows.

    Scale shape: the append touches O(|batch| x n_cells) work under a
    broadcast centroid table — corpus contact zero."""
    emb = load_table(spark, sf_dir, "embeddings")
    is_batch = F.col("vec_id") % ANN_BATCH_MOD == 0
    assigned_t, centroids = ivf_assign(emb.filter(~is_batch))
    return (ivf_index_append(emb.filter(is_batch), centroids, assigned_t)
            .select("vec_id", "cell_id"))


def ivf_index_delete(removed_ids: DataFrame,
                     assigned: DataFrame) -> DataFrame:
    """The ANN index's DELETE verb: one anti-join. Unlike the dedup
    index there is nothing to resurrect — vectors are independent
    (removing one never changes another's centroid assignment, since
    centroids are frozen), so erasure is exactly the removed rows'
    disappearance; delete == rebuild over the remainder is immediate
    from per-row purity (pinned by test_ivf_index_delete_is_antijoin).
    In a table format this emits O(|removed|) delete records."""
    return assigned.join(removed_ids.select("vec_id"), "vec_id", "left_anti")


def lsh_index_delete(removed_ids: DataFrame,
                     banded: DataFrame) -> DataFrame:
    """LSH twin of ``ivf_index_delete``: one anti-join on vec_id.
    Band signatures are per-row functions of compile-time hyperplanes
    (nothing to resurrect, no cross-row state), so delete == rebuild
    over the remainder holds by the same per-row-purity argument —
    pinned by test_lsh_index_delete_equals_remainder_rebuild so a
    future signature scheme that DID couple rows (e.g. data-dependent
    hyperplanes) fails the pin instead of silently diverging. The
    driver-certified delete row for this family is the IVF one
    (`similarity_index_delete` — identical anti-join shape); this verb
    completes the storage API so both index families expose
    append/delete under one name each."""
    return banded.join(removed_ids.select("vec_id"), "vec_id", "left_anti")


ANN_TAKEDOWN_RESIDUE = 1  # vec_id % 10 == 1 plays "today's takedown slice"


def _duck_ivf_remainder_rebuild() -> str:
    """Rebuild-over-remainder oracle of the post-delete IVF index:
    centroids stay FROZEN from the original corpus slice (first
    N_CELLS by vec_id — including any whose source vector is later
    taken down: a centroid is a trained parameter of the index, not
    the document itself, exactly as an offline-trained k-means
    codebook survives deletions of its training rows), and every
    remaining vector is assigned in one pass. A hash match against
    the Spark anti-join plan certifies delete == rebuild over the
    remainder."""
    return f"""
    WITH cent AS (
      SELECT vec_id AS cell_id, embedding AS cv
      FROM embeddings WHERE vec_id % {ANN_BATCH_MOD} <> 0
      ORDER BY vec_id LIMIT {N_CELLS}
    )
    SELECT vec_id, cell_id FROM (
      SELECT e.vec_id, c.cell_id,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_duck_cosine('e.embedding', 'c.cv')} DESC,
                        c.cell_id) AS rk
      FROM embeddings e, cent c
      WHERE e.vec_id % {ANN_BATCH_MOD} <> {ANN_TAKEDOWN_RESIDUE}
    ) WHERE rk = 1
    """


@query("similarity_index_delete", oracle=_duck_ivf_remainder_rebuild())
def similarity_index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-then-takedown on the embeddings table: build the IVF
    index over the 90% corpus slice, append this tick's batch
    (vec_id % 10 == 0) via ``ivf_index_append``, then take down the
    vec_id % 10 == 1 corpus slice via ``ivf_index_delete`` — the ANN
    family's driver-certified DELETE row, completing the lifecycle
    verb-for-verb with the dedup family (append r9, delete here).
    The oracle assigns the REMAINDER from scratch against the same
    frozen centroids, so the hash certifies delete == rebuild — in
    particular that no code path re-derives centroids from the
    post-delete corpus.

    Scale shape: the takedown is one anti-join against a
    broadcast-size removed set — O(|removed|) delete records in a
    table format, zero corpus recompute."""
    emb = load_table(spark, sf_dir, "embeddings")
    is_batch = F.col("vec_id") % ANN_BATCH_MOD == 0
    is_removed = F.col("vec_id") % ANN_BATCH_MOD == ANN_TAKEDOWN_RESIDUE
    assigned_t, centroids = ivf_assign(emb.filter(~is_batch))
    idx_t1 = ivf_index_append(emb.filter(is_batch), centroids, assigned_t)
    return (ivf_index_delete(emb.filter(is_removed).select("vec_id"), idx_t1)
            .select("vec_id", "cell_id"))


def flatten_band_index(idx: DataFrame) -> DataFrame:
    """Flatten a signatures() frame (band0..bandN columns) into the
    (vec_id, band, bucket BIGINT) rows the bucket-join probes and the
    parquet band-index store persists. Extracted round 11 from
    `similarity_lsh_index_update` (byte-identical plan) so the append,
    delete, and storage verbs all flatten through one definition —
    bucket CAST BIGINT here is the r9 type-parity lesson applied at
    the single choke point."""
    return idx.select(
        "vec_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("bucket"))
            for b in range(N_BANDS_ANN)])).alias("bb"),
    ).select("vec_id", F.col("bb.band").alias("band"),
             F.col("bb.bucket").cast("bigint").alias("bucket"))


@query(
    "similarity_lsh_index_update",
    # full-rebuild oracle: every vector's band signature from scratch
    # (the hyperplanes are compile-time constants, so the frozen state
    # is the code itself); hash match certifies the append emits the
    # same rows the rebuild would. The bucket is CAST to BIGINT on
    # BOTH engines: DuckDB's list_sum over BIGINT terms widens to
    # HUGEINT while Spark's bit*2^j sum is a plain int — the first
    # registered query exposing a raw bucket as output hit exactly
    # that value-TYPE divergence under the driver's hash (r9 red row;
    # the green LSH queries only consume buckets inside a join). The
    # cast is applied here, not inside the shared _duck_lsh_sig, so
    # the green consumers' oracle text stays byte-identical.
    oracle=f"""
    SELECT vec_id, band, CAST(bucket AS BIGINT) AS bucket
    FROM ({_duck_lsh_sig()})
    """,
)
def similarity_lsh_index_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH band index's append verb: corpus signatures built at t,
    this tick's batch (vec_id % 10 == 0) appended via
    ``lsh_index_append`` — then flattened to the (vec_id, band,
    bucket) rows the bucket-join probes. The hyperplane twin of
    `similarity_index_update`, closing the ADVICE-named pair at
    driver level; per-row purity makes append==rebuild a theorem, and
    the certification pins that the implementation keeps that shape
    (no signature version skew between corpus and batch paths)."""
    emb = load_table(spark, sf_dir, "embeddings")
    is_batch = F.col("vec_id") % ANN_BATCH_MOD == 0
    idx = lsh_index_append(emb.filter(is_batch),
                           signatures(emb.filter(~is_batch)))
    return flatten_band_index(idx)


RRF_K = 60  # the standard reciprocal-rank-fusion damping constant


@query(
    "similarity_rrf_fusion",
    # Both branch CTEs are byte-level reuses of the two GREEN ANN
    # oracles (LSH band-bucket + IVF cell-probe top-k); fusion is a
    # full outer join on (query, neighbor) and score = sum of
    # 1/(60+rank) over the branches that retrieved the pair. The 1.0
    # literal is CAST DOUBLE: DuckDB's bare 1.0 is DECIMAL and its
    # division would round differently from Spark's double.
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cell_id, embedding AS cv
      FROM embeddings ORDER BY vec_id LIMIT {N_CELLS}
    ), assigned AS (
      SELECT vec_id, cell_id FROM (
        SELECT e.vec_id, c.cell_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_duck_cosine('e.embedding', 'c.cv')} DESC,
                          c.cell_id) AS rk
        FROM embeddings e, cent c
      ) WHERE rk = 1
    ), probes AS (
      SELECT query_id, cell_id FROM (
        SELECT q.vec_id AS query_id, c.cell_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_duck_cosine('q.embedding', 'c.cv')} DESC,
                          c.cell_id) AS rk
        FROM embeddings q, cent c WHERE q.vec_id < {N_QUERIES}
      ) WHERE rk <= {N_PROBE}
    ), ivf AS (
      SELECT query_id, neighbor_id, rank FROM (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY p.query_id
                 ORDER BY {_duck_cosine('q.embedding', 'n.embedding')} DESC,
                          a.vec_id) AS rank
        FROM probes p JOIN assigned a ON a.cell_id = p.cell_id
             JOIN embeddings q ON q.vec_id = p.query_id
             JOIN embeddings n ON n.vec_id = a.vec_id
        WHERE a.vec_id <> p.query_id
      ) WHERE rank <= {TOP_K}
    ), sig AS ({_duck_lsh_sig()}
    ), cand AS (
      SELECT DISTINCT qs.vec_id AS query_id, ns.vec_id AS neighbor_id
      FROM sig qs JOIN sig ns ON qs.band = ns.band AND qs.bucket = ns.bucket
      WHERE qs.vec_id < {N_QUERIES} AND qs.vec_id <> ns.vec_id
    ), lsh AS (
      SELECT query_id, neighbor_id, rank FROM (
        SELECT c.query_id, c.neighbor_id,
               row_number() OVER (
                 PARTITION BY c.query_id
                 ORDER BY {_duck_cosine('q.embedding', 'n.embedding')} DESC,
                          c.neighbor_id) AS rank
        FROM cand c JOIN embeddings q ON q.vec_id = c.query_id
                    JOIN embeddings n ON n.vec_id = c.neighbor_id
      ) WHERE rank <= {TOP_K}
    ), fused AS (
      SELECT COALESCE(l.query_id, i.query_id) AS query_id,
             COALESCE(l.neighbor_id, i.neighbor_id) AS neighbor_id,
             l.rank AS r_lsh, i.rank AS r_ivf,
             COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + l.rank), 0)
               + COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + i.rank), 0) AS rrf
      FROM lsh l FULL OUTER JOIN ivf i
        ON l.query_id = i.query_id AND l.neighbor_id = i.neighbor_id
    )
    SELECT query_id, neighbor_id, rrf_rank,
           round(rrf, 6) AS rrf_score, r_lsh, r_ivf
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY query_id
               ORDER BY rrf DESC, neighbor_id) AS rrf_rank
      FROM fused
    ) WHERE rrf_rank <= {TOP_K}
    """,
)
def similarity_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the two bucketed retrieval paths —
    the standard way a retrieval stack combines heterogeneous ANN
    indexes (Cormack et al., SIGIR'09): score(q, n) = sum over
    retrievers of 1/(60 + rank), full-outer joined so a pair found by
    either branch participates, re-ranked per query. Both branches
    are the already-certified LSH and IVF top-k plans; at 100 TB the
    fusion join touches only O(queries x k) rows per branch — the
    candidate generation stays bucketed, and fusing never widens it.

    The r_lsh/r_ivf evidence columns make single-branch-only pairs
    visible (NULL on the missing side) — the fusion's entire value is
    non-identical branch rankings, pinned non-vacuous by
    test_rrf_fusion_branches_disagree."""
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    lsh = ann_topk_lsh(emb).select(
        "query_id", "neighbor_id", F.col("rank").alias("r_lsh"))
    ivf = ann_topk_ivf(emb).select(
        "query_id", "neighbor_id", F.col("rank").alias("r_ivf"))
    score = (
        F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("r_lsh")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("r_ivf")), F.lit(0.0)))
    w = W.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("neighbor_id"))
    return (
        lsh.join(ivf, ["query_id", "neighbor_id"], "full_outer")
        .withColumn("rrf", score)
        .withColumn("rrf_rank", F.row_number().over(w))
        .filter(F.col("rrf_rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rrf_rank",
                F.round("rrf", 6).alias("rrf_score"), "r_lsh", "r_ivf")
    )


@query(
    "similarity_lsh_index_delete",
    # remainder-rebuild oracle: every surviving vector's band signature
    # from scratch (hyperplanes are compile-time constants), takedown
    # slice excluded — a hash match certifies delete == rebuild over
    # the remainder. Bucket CAST BIGINT outside the shared sig SQL,
    # exactly as the green append row does (r9 type-parity lesson).
    oracle=f"""
    SELECT vec_id, band, CAST(bucket AS BIGINT) AS bucket
    FROM ({_duck_lsh_sig()})
    WHERE vec_id % {ANN_BATCH_MOD} <> {ANN_TAKEDOWN_RESIDUE}
    """,
)
def similarity_lsh_index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-then-takedown on the LSH band index: corpus signatures
    built at t, this tick's batch (vec_id % 10 == 0) appended via
    ``lsh_index_append``, then the vec_id % 10 == 1 corpus slice taken
    down via ``lsh_index_delete`` — the band-index twin of
    `similarity_index_delete` (VERDICT r10 item 3), closing the last
    verb asymmetry between the two ANN index families: both now expose
    append AND delete under driver certification. Band signatures are
    per-row pure functions of frozen hyperplanes (nothing resurrects,
    no cross-row state), so delete == rebuild-over-remainder is a
    theorem; the certification pins that the implementation keeps that
    shape.

    Scale shape: the takedown is one anti-join against a
    broadcast-size removed set — O(|removed| x n_bands) delete
    records in a table format, zero corpus recompute."""
    emb = load_table(spark, sf_dir, "embeddings")
    is_batch = F.col("vec_id") % ANN_BATCH_MOD == 0
    is_removed = F.col("vec_id") % ANN_BATCH_MOD == ANN_TAKEDOWN_RESIDUE
    idx_t1 = lsh_index_append(emb.filter(is_batch),
                              signatures(emb.filter(~is_batch)))
    idx_t2 = lsh_index_delete(emb.filter(is_removed).select("vec_id"), idx_t1)
    return flatten_band_index(idx_t2)


# --- semantic dedup (SemDeDup shape) ----------------------------------------

SEMDEDUP_COSINE = 0.42  # same operating point as the exact neardup pairs


@query(
    "dedup_semantic",
    # Closed-form oracle: frozen centroids (first N_CELLS by vec_id
    # over the FULL table), deterministic nearest-centroid assignment,
    # within-cluster pairs above the cosine threshold, drop = the
    # larger id of each such pair. Deterministic centroids make the
    # whole pipeline exact SQL, as similarity_ivf_recall proved.
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cell_id, embedding AS cv
      FROM embeddings ORDER BY vec_id LIMIT {N_CELLS}
    ), assigned AS (
      SELECT vec_id, cell_id FROM (
        SELECT e.vec_id, c.cell_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_duck_cosine('e.embedding', 'c.cv')} DESC,
                          c.cell_id) AS rk
        FROM embeddings e, cent c
      ) WHERE rk = 1
    ), pairs AS (
      SELECT b.vec_id AS vb
      FROM assigned a JOIN assigned b
        ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
      WHERE {_duck_cosine('ea.embedding', 'eb.embedding')} >= {SEMDEDUP_COSINE}
    )
    SELECT a.vec_id, a.cell_id,
           a.vec_id IN (SELECT vb FROM pairs) AS dropped
    FROM assigned a
    """,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space semantic dedup — the SemDeDup shape (Abbas et
    al., 2023): cluster the corpus with the frozen deterministic IVF
    centroids, then within each cluster drop the larger id of every
    pair whose cosine exceeds the threshold (the greedy keep-one-
    representative rule, made deterministic by the id order). Returns
    every vector with its cluster and drop verdict so the keep set AND
    the drop set are both certified.

    Scale shape: pairs form ONLY within a cluster — the equi-join on
    cell_id replaces the corpus cross join, so the comparison count is
    sum over clusters of |c|^2 instead of n^2, and the cluster count
    scales with corpus size (at 100 TB: offline-trained centroids,
    thousands of cells, per-cell pair work bounded by cell size — the
    exact reason SemDeDup clusters before comparing). The centroid
    table broadcasts; the only shuffle keys on cell_id.

    Composes the certified IVF machinery (`assign_to_centroids`) with
    the neardup verify, per VERDICT r10 item 4; planted-duplicate
    non-vacuity pinned by test_dedup_semantic_drops_planted_pair."""
    return semantic_dedup_verdicts(load_table(spark, sf_dir, "embeddings"))


def semantic_dedup_verdicts(emb: DataFrame,
                            threshold: float = SEMDEDUP_COSINE) -> DataFrame:
    """SemDeDup core over any (vec_id, embedding) frame: cluster with
    ivf_assign's frozen first-N centroids, form within-cluster pairs,
    drop the larger id of every above-threshold pair. Factored from
    the registered query so tests can feed planted duplicates."""
    from coursera_etl_pipeline_spark.llm_ops.dedup import _materialize

    # The assignment (broadcast-centroid cosine + per-vector window) is
    # consumed THREE times below (both self-join sides + the verdict
    # frame); without materialization Spark recomputes the full
    # cross-join/window per consumer — measured 2.66 -> ~1 s at sf0.1.
    # At 100 TB this intermediate is the persisted cluster-assignment
    # table SemDeDup would keep between pipeline stages anyway.
    assigned, _ = ivf_assign(emb)
    assigned = _materialize(assigned)
    left = assigned.select(F.col("vec_id").alias("va"),
                           F.col("embedding").alias("ea"), "cell_id")
    right = assigned.select(F.col("vec_id").alias("vb"),
                            F.col("embedding").alias("eb"), "cell_id")
    dropped = (
        left.join(right, "cell_id")
        .filter(F.col("va") < F.col("vb"))
        .withColumn("sim", cosine("ea", "eb"))
        .filter(F.col("sim") >= threshold)
        .select(F.col("vb").alias("vec_id")).distinct()
        .withColumn("_d", F.lit(True)))
    return (
        assigned.select("vec_id", "cell_id")
        .join(dropped, "vec_id", "left")
        .select("vec_id", "cell_id",
                F.coalesce(F.col("_d"), F.lit(False)).alias("dropped"))
    )


# --- int8 scalar quantization (round 11) -------------------------------------
#
# Vector-store compression: symmetric per-vector int8 quantization
# (scale = max|x| / 127, q_i = round(x_i / scale)) cuts embedding
# memory/IO 4x — the standard first step before an ANN index at
# 100 TB scale. Certification strategy: everything the hash checks is
# either exact-integer (the quantized codes, their L1 mass, the
# saturation count — integer arithmetic is associative, so no
# engine-order divergence is possible) or a single IEEE operation
# chain both engines execute identically (scale = exact max of exact
# float->double widenings, one division). Rounding is spelled
# floor(x/scale + 0.5) on BOTH engines rather than round() — Spark's
# round is HALF_UP, DuckDB's is not guaranteed to match, and the hash
# would catch the first tie.

Q_MAX = 127


def quantize_int8(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Append per-vector symmetric-quantization columns: `scale`
    (double) and `q` (array<int> in [-127, 127]). Pure narrow per-row
    work — zero shuffle, scan-speed at any scale."""
    scaled = emb.withColumn(
        "scale",
        F.expr(f"aggregate({vec_col}, 0D, "
               f"(acc, v) -> greatest(acc, abs(CAST(v AS DOUBLE))))"
               f" / CAST({Q_MAX} AS DOUBLE)"))
    return scaled.withColumn(
        "q",
        F.expr(f"CASE WHEN scale = 0D THEN transform({vec_col}, v -> 0) "
               f"ELSE transform({vec_col}, v -> "
               f"CAST(floor(CAST(v AS DOUBLE) / scale + 0.5D) AS INT)) END"))


def _duck_quantized() -> str:
    """The oracle's quantization CTE body (mirrors quantize_int8).

    The list_max is coalesce-guarded (ADVICE r11): over an EMPTY
    embedding DuckDB's list_max yields NULL while Spark's
    aggregate(..., 0D, greatest) yields 0.0 — the guard makes both
    engines agree the degenerate row has scale 0 and q = [], so the
    hash cannot diverge if a zero-length vector ever enters the
    fixture (today's loader emits fixed-width embeddings only)."""
    amax = ("coalesce(list_max(list_transform(embedding, "
            "v -> abs(CAST(v AS DOUBLE)))), 0)")
    return f"""
    SELECT vec_id,
           {amax} / CAST({Q_MAX} AS DOUBLE) AS scale,
           CASE WHEN {amax} = 0
                THEN list_transform(embedding, v -> 0)
                ELSE list_transform(embedding,
                       v -> CAST(floor(CAST(v AS DOUBLE) /
                              ({amax} / CAST({Q_MAX} AS DOUBLE)) + 0.5)
                            AS INTEGER))
           END AS q
    FROM embeddings
    """


@query(
    "similarity_quantize_int8",
    oracle=f"""
    WITH qz AS ({_duck_quantized()})
    SELECT vec_id, scale,
           CAST(len(list_filter(q, v -> abs(v) = {Q_MAX})) AS INTEGER)
             AS n_saturated,
           CAST(list_sum(list_transform(q, v -> abs(v))) AS BIGINT) AS l1_q,
           array_to_string(q, ',') AS q_csv
    FROM qz
    """,
)
def similarity_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embeddings table: per-vector
    scale, saturation count (elements hitting ±127 — >= 1 whenever the
    max element is unique, 0 only for the zero vector), exact L1 mass
    of the codes, and the full code vector as CSV — so the hash
    certifies every quantized value, not a summary.

    Scale shape: pure narrow per-row transform — at 100 TB this is a
    map-only pass writing a table 4x smaller than its input, which is
    the point."""
    qz = quantize_int8(load_table(spark, sf_dir, "embeddings"))
    return qz.select(
        "vec_id", "scale",
        F.size(F.expr(f"filter(q, v -> abs(v) = {Q_MAX})"))
        .alias("n_saturated"),
        F.expr("aggregate(q, 0L, (acc, v) -> acc + abs(CAST(v AS BIGINT)))")
        .alias("l1_q"),
        F.expr("array_join(transform(q, v -> CAST(v AS STRING)), ',')")
        .alias("q_csv"))


@query(
    "similarity_quantize_recall",
    # Quantized cosine = int dot / (sqrt(int self-dot) * sqrt(int
    # self-dot)): the dots are EXACT integers on both engines
    # (associative — no float-sum ordering risk), and the final
    # double ratio is one identical IEEE expression, so the ranking
    # (desc, vec_id tiebreak) cannot diverge between engines.
    oracle=f"""
    WITH qz AS ({_duck_quantized()}),
    qd AS (
      SELECT vec_id, q,
             -- coalesce: DuckDB's list_sum is NULL on an empty list
             -- while Spark's aggregate(q, 0L, ...) is 0, and a NULL
             -- qq silently skips the qq = 0 CASE arm below (ADVICE
             -- r12 — same empty-vector guard as _duck_quantized's
             -- coalesce(list_max, 0))
             CAST(coalesce(list_sum(list_transform(q, v -> v * v)), 0)
                  AS BIGINT) AS qq
      FROM qz
    ),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_duck_cosine('q.embedding', 'n.embedding')} DESC,
                          n.vec_id) AS rank
        FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
        WHERE q.vec_id < {N_QUERIES}
      ) WHERE rank <= {TOP_K}
    ),
    quant AS (
      SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY
                   CASE WHEN a.qq = 0 OR b.qq = 0 THEN 0
                        ELSE CAST(list_sum(list_transform(
                               range(1, len(a.q) + 1),
                               i -> CAST(a.q[i] AS BIGINT) * b.q[i]))
                             AS DOUBLE)
                             / (sqrt(CAST(a.qq AS DOUBLE))
                                * sqrt(CAST(b.qq AS DOUBLE)))
                   END DESC,
                   b.vec_id) AS rank
        FROM qd a JOIN qd b ON a.vec_id <> b.vec_id
        WHERE a.vec_id < {N_QUERIES}
      ) WHERE rank <= {TOP_K}
    )
    SELECT e.query_id,
           round(count(qt.neighbor_id) * 1.0 / {TOP_K}, 6) AS recall
    FROM exact e LEFT JOIN quant qt USING (query_id, neighbor_id)
    GROUP BY e.query_id
    """,
)
def similarity_quantize_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k of int8-quantized cosine search against the exact
    float brute force, per query vector — pins the fidelity cost of
    the 4x compression under the value-hash gate (the deterministic
    counterpart of a paper's 'recall after quantization' table).

    Scale shape: the quantized search is the brute-force baseline's
    shape (broadcast queries x corpus) on 4x narrower data; the
    production path would run it per-IVF-cell like similarity_ann_ivf.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    qd = (quantize_int8(emb)
          .select("vec_id", "q",
                  F.expr("aggregate(q, 0L, (acc, v) -> "
                         "acc + CAST(v AS BIGINT) * v)").alias("qq")))
    queries_side = (qd.filter(F.col("vec_id") < N_QUERIES)
                    .select(F.col("vec_id").alias("query_id"),
                            F.col("q").alias("q_a"),
                            F.col("qq").alias("qq_a")))
    corpus_side = qd.select(F.col("vec_id").alias("neighbor_id"),
                            F.col("q").alias("q_b"),
                            F.col("qq").alias("qq_b"))
    dotq = F.expr("aggregate(zip_with(q_a, q_b, "
                  "(x, y) -> CAST(x AS BIGINT) * y), 0L, "
                  "(acc, v) -> acc + v)")
    qcos = (F.when((F.col("qq_a") == 0) | (F.col("qq_b") == 0),
                   F.lit(0.0))
            .otherwise(dotq.cast("double")
                       / (F.sqrt(F.col("qq_a").cast("double"))
                          * F.sqrt(F.col("qq_b").cast("double")))))
    from pyspark.sql import Window as W
    ranked = (F.broadcast(queries_side)
              .join(corpus_side,
                    F.col("query_id") != F.col("neighbor_id"))
              .withColumn("qcos", qcos)
              .withColumn("rank", F.row_number().over(
                  W.partitionBy("query_id")
                  .orderBy(F.col("qcos").desc(), F.col("neighbor_id"))))
              .filter(F.col("rank") <= TOP_K)
              .select("query_id", "neighbor_id")
              .withColumn("_hit", F.lit(1)))
    exact = similarity_topk_bruteforce(spark, sf_dir).select(
        "query_id", "neighbor_id")
    return (
        exact.join(ranked, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.round(F.count("_hit") * 1.0 / TOP_K, 6).alias("recall")))


# --- quantized-IVF composition (round 12) ------------------------------------
#
# The memory play the quantization docstring promises, composed end to
# end: fp32 centroids route queries to n_probe cells (IVF), the
# vectors INSIDE the cells are int8 codes (4x smaller residency /
# scan), and in-cell scoring runs on exact integer dot products — the
# IVF-SQ8 layout every production vector store ships. Certified the
# same way as its two parents: the full assign -> probe -> quantized
# rank pipeline is deterministic (fixed first-N centroids, exact
# integer dots, vec_id tiebreaks), so recall@k against the exact
# float brute force carries a closed-form SQL oracle.


def ann_topk_ivf_quantized(emb: DataFrame, k: int = TOP_K,
                           n_queries: int = N_QUERIES,
                           n_probe: int = N_PROBE) -> DataFrame:
    """IVF search over int8-quantized cells: routing is float-vs-float
    against the frozen centroid table (fp32 centroids — the standard
    IVF-SQ shape), in-cell ranking is symmetric int8 cosine (exact
    integer dot / sqrt of exact integer self-dots, one IEEE division
    at the end — the engine-order-proof arithmetic
    similarity_quantize_recall certified)."""
    from pyspark.sql import Window as W

    assigned, centroids = ivf_assign(emb)
    qd = (quantize_int8(emb)
          .select("vec_id", "q",
                  F.expr("aggregate(q, 0L, (acc, v) -> "
                         "acc + CAST(v AS BIGINT) * v)").alias("qq")))
    cells = (assigned.select("vec_id", "cell_id")
             .join(qd, "vec_id")
             .select(F.col("vec_id").alias("neighbor_id"), "cell_id",
                     F.col("q").alias("q_b"), F.col("qq").alias("qq_b")))
    queries = (emb.filter(F.col("vec_id") < n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("qv"))
               .join(qd.select(F.col("vec_id").alias("query_id"),
                               F.col("q").alias("q_a"),
                               F.col("qq").alias("qq_a")), "query_id"))
    # map-only top-n_probe routing (r18, same rewrite as ann_topk_ivf)
    probes = (
        queries.crossJoin(_collect_centroids(centroids))
        .withColumn("_top",
                    F.slice(F.reverse(F.array_sort(_scored_cells("qv"))),
                            1, n_probe))
        .select("query_id", "q_a", "qq_a",
                F.explode(F.col("_top.cell_id")).alias("cell_id")))
    dotq = F.expr("aggregate(zip_with(q_a, q_b, "
                  "(x, y) -> CAST(x AS BIGINT) * y), 0L, "
                  "(acc, v) -> acc + v)")
    qcos = (F.when((F.col("qq_a") == 0) | (F.col("qq_b") == 0),
                   F.lit(0.0))
            .otherwise(dotq.cast("double")
                       / (F.sqrt(F.col("qq_a").cast("double"))
                          * F.sqrt(F.col("qq_b").cast("double")))))
    w = W.partitionBy("query_id").orderBy(F.desc("qsim"),
                                          F.asc("neighbor_id"))
    return (
        probes.join(cells, "cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("qsim", qcos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank"))


@query(
    "similarity_ann_quantized",
    # exact float brute-force top-k vs the quantized-IVF top-k:
    # cent/assigned/probes replicate ivf_assign's deterministic
    # routing; qd replicates quantize_int8; the in-cell rank is the
    # same exact-integer arithmetic as similarity_quantize_recall's
    oracle=f"""
    {_DUCK_IVF_ANN},
    qz AS ({_duck_quantized()}),
    qd AS (
      SELECT vec_id, q,
             -- coalesce: DuckDB's list_sum is NULL on an empty list
             -- while Spark's aggregate(q, 0L, ...) is 0, and a NULL
             -- qq silently skips the qq = 0 CASE arm below (ADVICE
             -- r12 — same empty-vector guard as _duck_quantized's
             -- coalesce(list_max, 0))
             CAST(coalesce(list_sum(list_transform(q, v -> v * v)), 0)
                  AS BIGINT) AS qq
      FROM qz
    ),
    annq AS (
      SELECT query_id, neighbor_id FROM (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY p.query_id
                 ORDER BY
                   CASE WHEN qa.qq = 0 OR qb.qq = 0 THEN 0
                        ELSE CAST(list_sum(list_transform(
                               range(1, len(qa.q) + 1),
                               i -> CAST(qa.q[i] AS BIGINT) * qb.q[i]))
                             AS DOUBLE)
                             / (sqrt(CAST(qa.qq AS DOUBLE))
                                * sqrt(CAST(qb.qq AS DOUBLE)))
                   END DESC,
                   a.vec_id) AS rank
        FROM probes p
             JOIN assigned a ON a.cell_id = p.cell_id
             JOIN qd qa ON qa.vec_id = p.query_id
             JOIN qd qb ON qb.vec_id = a.vec_id
        WHERE a.vec_id <> p.query_id
      ) WHERE rank <= {TOP_K}
    ),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_duck_cosine('q.embedding', 'n.embedding')} DESC,
                          n.vec_id) AS rank
        FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
        WHERE q.vec_id < {N_QUERIES}
      ) WHERE rank <= {TOP_K}
    )
    SELECT e.query_id,
           round(count(a.neighbor_id) * 1.0 / {TOP_K}, 6) AS recall
    FROM exact e LEFT JOIN annq a USING (query_id, neighbor_id)
    GROUP BY e.query_id
    """,
)
def similarity_ann_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k of the IVF-SQ8 composition (fp32-centroid routing +
    int8 in-cell scoring) against the exact float brute force — pins
    the COMBINED fidelity cost of cell pruning and 8-bit codes under
    the value-hash gate, completing VERDICT r11 item 7: the quantized
    vectors now live inside the index, not beside it.

    Scale shape: per query the corpus contact is ~n_probe/n_cells of
    brute force, on codes 4x narrower than the floats — the int dot is
    cheaper per element too (no FP normalize until the final ratio).
    At 100 TB the cells are the bucketed unit: codes sit clustered by
    cell_id so a probe scans contiguous int8 pages, and the fp32
    originals stay cold on object storage for reranking tiers only."""
    exact = (similarity_topk_bruteforce(spark, sf_dir)
             .select("query_id", "neighbor_id"))
    annq = (ann_topk_ivf_quantized(load_table(spark, sf_dir, "embeddings"))
            .select("query_id", "neighbor_id")
            .withColumn("_hit", F.lit(1)))
    return (
        exact.join(annq, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.round(F.count("_hit") * 1.0 / TOP_K, 6).alias("recall")))


# --- product quantization ANN (round-17 pre-build, r16) -----------------------
#
# PQ (Jegou et al. 2011, "Product Quantization for Nearest Neighbor
# Search", public): split each vector into M subvectors, quantize each
# against its own small codebook, and answer queries with asymmetric
# distance computation (ADC) — the query stays full-precision, each
# corpus vector costs M one-byte codes and M lookup-table adds. The
# third quantization family next to SQ8 (similarity_quantize_int8)
# and IVF-SQ8 (similarity_ann_quantized): PQ compresses 64 floats
# (256 B) to 4 codes (4 B), a 64x store reduction. Codebooks are the
# subvectors of the first PQ_CODEWORDS corpus vectors — the same
# frozen deterministic "training" discipline as ivf_assign, which is
# what makes every code and distance an exact cross-engine
# expectation. Registration deferred to round 17 (COVERAGE.md
# round-16 queue note); pinned registry name `similarity_ann_pq`.

PQ_SUBSPACES = 4    # M: 64-dim fixture vectors -> 4 x 16-dim subspaces
PQ_SUBDIM = 16
PQ_CODEWORDS = 16   # codewords per subspace (vec_id < 16 train)


def _sub_l2(a: str, b: str, sub: str) -> Column:
    """Squared L2 between subspace `sub` (0-based) of two full
    vectors, as ONE sequential left fold — the accumulation order the
    DuckDB oracle replays term for term (the _duck_cosine parity
    discipline, applied to (x-y)^2)."""
    return F.expr(
        f"aggregate(zip_with(slice({a}, {sub} * {PQ_SUBDIM} + 1, {PQ_SUBDIM}),"
        f" slice({b}, {sub} * {PQ_SUBDIM} + 1, {PQ_SUBDIM}),"
        f" (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
        f" * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
        f" 0D, (acc, v) -> acc + v)")


def _duck_sub_l2(a: str, b: str, sub: str) -> str:
    """The identical fold in DuckDB SQL: list_sum over the in-order
    per-element squared differences, indexing the same window of the
    full vectors."""
    x = f"CAST({a}[{sub} * {PQ_SUBDIM} + i] AS DOUBLE)"
    y = f"CAST({b}[{sub} * {PQ_SUBDIM} + i] AS DOUBLE)"
    return (f"list_sum(list_transform(range(1, {PQ_SUBDIM} + 1), "
            f"i -> ({x} - {y}) * ({x} - {y})))")


def pq_codebook(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(sub, code, cw_full): PQ_SUBSPACES x PQ_CODEWORDS codebook rows;
    cw_full carries the whole training vector so distance expressions
    index the shared (sub)-window of both operands identically."""
    train = (emb.filter(F.col("vec_id") < PQ_CODEWORDS)
             .select(F.col("vec_id").cast("int").alias("code"),
                     F.col(vec_col).alias("cw_full")))
    return train.select(
        F.explode(F.array(*[F.lit(s) for s in range(PQ_SUBSPACES)]))
        .alias("sub"), "code", "cw_full")


def pq_codes(emb: DataFrame, codebook: DataFrame,
             vec_col: str = "embedding") -> DataFrame:
    """(vec_id, sub, code): every vector's per-subspace nearest
    codeword (ties -> lowest code id).

    MAP-ONLY (optimization r18; the assign_to_centroids rewrite
    applied to the PQ encoder): the per-(vec, sub) argmin is a pure
    function of (row, frozen broadcast codebook), so the codebook is
    collected into ONE broadcast array row and each vector computes
    its M codes with nested higher-order functions — transform over
    the subspaces, array_min(struct(d, code)) over that subspace's
    codewords — then explodes M rows. Zero exchange; the former
    min(struct) hash-aggregate (itself the r16 fix over a row_number
    window) still shuffled |corpus| x M collapsed rows. The fold
    keeps _sub_l2's exact zip_with/aggregate accumulation order
    (bit-identical doubles) and array_min reproduces min(struct)'s
    tie-break (equal distances fall to the lower code id).

    CONTRACT: the codebook must be NON-EMPTY and cover every subspace
    (the _collect_centroids empty-input note applies verbatim — an
    empty or sub-missing codebook yields NULL code rows, not zero
    rows)."""
    cb = F.broadcast(codebook.agg(
        F.collect_list(F.struct("sub", "code", "cw_full")).alias("_cb")))
    l2 = (f"aggregate(zip_with("
          f"slice({vec_col}, s * {PQ_SUBDIM} + 1, {PQ_SUBDIM}),"
          f" slice(c.cw_full, s * {PQ_SUBDIM} + 1, {PQ_SUBDIM}),"
          f" (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
          f" * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
          f" 0D, (acc, v) -> acc + v)")
    best = (f"transform(sequence(0, {PQ_SUBSPACES - 1}), s -> struct("
            f"s AS sub, array_min(transform(filter(_cb, c -> c.sub = s),"
            f" c -> struct({l2} AS d, c.code AS code))).code AS code))")
    return (emb.select("vec_id", vec_col).crossJoin(cb)
            .select("vec_id", F.explode(F.expr(best)).alias("_sc"))
            .select("vec_id", F.col("_sc.sub").alias("sub"),
                    F.col("_sc.code").alias("code")))


def ann_topk_pq(emb: DataFrame, k: int = TOP_K,
                n_queries: int = N_QUERIES,
                vec_col: str = "embedding") -> DataFrame:
    """(query_id, neighbor_id, rank, adc_dist): top-k by PQ/ADC.

    Scale shape: corpus contact is the CODES frame (M small ints per
    vector, 64x narrower than the floats); per query the ADC lookup
    table is M x PQ_CODEWORDS precomputed subspace distances
    (broadcast by construction), and scoring is one equi-join on
    (sub, code) + a fixed-order 4-term add — no float vector is ever
    shuffled at query time. The per-(query, vec, sub) join output is
    exactly M rows per scored pair, collapsed by one aggregate whose
    per-subspace sums each see ONE value (exact, order-free by
    construction).

    Determinism: frozen codebooks make codes, LUTs, distances, and
    the (adc ASC, vec_id ASC) ranking exact expectations; adc_dist
    rounds to 6dp only at the output boundary."""
    from pyspark.sql import Window as W

    codebook = pq_codebook(emb, vec_col)
    codes = pq_codes(emb, codebook, vec_col)
    queries = (emb.filter(F.col("vec_id") < n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       F.col(vec_col).alias("qv")))
    lut = (queries.join(F.broadcast(codebook))
           .select("query_id", "sub", "code",
                   _sub_l2("qv", "cw_full", "sub").alias("_d")))
    scored = (codes.withColumnRenamed("vec_id", "neighbor_id")
              .join(F.broadcast(lut), ["sub", "code"])
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .groupBy("query_id", "neighbor_id")
              .agg(*[F.sum(F.when(F.col("sub") == s, F.col("_d")))
                     .alias(f"_d{s}") for s in range(PQ_SUBSPACES)]))
    adc = None
    for s in range(PQ_SUBSPACES):
        adc = F.col(f"_d{s}") if adc is None else adc + F.col(f"_d{s}")
    w = W.partitionBy("query_id").orderBy(F.asc("_adc"), F.asc("neighbor_id"))
    return (scored.withColumn("_adc", adc)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("_adc", 6).alias("adc_dist")))


def _duck_pq_ctes() -> str:
    """cb/assign/codes/q/lut CTE block — the frozen PQ codebook, the
    per-subspace argmin code assignment (the oracle's independent
    row_number formulation of the engine's min(struct) aggregate), the
    query set, and the per-query ADC lookup table. Extracted from
    ``r17_similarity_ann_pq_oracle`` (emission hash-verified
    byte-identical) so the r18 IVF-PQ composition can splice the same
    PQ recipe next to the IVF routing CTEs instead of respelling it —
    the `_duck_sig_ctes` single-definition rule applied to PQ."""
    d_assign = _duck_sub_l2("e.embedding", "cb.cw_full", "cb.sub")
    d_lut = _duck_sub_l2("q.qv", "cb.cw_full", "cb.sub")
    return f"""cb AS (
      SELECT s.sub, CAST(vec_id AS INTEGER) AS code,
             embedding AS cw_full
      FROM embeddings,
           (SELECT unnest(range(0, {PQ_SUBSPACES})) AS sub) s
      WHERE vec_id < {PQ_CODEWORDS}
    ),
    assign AS (
      SELECT e.vec_id, cb.sub, cb.code,
             {d_assign} AS _d,
             row_number() OVER (
               PARTITION BY e.vec_id, cb.sub
               ORDER BY {d_assign} ASC, cb.code ASC) AS rk
      FROM embeddings e, cb
    ),
    codes AS (
      SELECT vec_id, sub, code FROM assign WHERE rk = 1
    ),
    q AS (
      SELECT vec_id AS query_id, embedding AS qv
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    lut AS (
      SELECT q.query_id, cb.sub, cb.code, {d_lut} AS _d
      FROM q, cb
    )"""


def r17_similarity_ann_pq_oracle() -> str:
    """DuckDB oracle for the registered query: same frozen
    codebook, same per-subspace argmin assignment, same ADC pivot-sum
    in the same fixed subspace order, same (adc, neighbor_id) ranking
    — every fold spelled via _duck_sub_l2 so accumulation order
    matches the engine's aggregate()."""
    pivot = " + ".join(f"d{s}" for s in range(PQ_SUBSPACES))
    pivot_cols = ",\n             ".join(
        f"SUM(CASE WHEN l.sub = {s} THEN l._d END) AS d{s}"
        for s in range(PQ_SUBSPACES))
    return f"""
    WITH {_duck_pq_ctes()},
    scored AS (
      SELECT l.query_id, c.vec_id AS neighbor_id,
             {pivot_cols}
      FROM codes c JOIN lut l ON l.sub = c.sub AND l.code = c.code
      WHERE c.vec_id != l.query_id
      GROUP BY l.query_id, c.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY ({pivot}) ASC, neighbor_id ASC) AS INTEGER)
               AS rank,
             round({pivot}, 6) AS adc_dist
      FROM scored
    )
    SELECT query_id, neighbor_id, rank, adc_dist
    FROM ranked WHERE rank <= {TOP_K}
    """


@query("similarity_ann_pq", oracle=r17_similarity_ann_pq_oracle())
def similarity_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered round 17 under the pre-staged plan_audit name
    (COVERAGE.md round-16 queue): PQ/ADC top-k ANN — the 64x
    compression tier next to SQ8 and IVF-SQ8. Core, oracle, planted
    parity pytest (test_r17_ann_pq), the repartition-stability property
    test, and the min(struct) argmin plan review landed in r16."""
    return ann_topk_pq(load_table(spark, sf_dir, "embeddings"))


# --- IVF-PQ composition (round-18 pre-build, r17) -----------------------------
#
# The production vector-store operating point (Jegou et al. 2011 §V;
# every large-scale ANN system composes these two): IVF routing prunes
# the corpus to n_probe cells, PQ/ADC scores inside the cells on
# byte codes. Completes the quantized-search lattice — SQ8 (flat int8),
# IVF-SQ8 (routed int8), PQ (flat codes), IVF-PQ (routed codes): at
# 100 TB the corpus contact is n_probe/n_cells of the CODES frame,
# i.e. pruning x 64x compression multiply. Registration deferred to
# round 18 BEHIND stream_bloom_bits_parity (the registry sits on the
# 160 band edge — the registering commit must execute the next
# rotation-band revision); pinned registry name `similarity_ann_ivfpq`.


def ann_topk_ivfpq(emb: DataFrame, k: int = TOP_K,
                   n_queries: int = N_QUERIES, n_probe: int = N_PROBE,
                   vec_col: str = "embedding") -> DataFrame:
    """(query_id, neighbor_id, rank, adc_dist): top-k by IVF-routed
    PQ/ADC — frozen fp32 centroids pick each query's n_probe cells
    (ivf_assign's deterministic routing, the similarity_ann_quantized
    precedent), then ADC scores ONLY the codes of vectors assigned to
    probed cells.

    Scale shape: query-side state (probes: |queries| x n_probe rows;
    LUT: |queries| x M x codewords subspace distances) is broadcast;
    corpus contact is the codes-joined-to-cells frame filtered by the
    probe equi-join — n_probe/n_cells of the byte-code index, no float
    corpus vector touched at query time. The per-(query, vec, sub)
    expansion collapses through the same one-value-per-subspace
    pivot-sum aggregate as ann_topk_pq.

    Determinism: both fragments are frozen-parameter exact
    expectations, so the composition is too — routing, codes, LUTs,
    distances, and the (adc ASC, neighbor_id ASC) ranking all
    cross-engine exact; adc_dist rounds to 6dp at the output boundary."""
    from pyspark.sql import Window as W

    assigned, centroids = ivf_assign(emb, vec_col)
    codebook = pq_codebook(emb, vec_col)
    codes = pq_codes(emb, codebook, vec_col)
    queries = (emb.filter(F.col("vec_id") < n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       F.col(vec_col).alias("qv")))
    # map-only top-n_probe routing (r18, same rewrite as ann_topk_ivf)
    probes = (queries.crossJoin(_collect_centroids(centroids))
              .withColumn("_top",
                          F.slice(F.reverse(F.array_sort(_scored_cells("qv"))),
                                  1, n_probe))
              .select("query_id",
                      F.explode(F.col("_top.cell_id")).alias("cell_id")))
    lut = (queries.join(F.broadcast(codebook))
           .select("query_id", "sub", "code",
                   _sub_l2("qv", "cw_full", "sub").alias("_d")))
    cell_codes = (codes.join(assigned.select("vec_id", "cell_id"), "vec_id")
                  .withColumnRenamed("vec_id", "neighbor_id"))
    scored = (cell_codes.join(F.broadcast(probes), "cell_id")
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .join(F.broadcast(lut), ["query_id", "sub", "code"])
              .groupBy("query_id", "neighbor_id")
              .agg(*[F.sum(F.when(F.col("sub") == s, F.col("_d")))
                     .alias(f"_d{s}") for s in range(PQ_SUBSPACES)]))
    adc = None
    for s in range(PQ_SUBSPACES):
        adc = F.col(f"_d{s}") if adc is None else adc + F.col(f"_d{s}")
    w = W.partitionBy("query_id").orderBy(F.asc("_adc"), F.asc("neighbor_id"))
    return (scored.withColumn("_adc", adc)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("_adc", 6).alias("adc_dist")))


def embed_hash_topk(docs: DataFrame, k: int = TOP_K,
                    n_queries: int = N_QUERIES) -> DataFrame:
    """(query_id, neighbor_id, rank, sim): exact cosine top-k over the
    ENGINE-GENERATED feature-hashing embeddings — generation
    (text.embed_hash) and retrieval composed end to end, no fixture
    vectors involved. Round-18 pre-build (r17); pinned registry name
    `similarity_embed_hash_topk`.

    Determinism: weights are exact BIGINTs, so dots and norms are
    exact integer sums (order-free — no float fold anywhere); the only
    floats are one division and two IEEE-correct sqrts per pair,
    spelled identically in the oracle. Zero vectors (featureless docs,
    or full sign cancellation) score sim 0.0 via an explicit CASE
    rather than NaN.

    Scale shape: the long->dense pivot is one bounded hash-aggregate
    (<= EMBED_HASH_DIM entries per doc via map_from_entries); queries
    broadcast against the corpus exactly like
    similarity_topk_bruteforce (the corpus side never shuffles; only
    the per-query top-k window does). The IVF/LSH/PQ tiers compose on
    top of the same generated vectors when corpus contact must
    shrink."""
    from pyspark.sql import Window as W

    from coursera_etl_pipeline_spark.llm_ops.text import (
        EMBED_HASH_DIM,
        embed_hash,
    )

    from coursera_etl_pipeline_spark.llm_ops.dedup import _materialize

    feats = embed_hash(docs).filter(F.col("dim_id").isNotNull())
    dense = (feats.groupBy("doc_id")
             .agg(F.map_from_entries(
                 F.collect_list(F.struct("dim_id", "weight"))).alias("m")))
    v = F.expr(
        f"transform(sequence(0, {EMBED_HASH_DIM - 1}),"
        f" i -> coalesce(element_at(m, CAST(i AS BIGINT)), 0L))")

    def idot(a: str, b: str) -> Column:
        return F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
                      f" 0L, (acc, p) -> acc + p)")

    # norms are PER-VECTOR — compute them once here, NOT per scored
    # pair (the first probe of this plan folded qv*qv and nv*nv for
    # every one of the |queries| x |corpus| pairs: 3 full-vector folds
    # per pair instead of 1, and the pivot ran once per consumer —
    # A/B'd at K=10, see the r18-queue BASELINE row); _materialize
    # shares the pivoted frame between the query and corpus branches
    vecs = _materialize(
        docs.select("doc_id").join(dense, "doc_id", "left")
        .select("doc_id", v.alias("v"))
        .withColumn("nn", idot("v", "v")))

    q = (vecs.filter(F.col("doc_id") < n_queries)
         .select(F.col("doc_id").alias("query_id"),
                 F.col("v").alias("qv"), F.col("nn").alias("qn")))
    n = vecs.select(F.col("doc_id").alias("neighbor_id"),
                    F.col("v").alias("nv"), F.col("nn").alias("bn"))
    dd = idot("qv", "nv")
    sim = (F.when((F.col("qn") == 0) | (F.col("bn") == 0), F.lit(0.0))
           .otherwise(dd.cast("double")
                      / (F.sqrt(F.col("qn").cast("double"))
                         * F.sqrt(F.col("bn").cast("double")))))
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (F.broadcast(q).crossJoin(n)
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("sim", sim)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("sim", 6).alias("sim")))


def r18_similarity_embed_hash_topk_oracle() -> str:
    """DuckDB oracle: the shared embed-hash feature CTEs, exact
    integer dots/norms via a sparse dim_id equi-join COMPLETED to all
    pairs with a LEFT join + COALESCE 0 (a pair with no common bucket
    has dot 0 but must still rank — weights can be negative, so
    missing pairs can outrank present ones), then the identical
    CASE/division/sqrt and (sim DESC, neighbor_id) ranking."""
    from coursera_etl_pipeline_spark.llm_ops.text import (
        _duck_embed_feats_ctes,
    )

    return f"""
    WITH {_duck_embed_feats_ctes()},
    ids AS (SELECT doc_id FROM documents),
    dots AS (
      SELECT a.doc_id AS qid, b.doc_id AS nid,
             CAST(SUM(a.weight * b.weight) AS BIGINT) AS dd
      FROM feats a JOIN feats b ON a.dim_id = b.dim_id
      WHERE a.doc_id < {N_QUERIES}
      GROUP BY a.doc_id, b.doc_id
    ),
    norms AS (
      SELECT doc_id, CAST(SUM(weight * weight) AS BIGINT) AS nn
      FROM feats GROUP BY doc_id
    ),
    scored AS (
      SELECT q.doc_id AS query_id, n.doc_id AS neighbor_id,
             CASE WHEN COALESCE(nq.nn, 0) = 0 OR COALESCE(nb.nn, 0) = 0
                  THEN 0.0
                  ELSE CAST(COALESCE(d.dd, 0) AS DOUBLE)
                       / (sqrt(CAST(nq.nn AS DOUBLE))
                          * sqrt(CAST(nb.nn AS DOUBLE))) END AS sim
      FROM ids q
        JOIN ids n ON n.doc_id != q.doc_id
        LEFT JOIN dots d ON d.qid = q.doc_id AND d.nid = n.doc_id
        LEFT JOIN norms nq ON nq.doc_id = q.doc_id
        LEFT JOIN norms nb ON nb.doc_id = n.doc_id
      WHERE q.doc_id < {N_QUERIES}
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank,
             round(sim, 6) AS sim
      FROM scored
    )
    SELECT query_id, neighbor_id, rank, sim
    FROM ranked WHERE rank <= {TOP_K}
    """


def _duck_ivfpq_ctes() -> str:
    """The full IVF-PQ CTE chain through `ranked` — the certified IVF
    routing block (`_DUCK_IVF_ANN`: cent/assigned/probes), the
    certified PQ block (`_duck_pq_ctes`: cb/assign/codes/q/lut), the
    probed-cell ADC scoring, and the (adc, neighbor_id) ranking.
    Extracted from ``r18_similarity_ann_ivfpq_oracle`` in round 18
    (recomposed emission hash-verified byte-identical) so the r19
    recall metric can splice the same chain next to its exact arm —
    the `_duck_sig_ctes` single-definition rule applied to IVF-PQ."""
    pivot = " + ".join(f"d{s}" for s in range(PQ_SUBSPACES))
    pivot_cols = ",\n             ".join(
        f"SUM(CASE WHEN l.sub = {s} THEN l._d END) AS d{s}"
        for s in range(PQ_SUBSPACES))
    return f"""{_DUCK_IVF_ANN},
    {_duck_pq_ctes()},
    scored AS (
      SELECT l.query_id, c.vec_id AS neighbor_id,
             {pivot_cols}
      FROM codes c
        JOIN assigned a ON a.vec_id = c.vec_id
        JOIN probes p ON p.cell_id = a.cell_id
        JOIN lut l ON l.query_id = p.query_id
                  AND l.sub = c.sub AND l.code = c.code
      WHERE c.vec_id != p.query_id
      GROUP BY l.query_id, c.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY ({pivot}) ASC, neighbor_id ASC) AS INTEGER)
               AS rank,
             round({pivot}, 6) AS adc_dist
      FROM scored
    )"""


def r18_similarity_ann_ivfpq_oracle() -> str:
    """DuckDB oracle for the registered query: the IVF routing and PQ
    blocks splice together unchanged, ADC scoring joins codes ->
    assigned cell -> probes so only probed-cell vectors rank — the
    same fixed-order pivot-sum and (adc, neighbor_id) ranking as the
    PQ oracle (chain shared with the r19 recall metric via
    `_duck_ivfpq_ctes`)."""
    return f"""
    {_duck_ivfpq_ctes()}
    SELECT query_id, neighbor_id, rank, adc_dist
    FROM ranked WHERE rank <= {TOP_K}
    """


@query("similarity_ann_ivfpq", oracle=r18_similarity_ann_ivfpq_oracle())
def similarity_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered round 18 under the pre-staged plan_audit name
    (COVERAGE.md round-17 queue; the registering commit executes the
    160-crossing band revision). Core, composed oracle, planted parity
    pytest (test_r18_ann_ivfpq), and the pre-staged allowlist row
    (broadcast frozen-centroid routing x broadcast codebook LUT, both
    parents' deliberate crosses) landed in r17. Completes the
    quantization lattice: SQ8 / IVF-SQ8 / PQ / IVF-PQ."""
    return ann_topk_ivfpq(load_table(spark, sf_dir, "embeddings"))


@query("similarity_embed_hash_topk",
       oracle=r18_similarity_embed_hash_topk_oracle())
def similarity_embed_hash_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered round 18 under the pre-staged name (COVERAGE.md
    round-17 queue): generation -> retrieval composed end to end over
    the ENGINE-GENERATED feature-hashing embeddings. Core, sparse-
    join-completed oracle, planted parity pytest
    (test_r18_embed_hash_topk), and the per-vector-norm plan fix
    (3.7x) landed in r17."""
    return embed_hash_topk(load_table(spark, sf_dir, "documents"))


# --- IVF-PQ recall metric (round-19 pre-build, r18) ----------------------------
#
# Completes the recall instrumentation for the quantization lattice:
# LSH (similarity_ann_recall), IVF (similarity_ivf_recall), SQ8
# (similarity_quantize_recall), IVF-SQ8 (similarity_ann_quantized) all
# carry certified quality metrics — the round-18-registered IVF-PQ
# production operating point now gets the same treatment: recall@k of
# the routed ADC results against the exact brute-force top-k, per
# query, as an exact cross-engine expectation (frozen centroids +
# frozen codebooks = deterministic metric). Registration deferred to
# round 19 (the r18 certification window is consumed); pinned registry
# name `similarity_ivfpq_recall`.


def ivfpq_recall_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, recall): fraction of each query's exact top-k the
    IVF-PQ search retrieves. Both arms are certified fragments; the
    metric adds one (query, neighbor) LEFT join + a |queries|-row
    aggregate — at 100 TB this runs on a sampled query set while the
    exact arm is the expensive side (the point of measuring recall
    offline, not inline)."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = similarity_topk_bruteforce(spark, sf_dir) \
        .select("query_id", "neighbor_id")
    ann = (ann_topk_ivfpq(emb).select("query_id", "neighbor_id")
           .withColumn("_hit", F.lit(1)))
    return (exact.join(ann, ["query_id", "neighbor_id"], "left")
            .groupBy("query_id")
            .agg(F.round(F.count("_hit") * 1.0 / TOP_K, 6).alias("recall")))


def r19_similarity_ivfpq_recall_oracle() -> str:
    """DuckDB oracle: the shared IVF-PQ chain (`_duck_ivfpq_ctes`,
    byte-identical to the registered query's oracle) next to the exact
    brute-force arm (the similarity_ann_recall exact CTE), LEFT-joined
    into per-query recall — the 1.0 literal multiplies as in the green
    recall rows (DuckDB DECIMAL/Spark double agree through round 6)."""
    return f"""
    {_duck_ivfpq_ctes()},
    ann AS (
      SELECT query_id, neighbor_id FROM ranked WHERE rank <= {TOP_K}
    ),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_duck_cosine('q.embedding', 'n.embedding')} DESC,
                          n.vec_id) AS rank
        FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
        WHERE q.vec_id < {N_QUERIES}
      ) WHERE rank <= {TOP_K}
    )
    SELECT e.query_id,
           round(count(a.neighbor_id) * 1.0 / {TOP_K}, 6) AS recall
    FROM exact e LEFT JOIN ann a USING (query_id, neighbor_id)
    GROUP BY e.query_id
    """


# --- Lloyd refinement step: the k-means trainer verb (round-19 pre-build, r18)
#
# Every IVF/PQ docstring says "at 100 TB centroids are trained offline
# and broadcast" — this is that trainer's unit of work, certified: one
# Lloyd iteration from the frozen seed centroids (assign every vector
# to its nearest centroid, recompute each centroid as the exact member
# mean). Training = iterating this step, exactly how
# dedup_components iterates its certified star-contraction step; the
# output is the refined centroid in EXACT integer micros (the dsum
# discipline: per-dimension BIGINT sums are order-free, so the driver
# hash certifies the mean without a float fold anywhere), plus the
# member count that divides it back to a double centroid for the next
# round. Registration deferred to round 19; pinned registry name
# `similarity_kmeans_refine`.

EMB_DIM = PQ_SUBSPACES * PQ_SUBDIM  # the fixture embeddings' dimensionality


def kmeans_refine(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(cell_id, dim_id, sum_micros, n_members): one exact Lloyd step.

    Scale shape: the assignment is the certified broadcast-centroid
    cross (corpus never shuffles to assign); the mean recompute is a
    posexplode (x EMB_DIM) into ONE (cell, dim)-keyed hash-aggregate
    with map-side partials and a bounded n_cells x EMB_DIM output —
    the only shuffle carries 1024 partial rows per map task. Overflow:
    sum_micros is bounded by |members| x max|x| x 1e6 ~ 1e13 per cell
    at the fixture's value range, 5 orders under BIGINT (and ANSI mode
    raises rather than wraps)."""
    assigned, _ = ivf_assign(emb, vec_col)
    micros = F.expr(
        "CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)")
    return (assigned
            .select("cell_id", F.posexplode(vec_col).alias("dim_id", "x"))
            .groupBy("cell_id", F.col("dim_id").cast("long").alias("dim_id"))
            .agg(F.sum(micros).alias("sum_micros"),
                 F.count(F.lit(1)).alias("n_members"))
            .select("cell_id", "dim_id", "sum_micros", "n_members"))


def r19_similarity_kmeans_refine_oracle() -> str:
    """DuckDB oracle: the certified IVF assignment CTEs, then the
    identical per-dimension half-up integer-micros sum — exact BIGINT
    arithmetic end to end, no float accumulation on either engine."""
    return f"""
    {_DUCK_IVF_ANN},
    mem AS (
      SELECT a.cell_id, e.embedding
      FROM assigned a JOIN embeddings e USING (vec_id)
    ),
    d AS (
      SELECT cell_id, s.dim_id,
             CAST(FLOOR(CAST(embedding[s.dim_id + 1] AS DOUBLE)
                        * 1000000 + 0.5) AS BIGINT) AS m
      FROM mem, (SELECT unnest(range(0, {EMB_DIM})) AS dim_id) s
    )
    SELECT cell_id, dim_id, CAST(SUM(m) AS BIGINT) AS sum_micros,
           CAST(COUNT(*) AS BIGINT) AS n_members
    FROM d GROUP BY cell_id, dim_id
    """


def similarity_kmeans_refine_core(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """The future `similarity_kmeans_refine` registry callable
    (deferred to r19)."""
    return kmeans_refine(load_table(spark, sf_dir, "embeddings"))
