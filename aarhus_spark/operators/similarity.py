"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline, plus a
sign-LSH-bucketed variant as the scale path (candidates restricted to
one hash bucket before exact rerank). Dot products run JVM-side via
``zip_with`` + ``aggregate`` higher-order functions — no Python on the
per-pair hot path. Anchor vectors for the LSH hyperplanes are rows of
the table itself (deterministic, no shared RNG needed — which also
makes the DuckDB oracle twin exact).

Scale: brute-force is O(N·Q) dot products — fine for Q queries
against any N since it is a broadcast of Q query vectors over a scan;
the LSH variant turns candidate generation into an equi-join on
bucket signature (shuffle keyed by ≤2^n_anchors values; at web scale
raise n_anchors so buckets stay ~uniform)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: str, b: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with(CAST({a} AS ARRAY<DOUBLE>), CAST({b} AS ARRAY<DOUBLE>), "
        f"(x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")


def _norm(a: str) -> F.Column:
    return F.sqrt(F.expr(
        f"aggregate(transform(CAST({a} AS ARRAY<DOUBLE>), x -> x * x), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"))


def cosine_topk(emb: DataFrame, query_ids: list[int], k: int = 10) -> DataFrame:
    """Exact brute-force cosine top-k per query vector. The query side
    is tiny → broadcast; ranking is over ROUNDED similarity with vec_id
    tiebreak (deterministic + oracle-stable)."""
    q = (emb.filter(F.col("vec_id").isin(query_ids))
         .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")))
    pairs = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("cos_r", F.round(
            _dot("embedding", "qv") / (_norm("embedding") * _norm("qv")), 6))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_r"), F.asc("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vec_id", "cos_r")
    )


def sign_lsh_buckets(emb: DataFrame, anchor_ids: list[int]) -> DataFrame:
    """Assign each vector a bucket = sign bits of its dot products with
    the anchor vectors. Returns (vec_id, embedding, bucket).

    Each anchor's bit position is its DENSE RANK among the anchors (its
    index in sorted(anchor_ids)) — never a function of the raw id: an
    ``aid % 32`` scheme silently aliases two anchors onto one bit as
    soon as ids collide mod 32, corrupting every bucket."""
    if len(anchor_ids) > 62:
        raise ValueError("sign-LSH bucket is a single BIGINT: ≤ 62 anchors")
    bitpos = {aid: i for i, aid in enumerate(sorted(set(anchor_ids)))}
    pos_map = F.create_map(
        *[F.lit(v) for aid_i in bitpos.items() for v in aid_i])
    anchors = (emb.filter(F.col("vec_id").isin(anchor_ids))
               .select(F.col("vec_id").alias("aid"), F.col("embedding").alias("av"))
               .withColumn("bitpos", pos_map[F.col("aid")].cast("int")))
    bits = (
        emb.crossJoin(F.broadcast(anchors))
        .withColumn("bit", F.when(_dot("embedding", "av") > 0, 1).otherwise(0))
        .groupBy("vec_id")
        .agg(F.sum(F.expr("bit * shiftleft(CAST(1 AS BIGINT), bitpos)")).alias("bucket"))
    )
    return emb.join(bits, "vec_id")


def cosine_topk_lsh(emb: DataFrame, query_ids: list[int],
                    anchor_ids: list[int], k: int = 10,
                    max_bucket: int = 1024) -> DataFrame:
    """ANN: candidates = same sign-LSH bucket as the query, then exact
    cosine rerank. Approximate by design (bucket boundaries).

    Degenerate-bucket cap (the same failure mode MinHash-LSH dedup
    caps): boilerplate-heavy corpora collapse many vectors into few
    sign buckets, and the bucket equi-join then melts one task. The
    CANDIDATE side keeps only the ``max_bucket`` lowest-vec_id members
    per bucket (deterministic, mirrored in the DuckDB twin); the cap
    runs on narrow (vec_id, bucket) rows so the window task never holds
    embeddings. Queries are never dropped — only their candidate pool
    is bounded (recall trades against task size, as any ANN probe-limit
    does; raise n_anchors so buckets stay small before leaning on the
    cap)."""
    bucketed = sign_lsh_buckets(emb, anchor_ids)
    q = (bucketed.filter(F.col("vec_id").isin(query_ids))
         .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"),
                 F.col("bucket").alias("qb")))
    wb = Window.partitionBy("bucket").orderBy("vec_id")
    keep = (bucketed.select("vec_id", "bucket")
            .withColumn("__br", F.row_number().over(wb))
            .filter(F.col("__br") <= max_bucket).select("vec_id"))
    capped = bucketed.join(keep, "vec_id", "left_semi")
    cand = (
        capped.join(F.broadcast(q), F.col("bucket") == F.col("qb"))
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("cos_r", F.round(
            _dot("embedding", "qv") / (_norm("embedding") * _norm("qv")), 6))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_r"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vec_id", "cos_r")
    )


def ivf_assign(emb: DataFrame, centroid_ids: list[int]) -> DataFrame:
    """IVF cell assignment: each vector joins the cell of its most-
    similar centroid (rounded cosine, centroid-id tiebreak). Centroids
    are rows of the table itself (deterministic — no RNG/k-means state
    to share with the DuckDB twin; at web scale, seed them from a
    k-means|| sample instead and keep everything downstream unchanged).

    Shape: ONE broadcast cross join (N·n_centroids narrow rows) + one
    hash agg (max_by via struct max) — no windows over unbounded
    partitions, no shuffle of embeddings beyond the final vec_id join."""
    cents = (emb.filter(F.col("vec_id").isin(centroid_ids))
             .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")))
    scored = (
        emb.select("vec_id", "embedding").crossJoin(F.broadcast(cents))
        .withColumn("sim_r", F.round(
            _dot("embedding", "cv") / (_norm("embedding") * _norm("cv")), 6))
    )
    # argmax(sim_r) with smallest-cid tiebreak, as one agg: max of
    # struct(sim_r, -cid) picks highest sim, then smallest cid
    best = (scored.groupBy("vec_id")
            .agg(F.max(F.struct(F.col("sim_r"), (-F.col("cid")).alias("ncid"))).alias("b"))
            .select("vec_id", (-F.col("b.ncid")).cast("long").alias("cid")))
    return emb.join(best, "vec_id")


def cosine_topk_ivf(emb: DataFrame, query_ids: list[int],
                    centroid_ids: list[int], k: int = 10,
                    nprobe: int = 2) -> DataFrame:
    """ANN, IVF flavor (the other scale path besides sign-LSH): probe
    the ``nprobe`` cells whose centroids are most similar to the query,
    exact-rerank inside them. Candidate generation is an equi-join on
    cell id — shuffle keyed by n_centroids values; raise n_centroids
    (and nprobe) as N grows to keep cells ~N/n_centroids."""
    assigned = ivf_assign(emb, centroid_ids)
    cents = (emb.filter(F.col("vec_id").isin(centroid_ids))
             .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")))
    q = (emb.filter(F.col("vec_id").isin(query_ids))
         .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")))
    wp = Window.partitionBy("qid").orderBy(F.desc("sim_r"), F.asc("cid"))
    qprobe = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("sim_r", F.round(
            _dot("qv", "cv") / (_norm("qv") * _norm("cv")), 6))
        .withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") <= nprobe)
        .select("qid", "qv", "cid")
    )
    cand = (
        assigned.join(F.broadcast(qprobe), "cid")
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("cos_r", F.round(
            _dot("embedding", "qv") / (_norm("embedding") * _norm("qv")), 6))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_r"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vec_id", "cos_r")
    )


def embedding_near_dup_pairs(emb: DataFrame, max_vec_id: int, top_n: int = 20,
                             n_groups: int = 32) -> DataFrame:
    """Embedding-cosine near-duplicate detection: top-N most-similar
    pairs among vec_id < max_vec_id (bounded all-pairs; at scale the
    LSH bucketing above generates candidates instead).

    Top-N is two-stage so no unbounded single-partition sort exists:
    per-group top-N under a PARTITIONED window (group = va mod
    n_groups), then a global re-rank over ≤ n_groups·top_n survivors —
    the Q6 merge shape. Result identical to a global window (any pair
    in the global top-N is in its group's top-N)."""
    e = emb.filter(F.col("vec_id") < max_vec_id)
    a = e.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
    pairs = (
        a.crossJoin(b).filter(F.col("va") < F.col("vb"))
        .withColumn("cos_r", F.round(
            _dot("ea", "eb") / (_norm("ea") * _norm("eb")), 6))
    )
    order = (F.desc("cos_r"), F.asc("va"), F.asc("vb"))
    w_local = Window.partitionBy(F.pmod(F.col("va"), F.lit(n_groups))).orderBy(*order)
    local = (pairs.withColumn("r_local", F.row_number().over(w_local))
             .filter(F.col("r_local") <= top_n))
    w_global = Window.orderBy(*order)  # ≤ n_groups·top_n rows: tiny merge
    return (
        local.withColumn("rank", F.row_number().over(w_global).cast("long"))
        .filter(F.col("rank") <= top_n)
        .select("rank", "va", "vb", "cos_r")
    )
