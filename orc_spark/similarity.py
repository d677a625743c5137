"""Embedding similarity search over the `embeddings` table
(vec_id bigint, embedding array<float>, label int).

- Brute-force cosine top-k: the exactness baseline. Queries are broadcast
  (tiny side of the join), candidates stream — at 100 TB this is one scan of
  the corpus per query batch with no shuffle of the big side.
- Random-hyperplane LSH buckets: the scale path. Each vector maps to a
  `planes`-bit bucket in one narrow pass; ANN candidate generation is then a
  per-bucket join (like MinHash banding in textops.py).

Numerics are left-fold dot products over float→double casts — bit-exactly
reproducible in the DuckDB oracle (list_reduce over the same order), so the
correctness gate checks VALUES, not just shapes. All JVM-side higher-order
functions (zip_with/aggregate); hyperplane signs come from md5 bits
(hashlib in Python == md5() in SQL), no RNG.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, functions as F

EMB_DIM = 64
N_PLANES = 8


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    """Left-fold Σ a[i]*b[i] in double — order-deterministic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def topk_cosine(
    spark: SparkSession, sf_dir: str, k: int = 5, n_queries: int = 10
) -> DataFrame:
    """Exact cosine top-k of every corpus vector for each query vector
    (vec_id < n_queries), self excluded. Plan: broadcast the query side,
    scan candidates once, per-query top-k via window over a tiny result."""
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv"))
    sims = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            # floor(sim*1e6) BIGINT: the fold/sqrt/divide chain is
            # bit-identical in the DuckDB oracle, and floor (unlike round)
            # has no cross-engine tie-breaking hazard.
            F.floor(
                _dot(F.col("qv"), F.col("cv"))
                / (
                    F.sqrt(_dot(F.col("qv"), F.col("qv")))
                    * F.sqrt(_dot(F.col("cv"), F.col("cv")))
                )
                * 1_000_000
            )
            .cast("long")
            .alias("sim_f6"),
        )
    )
    from pyspark.sql.window import Window

    # the row_number()<=k filter triggers Spark's WindowGroupLimit rewrite:
    # a PARTIAL top-k runs per input partition BEFORE the exchange, so the
    # final window receives O(n_input_parts × k) rows per query instead of
    # the full sim table on n_queries tasks — the skew-safe top-k at scale.
    # test_plans.py asserts the Partial WindowGroupLimit is in the plan.
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_f6").desc(), F.col("cand_id").asc()
    )
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "cand_id", "sim_f6", "rnk")
    )


def plane_weights(planes: int = N_PLANES, dim: int = EMB_DIM) -> list[list[float]]:
    """Deterministic ±1 hyperplanes: sign(p,d) from bit 0 of the 48-bit md5
    prefix of 'p|d'. Identical to the SQL md5 the oracle computes."""
    out = []
    for p in range(planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{p}|{d}".encode()).hexdigest()[:12], 16)
            row.append(1.0 if h % 2 == 1 else -1.0)
        out.append(row)
    return out


def _bucket_col(planes: int):
    """bucket = Σ_p [dot(embedding, w_p) > 0] << p — hyperplane weights are
    plan literals, so the assignment is one narrow JVM pass."""
    ws = plane_weights(planes)
    bucket = None
    for p, row in enumerate(ws):
        wcol = F.array(*[F.lit(x) for x in row])
        bit = F.when(_dot(F.col("embedding"), wcol) > 0, F.lit(1 << p)).otherwise(
            F.lit(0)
        )
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("long")


def lsh_buckets(
    spark: SparkSession, sf_dir: str, planes: int = N_PLANES
) -> DataFrame:
    """Random-hyperplane LSH: one narrow pass over the corpus, then a
    map-side-combined groupBy on the bucket id."""
    return (
        _emb(spark, sf_dir)
        .select(F.col("vec_id"), _bucket_col(planes).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"), F.min("vec_id").alias("min_vec_id"))
    )


N_IVF_LISTS = 16


def ivf_assign(
    spark: SparkSession, sf_dir: str, n_lists: int = N_IVF_LISTS
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest centroid.
    Centroids are the vectors with vec_id < n_lists (deterministic seeds — a
    production index would Lloyd-iterate them; assignment mechanics and the
    inverted-list statistics are identical). Plan: broadcast the centroid
    table, one scan of the corpus, argmin via window over a tiny per-vector
    candidate set. At 100 TB this is the standard ANN sharding pass: the
    list id becomes the partition key and probes touch nprobe lists only."""
    emb = _emb(spark, sf_dir)
    cents = emb.where(F.col("vec_id") < n_lists).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    # squared L2 distance, left-fold (oracle-exact): |v|^2 - 2 v.c + |c|^2
    d2 = (
        _dot(F.col("embedding"), F.col("embedding"))
        - 2 * _dot(F.col("embedding"), F.col("cv"))
        + _dot(F.col("cv"), F.col("cv"))
    )
    # argmin as a map-side-combinable AGGREGATE — no per-vec_id sort, no
    # 16×-the-corpus window shuffle: partial aggregation reduces each
    # partition to one candidate per vec_id before the exchange. (d2, cid)
    # packs into one BIGINT (both non-negative, cid < n_lists) so the min is
    # a plain HashAggregate — a struct-min would fall back to SortAggregate;
    # min(d2*n + cid) ties on the smaller cid, identical to the oracle's
    # row_number ordering.
    packed = (F.floor(d2 * 1_000_000).cast("long") * n_lists + F.col("cid")).alias("p")
    scored = emb.crossJoin(F.broadcast(cents)).select("vec_id", packed)
    best = scored.groupBy("vec_id").agg(F.min("p").alias("b"))
    return best.select(
        "vec_id",
        F.pmod(F.col("b"), F.lit(n_lists)).cast("bigint").alias("list_id"),
        # floor division, not a truncating cast: FP cancellation can make the
        # near-duplicate d2 floor to -1, so packed b can be negative and the
        # oracle's floor semantics must be preserved (|b| << 2^53, so the
        # double division is exact before the floor)
        F.floor(F.col("b") / n_lists).cast("long").alias("d2_f6"),
    )


def ivf_list_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-list occupancy — the balance check that decides whether the
    coarse quantizer needs re-training (skewed lists = hot partitions)."""
    return (
        ivf_assign(spark, sf_dir)
        .groupBy("list_id")
        .agg(F.count("*").alias("n_vecs"), F.min("vec_id").alias("min_vec_id"))
    )


def embedding_dup_pairs(
    spark: SparkSession,
    sf_dir: str,
    min_sim_f6: int = 990_000,
    max_rows: int = 100_000,
    allow_quadratic: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a < b) with cosine
    similarity >= threshold. Exact all-pairs — the small-scale oracle; the
    scale path is `lsh_refined_pairs` (LSH buckets → exact refine within
    buckets). Same left-fold numerics as topk_cosine (oracle-exact).

    The default threshold is a true NEAR-DUP bar (0.99). The driver fixture
    is random vectors (max pairwise cosine ≈ 0.51 at sf0.01 / 0.60 at
    sf0.1), so the correctness-gate registration passes a calibrated
    0.40 explicitly — that selects the top ~59 pairs at sf0.01 / ~920 at
    sf0.1 and keeps the gate comparing real rows — without silently
    loosening what "near-duplicate" means for an API caller.

    Guarded: O(n²) work refuses inputs past `max_rows` unless the caller
    passes `allow_quadratic=True` — nothing stops this query being pointed
    at a big table otherwise, and the failure mode (a 10^18-pair θ-join)
    would take down a cluster, not just a laptop."""
    emb = _emb(spark, sf_dir)
    if not allow_quadratic:
        n = emb.count()
        if n > max_rows:
            raise ValueError(
                f"embedding_dup_pairs is an exact all-pairs O(n²) oracle; "
                f"input has {n} vectors > max_rows={max_rows}. Use "
                f"lsh_refined_pairs (bucketed, scale-safe) or pass "
                f"allow_quadratic=True if the quadratic cost is intended."
            )
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.floor(
                _dot(F.col("va"), F.col("vb"))
                / (
                    F.sqrt(_dot(F.col("va"), F.col("va")))
                    * F.sqrt(_dot(F.col("vb"), F.col("vb")))
                )
                * 1_000_000
            )
            .cast("long")
            .alias("sim_f6"),
        )
        .where(F.col("sim_f6") >= min_sim_f6)
    )


def lsh_refined_pairs(
    spark: SparkSession,
    sf_dir: str,
    planes: int = N_PLANES,
    min_sim_f6: int = 990_000,
) -> DataFrame:
    """The 100-TB near-duplicate path, end to end: LSH bucket assignment →
    per-bucket candidate join → EXACT cosine refine within the bucket. This
    is the scale-safe composition that `embedding_dup_pairs` (all-pairs
    oracle) documents in prose — here it is a single gated query.

    Plan shape: one narrow pass computes each vector's bucket and carries the
    embedding alongside it, so the refine needs NO join back to the corpus —
    the bucket self-join's two sides already hold both vectors. Work is
    Σ_buckets |bucket|², never |corpus|²; bucket count 2^planes is the skew
    knob. Recall is that of one LSH band (raise via multiple plane sets
    OR-ed, exactly like MinHash banding); precision is exact — the refine
    uses the same left-fold cosine numerics as topk_cosine (oracle-exact).

    Like embedding_dup_pairs, the API default is a true near-dup bar (0.99);
    the correctness-gate registration passes a fixture-calibrated 0.20
    explicitly (random vectors, bucket-mates' cosine tops out ≈ 0.46 at
    sf0.01) so the gate compares ~78 real refined pairs, not an empty set."""
    b = _emb(spark, sf_dir).select(
        "vec_id", "embedding", _bucket_col(planes).alias("bucket")
    )
    a = b.select(
        "bucket", F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")
    )
    c = b.select(
        "bucket", F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb")
    )
    return (
        a.join(c, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.floor(
                _dot(F.col("va"), F.col("vb"))
                / (
                    F.sqrt(_dot(F.col("va"), F.col("va")))
                    * F.sqrt(_dot(F.col("vb"), F.col("vb")))
                )
                * 1_000_000
            )
            .cast("long")
            .alias("sim_f6"),
        )
        .where(F.col("sim_f6") >= min_sim_f6)
    )


def lsh_ann_candidates(
    spark: SparkSession, sf_dir: str, planes: int = N_PLANES
) -> DataFrame:
    """ANN candidate pairs = vectors sharing an LSH bucket (per-bucket join,
    never all-pairs). Refine with exact cosine downstream."""
    b = _emb(spark, sf_dir).select("vec_id", _bucket_col(planes).alias("bucket"))
    return (
        b.alias("a")
        .join(b.alias("b"), "bucket")
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            "bucket",
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
        )
    )


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar int8 quantization of the embedding column — the engine's
    lightweight-compression idea applied to vectors (4x smaller storage for
    ANN candidate stages). Per-vector max-abs scale; q_i = floor(x_i/s*127
    + 0.5) in [-127, 127]; reports the scale and the max absolute
    dequantization error per vector, both as floor(x*1e6) BIGINT.

    All JVM higher-order functions over float->double casts with
    order-deterministic folds, so the DuckDB oracle reproduces every value
    bit-exactly: one narrow pass, no shuffle, no UDFs."""
    emb = _emb(spark, sf_dir)
    x = F.transform("embedding", lambda v: v.cast("double"))
    s = F.aggregate(
        x, F.lit(0.0).cast("double"), lambda acc, v: F.greatest(acc, F.abs(v))
    )
    d = emb.select("vec_id", x.alias("x"), s.alias("s"))
    q = F.transform(
        "x", lambda v: F.floor(v / F.col("s") * 127 + F.lit(0.5)).cast("int")
    )
    d = d.select("vec_id", "x", "s", q.alias("q"))
    err = F.aggregate(
        F.zip_with(
            "x",
            "q",
            lambda xv, qv: F.abs(qv.cast("double") * F.col("s") / 127 - xv),
        ),
        F.lit(0.0).cast("double"),
        lambda acc, v: F.greatest(acc, v),
    )
    return d.select(
        "vec_id",
        F.floor(F.col("s") * 1_000_000).cast("long").alias("scale_f6"),
        F.aggregate(
            "q", F.lit(0).cast("long"), lambda acc, v: acc + F.abs(v)
        ).alias("q_l1"),
        F.floor(err * 1_000_000).cast("long").alias("max_err_f6"),
    )


def ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    n_queries: int = 10,
    n_lists: int = N_IVF_LISTS,
    nprobe: int = 4,
) -> DataFrame:
    """IVF ANN SEARCH — the scale path topk_cosine is the exact baseline
    for: rank the centroids per query, probe only the `nprobe` nearest
    inverted lists, exact-cosine refine within them, top-k. Work per query
    is O(nprobe/n_lists) of the corpus instead of all of it.

    Plan shape at 100 TB: the assignment join is the stored IVF index (here
    re-derived via ivf_assign — one broadcast pass + a map-side-combined
    argmin — then one shuffle on vec_id to attach vectors; a production
    index persists list_id as a column, making that join free). The probe
    table (n_queries x nprobe rows, query vector attached) BROADCASTS to
    the corpus join on list_id, so the search itself never shuffles the
    corpus; the final top-k uses the same partial WindowGroupLimit shape as
    topk_cosine. Same floor/fold numeric discipline as ivf_assign +
    topk_cosine, so the DuckDB oracle reproduces every value bit-exactly
    (IVF recall loss vs the exact baseline is deterministic and identical
    in both engines)."""
    emb = _emb(spark, sf_dir)
    corpus = emb.join(ivf_assign(spark, sf_dir, n_lists).select("vec_id", "list_id"), "vec_id")
    probes = _ivf_probes(emb, n_queries, n_lists, nprobe)
    return _ivf_refine_topk(corpus, probes, k)


def _ivf_probes(emb: DataFrame, n_queries: int, n_lists: int, nprobe: int) -> DataFrame:
    """Per query (vec_id < n_queries): the `nprobe` nearest centroids'
    list ids, query vector attached — (query_id, qv, list_id). Tiny
    (n_queries x nprobe rows); callers broadcast it."""
    from pyspark.sql.window import Window

    q = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    cents = emb.where(F.col("vec_id") < n_lists).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    d2 = (
        _dot(F.col("qv"), F.col("qv"))
        - 2 * _dot(F.col("qv"), F.col("cv"))
        + _dot(F.col("cv"), F.col("cv"))
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("d2_f6").asc(), F.col("cid").asc()
    )
    return (
        q.crossJoin(F.broadcast(cents))
        .select(
            "query_id", "qv", "cid",
            F.floor(d2 * 1_000_000).cast("long").alias("d2_f6"),
        )
        .withColumn("pr", F.row_number().over(wp))
        .where(F.col("pr") <= nprobe)
        .select("query_id", "qv", F.col("cid").alias("list_id"))
    )


def _ivf_refine_topk(corpus: DataFrame, probes: DataFrame, k: int) -> DataFrame:
    """Exact-cosine refine inside the probed lists only, then per-query
    top-k: corpus (list_id, vec_id, embedding) joins the BROADCAST probe
    table on list_id — the corpus never shuffles — and the final top-k is
    the partial WindowGroupLimit shape topk_cosine uses."""
    from pyspark.sql.window import Window

    sims = (
        corpus.join(F.broadcast(probes), "list_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            F.floor(
                _dot(F.col("qv"), F.col("embedding"))
                / (
                    F.sqrt(_dot(F.col("qv"), F.col("qv")))
                    * F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
                )
                * 1_000_000
            )
            .cast("long")
            .alias("sim_f6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_f6").desc(), F.col("cand_id").asc()
    )
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "cand_id", "sim_f6", "rnk")
    )


def ivf_topk_warehouse(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    n_queries: int = 5,
    n_lists: int = N_IVF_LISTS,
    nprobe: int = 2,
) -> DataFrame:
    """IVF ANN search over a PERSISTED index — the production design
    ivf_topk's docstring names: the corpus is encoded into the warehouse
    with list_id as the partition-key layout (source_col), so the probe
    read pushes an IN-set of the probed lists through decode_table's
    file-level partition-key pruning — files outside the probed lists are
    NEVER OPENED (asserted via prune metrics), no assignment join at query
    time. The refine + top-k inside the probed lists is byte-identical to
    ivf_topk's (_ivf_refine_topk over decoded vectors — the float codec
    round-trip is bit-exact, so the DuckDB oracle is the same IVF query).

    At 100 TB: build once (ivf_assign + encode_table = the index build),
    then every query batch reads only nprobe/n_lists of the files — the
    tokstripe layout IS the inverted-list structure."""
    import shutil
    import tempfile

    from .pipeline import decode_table, encode_table

    emb = _emb(spark, sf_dir)
    # index build: assignment persisted as the partition key (zero-padded
    # string so the pid prefix orders like the int list id)
    # 6-digit pad keeps lexicographic pid order == int order (and the parse
    # below correct) up to 1M lists; substring(2) reads whatever width
    lid = F.format_string("l%06d", F.col("list_id"))
    corpus = emb.join(
        ivf_assign(spark, sf_dir, n_lists).select("vec_id", "list_id"), "vec_id"
    ).select("vec_id", "embedding", lid.alias("lid"))
    probes = _ivf_probes(emb, n_queries, n_lists, nprobe)
    wh = tempfile.mkdtemp(prefix="orc_spark_ivfwh_")
    try:
        encode_table(
            spark, corpus, wh, snapshot="gate_ivf_index",
            key_col="vec_id", source_col="lid", weight_col=None,
            salt_buckets=2, stripe_tokens=2_000,
        )
        # probe set: O(n_queries * nprobe) driver-side rows — the IN-set
        # that prunes the scan to the probed lists' files only
        probed = sorted(
            {f"l{r['list_id']:06d}" for r in probes.select("list_id").collect()}
        )
        metrics: dict = {}
        dec = decode_table(
            spark, wh, "gate_ivf_index",
            predicate=("lid", probed), prune_metrics=metrics,
        )
        got = dec.withColumn(
            "list_id", F.expr("substring(lid, 2)").cast("bigint")
        ).select("list_id", "vec_id", "embedding")
        out = _ivf_refine_topk(got, probes, k)
        out = spark.createDataFrame(out.collect(), out.schema)
        if not metrics.get("files_pruned"):
            raise AssertionError(
                f"probed-list file pruning did not fire: {metrics}"
            )
        return out
    finally:
        shutil.rmtree(wh, ignore_errors=True)
