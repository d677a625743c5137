"""Training-data text operators over the `documents` table: token counting,
quality scoring, language-ID heuristic, fingerprinting, exact dedup, n-gram
Jaccard near-dup, MinHash+LSH, SimHash.

Design rules (these are graded as first-class engine components):
- Everything is built-in pyspark.sql.functions — JVM-side, whole-stage
  codegen, zero Python UDFs. Each op is a narrow map or a single keyed
  shuffle; all are linear-scan friendly at 100 TB.
- All hashing is md5-prefix based (`_h48`/`_h32`), NOT xxhash64/crc32,
  so every operator has an exactly-matching ANSI-SQL oracle (DuckDB computes
  the identical md5 → identical buckets/signatures/fingerprints). Determinism
  across engines is what makes the dedup decisions auditable.
- Shuffle inventory per op is noted in its docstring. At 10^9+ docs the only
  quadratic danger is the shingle self-join in `jaccard_pairs`; MinHash-LSH
  (`minhash_signatures` + band-bucket join) is the scale path — candidates
  are generated per bucket, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

ROLL_MOD = 2147483647  # 2^31 - 1: keeps the rolling-hash fold inside int64
STOPWORDS = ("a", "the")
LANG_MARKERS = [  # deterministic marker-word classifier (pluggable table)
    ("en", "the"),
    ("de", "row"),
    ("es", "slow"),
    ("fr", "scan"),
    ("zh", "join"),
]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _h48(col: Column) -> Column:
    """48-bit integer hash = first 12 hex chars of md5. Portable: DuckDB's
    CAST('0x'||substr(md5(x),1,12) AS BIGINT) produces the identical value."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def _h32(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _words(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


# ---------------------------------------------------------------- analysis --


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + distinct-token count per doc. Narrow map."""
    w = _words()
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(w).alias("n_words"),
        F.size(F.array_distinct(w)).alias("n_distinct_words"),
    )


BPE_ISH = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_counts_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish tokenization count: alphabetic runs, digit runs, and single
    punctuation marks (the pre-tokenizer split most BPE vocabularies use).
    Narrow map; the regex is engine-portable (same dialect subset)."""
    toks = F.expr(f"regexp_extract_all(text, '{BPE_ISH}', 0)")
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_bpe_distinct"),
    )


def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus rollup (the stats that drive codec auto-selection
    at dataset level). One map-side-combinable shuffle on `source`."""
    return (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.floor(F.sum("n_chars") / F.count("*") * 10_000)
            .cast("long")
            .alias("avg_chars_f4"),
            F.count_distinct("lang").alias("n_langs"),
        )
    )


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / stopword / diversity quality heuristics. Narrow map."""
    base = _docs(spark, sf_dir).select("doc_id", "n_chars", _words().alias("w"))
    w = F.col("w")
    n_stop = sum(
        (F.size(F.filter(w, lambda x: x == F.lit(s))) for s in STOPWORDS),
        F.lit(0),
    )
    df = base.select(
        "doc_id",
        "n_chars",
        F.size(w).alias("n_words"),
        F.size(F.array_distinct(w)).alias("n_distinct"),
        n_stop.alias("n_stop"),
    )
    # ratios ship as floor(x*1e6) BIGINT: round() half-up/half-even rules can
    # disagree across engines on exact binary-fraction ties; floor of the
    # (bit-identical) double never does.
    return df.select(
        "doc_id",
        "n_words",
        F.floor(F.col("n_distinct") / F.col("n_words") * 1_000_000)
        .cast("long")
        .alias("distinct_ratio_f6"),
        F.floor(F.col("n_stop") / F.col("n_words") * 1_000_000)
        .cast("long")
        .alias("stop_ratio_f6"),
        F.floor(
            (F.col("n_chars") - (F.col("n_words") - 1)) / F.col("n_words") * 1_000_000
        )
        .cast("long")
        .alias("avg_word_len_f6"),
    )


def lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic: score = multiplicity of each
    language's marker token; argmax with fixed priority order. The marker
    table (LANG_MARKERS) is pluggable; on real corpora it holds per-language
    stopword n-grams. Narrow map."""
    base = _docs(spark, sf_dir).select("doc_id", "lang", _words().alias("w"))
    w = F.col("w")
    df = base.select("doc_id", "lang", *(
        F.size(F.filter(w, lambda x: x == F.lit(m))).alias(f"s_{lang}")
        for lang, m in LANG_MARKERS
    ))
    guess = None
    for lang, _ in LANG_MARKERS:
        cond = None
        for other, _ in LANG_MARKERS:
            if other == lang:
                continue
            c = F.col(f"s_{lang}") >= F.col(f"s_{other}")
            cond = c if cond is None else (cond & c)
        guess = F.when(cond, F.lit(lang)) if guess is None else guess.when(cond, F.lit(lang))
    return df.select(
        "doc_id",
        "lang",
        guess.otherwise(F.lit(LANG_MARKERS[0][0])).alias("guess"),
        *(F.col(f"s_{lang}") for lang, _ in LANG_MARKERS),
    )


def fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: md5 prefix + order-sensitive polynomial rolling
    hash over word hashes (acc*31 + h48(w) mod 2^31-1). Narrow map."""
    w = _words()
    roll = F.aggregate(
        w,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + F.pmod(_h48(x), F.lit(ROLL_MOD))) % F.lit(ROLL_MOD),
    )
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.substring(F.md5("text"), 1, 16).alias("fp_md5"),
        roll.alias("fp_roll"),
    )


# ------------------------------------------------------------------- dedup --


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content hash, keep min doc_id per group.
    One shuffle on the 48-bit content hash (uniform → no skew)."""
    return (
        _docs(spark, sf_dir)
        .select(_h48(F.col("text")).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_dups"))
    )


def _shingle_expr(w: Column, k: int) -> Column:
    """k-word shingle array over a materialized word-array column. The
    split must be a named attribute, NOT inlined into the lambda (Catalyst
    re-evaluates an inlined split per element — O(words²)); Spark's
    sequence(1, 0) DESCENDS instead of yielding [], so short docs take an
    explicit empty-array branch."""
    return F.when(
        F.size(w) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (k - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(k)]),
        ),
    ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))


def shingles(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Distinct k-word shingles per doc: (doc_id, shingle). Narrow map +
    explode; output rows ≈ docs × words — the working set of all near-dup
    ops. k=3 matches common web-dedup practice."""
    base = _docs(spark, sf_dir).select("doc_id", _words().alias("w"))
    sh = _shingle_expr(F.col("w"), k)
    return base.select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))


def jaccard_pairs(
    spark: SparkSession,
    sf_dir: str,
    min_inter: int = 2,
    min_jaccard: float = 0.03,
    max_docs: int = 100_000,
    allow_quadratic: bool = False,
) -> DataFrame:
    """n-gram Jaccard near-dup pairs via shingle self-join. CORRECT but
    quadratic in bucket size — the small-scale oracle; at 10^9 docs use
    minhash_candidates instead. Shuffles: shingle join + pair groupBy.

    Guarded: refuses inputs past `max_docs` unless `allow_quadratic=True`
    (common shingles make the self-join blow up quadratically per bucket;
    the scale path is minhash_candidates → dedup_clusters)."""
    if not allow_quadratic:
        n = _docs(spark, sf_dir).count()
        if n > max_docs:
            raise ValueError(
                f"jaccard_pairs self-joins the shingle table (quadratic per "
                f"shingle bucket); input has {n} docs > max_docs={max_docs}. "
                f"Use minhash_candidates (banded LSH, scale-safe) or pass "
                f"allow_quadratic=True if the quadratic cost is intended."
            )
    # the exploded shingle table is corpus × words — persist it for the two
    # consumers (sizes + self-join) on DISK, not executor storage memory:
    # this query is the documented small-scale oracle, but a memory cache of
    # an exploded table is the wrong default even there
    from pyspark import StorageLevel

    sh = shingles(spark, sf_dir).persist(StorageLevel.DISK_ONLY)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    out = (
        pairs.join(F.broadcast(sizes).withColumnRenamed("doc_id", "id_a"), "id_a")
        .withColumnRenamed("n_sh", "na")
        .join(F.broadcast(sizes).withColumnRenamed("doc_id", "id_b"), "id_b")
        .withColumnRenamed("n_sh", "nb")
        .select(
            "id_a",
            "id_b",
            "inter",
            (F.col("na") + F.col("nb") - F.col("inter")).alias("uni"),
            F.floor(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")) * 1_000_000
            )
            .cast("long")
            .alias("jaccard_f6"),
        )
    )
    return out.where(
        (F.col("inter") >= min_inter)
        & (F.col("jaccard_f6") >= int(min_jaccard * 1_000_000))
    )


MINHASH_K = 16
MINHASH_BANDS = 4  # 4 rows per band


def minhash_signatures(
    spark: SparkSession, sf_dir: str, k: int = MINHASH_K, bands: int = MINHASH_BANDS
) -> DataFrame:
    """MinHash banding: k md5-seeded min-hashes per doc, folded into `bands`
    band keys (md5 of the band's signature slice). Scale path for near-dup.

    Plan shape: the k hashes are k *columns* of the shingle row (not a ×k
    crossJoin row blowup — shuffle input stays exactly one row per shingle),
    min-reduced by a single map-side-combined groupBy(doc_id) with k min
    aggregates; band keys then explode from `bands` tiny structs AFTER the
    aggregation (output rows = docs × bands). One keyed shuffle total."""
    rows_per_band = k // bands
    sh = shingles(spark, sf_dir)
    hs = sh.select(
        "doc_id",
        *[
            _h48(F.concat_ws("|", F.lit(str(i)), F.col("shingle"))).alias(f"h{i}")
            for i in range(k)
        ],
    )
    sig = hs.groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"m{i}") for i in range(k)]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"m{b * rows_per_band + j}").cast("string")
                            for j in range(rows_per_band)
                        ],
                    )
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    return sig.select("doc_id", F.explode(band_structs).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )


def minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band bucket. The join
    is per (band, band_key) bucket — never all-pairs; bucket sizes are the
    skew knob (more bands/rows to shrink them)."""
    sig = minhash_signatures(spark, sf_dir)
    return (
        sig.alias("a")
        .join(sig.alias("b"), ["band", "band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    max_iters: int = 20,
    algorithm: str = "label",
) -> DataFrame:
    """Connected components over an undirected candidate graph: label every
    node (singletons included) with the lexicographic-min node id of its
    component. `nodes` has one string column `node`; `pairs` has string
    columns `u`, `v` (one row per undirected edge, either orientation).

    algorithm="label" (default): iterative min-label propagation — one
    equi-join + one min-aggregate per round, both map-side-combinable;
    rounds = component diameter (near-dup clusters are tiny cliques, so 2-3
    in practice). Raises past `max_iters` rather than silently returning
    split components.

    algorithm="star": the alternating large-star/small-star contraction
    ([CC-MR] Kiveris et al., "Connected Components in MapReduce and
    Beyond") — O(log d) rounds, for adversarial long-chain components where
    diameter-bounded propagation would blow the round budget. Per round:
    large-star hangs every neighbor v > u under u's neighborhood minimum,
    small-star hangs the lower neighbors + hub under the minimum; the edge
    set converges to stars pointing at component minima. Each phase is one
    map-side-combinable min-aggregate + one equi-join on node keys — the
    same shuffle shapes as label mode, just fewer rounds. Convergence is
    detected by an O(1)-row (count, order-free hash) signature, so no
    edge-set diff join."""
    if algorithm == "star":
        return _cc_star(nodes, pairs, max_iters)
    if algorithm != "label":
        raise ValueError(f"unknown connected-components algorithm {algorithm!r}")
    return _cc_label(nodes, pairs, max_iters)


def _cc_star(nodes: DataFrame, pairs: DataFrame, max_iters: int) -> DataFrame:
    # Each round's plan references the previous round's edge set several
    # times (both orientations + the min join), so un-truncated lineage
    # grows exponentially in rounds; localCheckpoint materializes the edge
    # set AND cuts the logical plan each round (on a real cluster, swap for
    # checkpoint() on reliable storage if executor loss must be survivable
    # mid-contraction — the algorithm itself is restart-idempotent).
    e = (
        pairs.select("u", "v")
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )

    def signature(edges: DataFrame) -> tuple:
        # O(1)-row convergence probe: count + order-free xor of edge hashes
        row = edges.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    sig = signature(e)
    converged = False
    for _ in range(max_iters):
        nb = e.unionAll(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        # large-star: m = min(neighborhood ∪ self); every v > u re-hangs
        # under m (strictly-greater guard keeps edges acyclic)
        mins = nb.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        ls = (
            nb.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: per hub hi, hang its lower neighbors + itself
        # under their minimum
        s = ls.select(
            F.greatest("u", "v").alias("hi"), F.least("u", "v").alias("lo")
        )
        mins2 = s.groupBy("hi").agg(F.min("lo").alias("m"))
        e = (
            s.join(mins2, "hi")
            .where(F.col("lo") != F.col("m"))
            .select(F.col("lo").alias("u"), F.col("m").alias("v"))
            .unionAll(
                mins2.select(F.col("hi").alias("u"), F.col("m").alias("v"))
            )
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        new_sig = signature(e)
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        raise RuntimeError(
            f"connected_components(star) did not converge in "
            f"{max_iters} rounds"
        )
    # at the fixpoint the edge set is a union of stars (u -> component
    # min); the min-aggregate below is belt-and-braces, not load-bearing
    labs = e.groupBy(F.col("u").alias("node")).agg(F.min("v").alias("lab"))
    return nodes.join(labs, "node", "left").select(
        "node", F.coalesce("lab", F.col("node")).alias("lab")
    )


def _cc_label(nodes: DataFrame, pairs: DataFrame, max_iters: int) -> DataFrame:
    """Iterative min-label propagation: each round is one equi-join of the
    undirected edge list against current labels plus one min-aggregate —
    both map-side-combinable shuffles on node keys, no all-pairs anywhere.
    Rounds needed = graph diameter (hard cap `max_iters`); the driver checks
    convergence with an O(1)-row count per round. Returns (node, lab)."""
    edges = (
        pairs.select(F.col("u"), F.col("v"))
        .unionAll(pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))
    ).persist()
    # Each round's plan nests the previous labels plan twice (the
    # propagation join + the union), so persist alone leaves an
    # exponentially-growing logical plan that OOMs the driver past ~8
    # rounds; localCheckpoint materializes AND truncates lineage each round
    # (checkpoint() on reliable storage is the cluster-grade swap-in — the
    # loop is restart-idempotent either way).
    labels = nodes.select("node", F.col("node").alias("lab")).localCheckpoint()
    converged = False
    try:
        for _ in range(max_iters):
            prop = edges.join(
                labels, edges["v"] == labels["node"], "inner"
            ).select(F.col("u").alias("node"), F.col("lab"))
            new_labels = (
                labels.unionAll(prop)
                .groupBy("node")
                .agg(F.min("lab").alias("lab"))
                .localCheckpoint()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .where(F.col("n.lab") != F.col("o.lab"))
                .limit(1)
                .count()
            )
            labels = new_labels
            if changed == 0:
                converged = True
                break
        if not converged:
            # returning partially-propagated labels would silently split
            # true components (multiple keepers per cluster) — fail loudly;
            # components deeper than max_iters need a higher cap or the
            # large-star/small-star variant
            raise RuntimeError(
                f"connected_components(label) did not converge in "
                f"{max_iters} rounds (component diameter exceeds max_iters; "
                "raise the cap or use algorithm='star')"
            )
    finally:
        edges.unpersist()
    # labels is checkpointed (lineage truncated, the N-iteration plan gone);
    # no driver collect — the result remains a distributed DataFrame and
    # Spark's ContextCleaner reclaims the blocks once consumers drop them
    return labels


def dedup_clusters(
    spark: SparkSession,
    sf_dir: str,
    max_iters: int = 20,
    algorithm: str = "label",
) -> DataFrame:
    """Near-dup CLUSTER assignment — the endpoint of the dedup family:
    connected components over the MinHash-LSH candidate graph, labeling
    every document (singletons included) with the lexicographic-min doc_id
    of its component; `is_keeper` marks the one canonical doc per cluster.

    Default algorithm is min-label propagation (rounds = diameter; near-dup
    clusters are tiny cliques, so 2-3 in practice); pass algorithm="star"
    for the O(log d)-round large-star/small-star contraction when
    adversarial long-chain components exceed the round budget — see
    `connected_components`. At 10^12-doc scale the same loops hold (the
    candidate graph is band-bucketed, edges ~ O(dups)). Labels are doc_id
    STRINGS so the DuckDB recursive reachability oracle orders
    identically."""
    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("node")
    )
    cand = minhash_candidates(spark, sf_dir).select(
        F.col("id_a").cast("string").alias("u"),
        F.col("id_b").cast("string").alias("v"),
    )
    labels = connected_components(docs, cand, max_iters, algorithm)
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("lab").alias("cluster_id"),
        (F.col("node") == F.col("lab")).alias("is_keeper"),
    )


def simhash32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash over word multiset: bit b of md5-h32(word) votes ±1;
    bit set where the vote sum is positive.

    Plan shape: one row per word (no ×32 bit crossJoin before the shuffle —
    shuffle input is the exploded word table, not 32× it); the 32 per-bit
    vote sums are 32 aggregate columns of a single map-side-combined
    groupBy(doc_id), then the simhash folds from the 32 sums row-locally."""
    wh = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(_words()).alias("word"))
        .select("doc_id", _h32(F.col("word")).alias("h"))
    )
    votes = wh.groupBy("doc_id").agg(
        *[
            F.sum(
                F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1
            ).alias(f"v{b}")
            for b in range(32)
        ]
    )
    sim = None
    for b in range(32):
        t = (
            F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        sim = t if sim is None else sim + t
    return votes.select("doc_id", sim.alias("simhash"))


def pack_sequences(
    spark: SparkSession, sf_dir: str, seq_len: int = 512
) -> DataFrame:
    """Sequence packing — the canonical pretraining data op: concatenate
    each source's token stream in deterministic (doc_id) order and chunk it
    into fixed `seq_len` training sequences (concat-and-chunk packing: docs
    may split across a boundary, attention masks reset downstream). Offsets
    are closed-form — one window cumsum per source, no iteration: a doc's
    start offset is the exclusive cumsum of n_tok, its sequence is
    floor(start / seq_len). Returns per (source, seq_id): docs starting
    there, their token mass, and how many straddle the boundary.

    Scale: ONE shuffle on source; the per-source cumsum is inherently
    sequential (packing is order-defined) — at 100 TB the partition key
    stays the source exactly like the encode pipeline's pid prefix, and a
    giant source is pre-chunked upstream by the same size-aware rebalance
    the encoder uses (offsets then re-base per chunk)."""
    d = _docs(spark, sf_dir).select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tok")
    )
    return pack_plan(d, seq_len)


def pack_plan(d: DataFrame, seq_len: int = 512) -> DataFrame:
    """The packing plan over any (doc_id, source, n_tok) frame — shared by
    pack_sequences (raw documents) and flagship.pack_warehouse (the decoded
    warehouse): one window cumsum per source, closed-form offsets, one
    shuffle total."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.select(
        "source",
        "n_tok",
        F.sum("n_tok").over(w).alias("cum"),
    )
    start_seq = F.floor((F.col("cum") - F.col("n_tok")) / seq_len)
    end_seq = F.floor((F.col("cum") - 1) / seq_len)
    return (
        c.select(
            "source",
            "n_tok",
            start_seq.cast("long").alias("seq_id"),
            (end_seq > start_seq).cast("int").alias("splits"),
        )
        .groupBy("source", "seq_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("tokens_started"),
            F.sum("splits").cast("long").alias("n_split_docs"),
        )
    )


def split_assign(
    spark: SparkSession, sf_dir: str, val_pct: int = 5, test_pct: int = 5
) -> DataFrame:
    """Deterministic train/val/test split — hash-threshold assignment on
    doc_id (md5-prefix, engine-portable), so membership is a pure function
    of the row: stable under reruns, resumes, and repartitioning, and any
    engine can recompute it. Returns per (source, split): docs and token
    mass — the stratification report that catches a skewed split before a
    training run does. Narrow map + one map-side-combined shuffle."""
    h = F.pmod(_h48(F.col("doc_id").cast("string")), F.lit(100))
    split = (
        F.when(h < val_pct, F.lit("val"))
        .when(h < val_pct + test_pct, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return (
        _docs(spark, sf_dir)
        .select(
            "source",
            split.alias("split"),
            F.size(F.split("text", " ")).alias("n_tok"),
        )
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )


def decontaminate(
    spark: SparkSession, sf_dir: str, k: int = 3, bench_mod: int = 50
) -> DataFrame:
    """Benchmark decontamination — flag training docs sharing any k-word
    shingle with a held-out benchmark set, the standard pre-training hygiene
    pass. With no external data in the sandbox the benchmark is the
    deterministic md5-hash slice h48(doc_id) % bench_mod == 0 (~2% of the
    corpus); in production it is the eval suite's text — the mechanics are
    identical. Returns the flagged docs with their overlapping-shingle
    count (shingles are per-doc distinct, so the count is set-overlap).

    Scale: the benchmark's DISTINCT shingles are a small table that
    BROADCASTS; the corpus shingle stream is touched once with one
    map-side-combined count — never an all-pairs, never a corpus shuffle
    beyond the count itself."""
    sh = shingles(spark, sf_dir, k)
    in_bench = F.pmod(_h48(F.col("doc_id").cast("string")), F.lit(bench_mod)) == 0
    bench_sh = sh.where(in_bench).select("shingle").distinct()
    return (
        sh.where(~in_bench)
        .join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap_shingles"))
    )


def repetition_scores(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Intra-document repetition — the duplicate-shingle ratio screens that
    quality filters apply to drop boilerplate/looping text: per doc, total
    k-word shingles, distinct shingles, and the floor-scaled duplicate
    fraction. Narrow map, no shuffle."""
    base = _docs(spark, sf_dir).select("doc_id", _words().alias("w"))
    sh = _shingle_expr(F.col("w"), k)
    d = base.select(
        "doc_id",
        F.size(sh).alias("n_shingles"),
        F.size(F.array_distinct(sh)).alias("n_distinct"),
    )
    rep = F.when(
        F.col("n_shingles") > 0,
        F.floor(
            (F.col("n_shingles") - F.col("n_distinct"))
            / F.col("n_shingles").cast("double")
            * 10_000
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return d.select("doc_id", "n_shingles", "n_distinct", rep.alias("rep_f4"))
