"""Relational analytics queries over the TPC-H-ish testdata tables — the
built-in Catalyst surface of the engine (SURVEY.md §2.6): scans with
pushdown/pruning, map-side-combined aggregations, broadcast star joins,
window ranking, time-bucketed rollups.

Cross-engine numeric discipline: double SUMs are NOT reproducible across
engines (summation order), so every monetary aggregate is summed as exact
integer cents/micros — per-row `floor(x*scale + 0.5)` is bit-deterministic
in both Spark and DuckDB, and BIGINT sums are exact and order-free. This is
also the right call at 100 TB: integer sums are cheaper and overflow-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _cents(col, scale: int = 100):
    return F.floor(col * scale + F.lit(0.5)).cast("long")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter (pushed to parquet) + 4-group agg.
    One map-side-combined shuffle on a tiny key space."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_cents(F.col("l_quantity"))).alias("sum_qty_c"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_c"),
            F.sum(_cents(disc_price, 1_000_000)).alias("sum_disc_price_u"),
            F.sum(_cents(charge, 1_000_000)).alias("sum_charge_u"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: lineitem ⋈ orders ⋈ customer ⋈ nation, revenue per nation.
    customer/nation are broadcast (small dims); only orders⋈lineitem shuffles
    — and that join is on the natural key both sides can be bucketed by."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(_cents(rev, 1_000_000)).alias("revenue_u"),
            F.count("*").alias("n_items"),
        )
    )


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed rollup: tumbling 1-day windows per event_type (the batch
    twin of the streaming window agg). Map-side-combined single shuffle."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.to_date(F.col("ts")).alias("day"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_cents(F.col("value"), 1_000_000)).alias("sum_value_u"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


def events_windowed(spark: SparkSession, sf_dir: str, window: str = "1 hour") -> DataFrame:
    """Tumbling event-time windows via the window() operator proper — the
    batch twin of streaming.windowed_token_stats (same groupBy(window, key)
    plan shape; the streaming version adds only the watermark). Epoch-aligned
    1-hour windows ≡ date_trunc('hour') in the oracle. One combinable
    shuffle."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window(F.col("ts"), window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_cents(F.col("value"), 1_000_000)).alias("sum_value_u"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value_u",
        )
    )


def user_value_rank(spark: SparkSession, sf_dir: str, top: int = 20) -> DataFrame:
    """Window ranking: top users by total event value within each event_type.
    Aggregate first (shrinks to |users×types|), then window — never a window
    over the raw fact table."""
    ev = _t(spark, sf_dir, "events")
    totals = ev.groupBy("event_type", "user_id").agg(
        F.sum(_cents(F.col("value"), 1_000_000)).alias("total_value_u"),
        F.count("*").alias("n_events"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("total_value_u").desc(), F.col("user_id").asc()
    )
    return (
        totals.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= top)
        .select("event_type", "user_id", "total_value_u", "n_events", "rnk")
    )


def size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-size distribution (100-char buckets) — the stats
    that size stripes and salt buckets in the encode pipeline. All-integer,
    so exactly reproducible; at 100 TB this is one combinable shuffle."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        d.groupBy(
            "source",
            F.floor(F.col("n_chars") / 100).cast("long").alias("bucket"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )
