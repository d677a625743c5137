"""Spark pipeline: salted repartition -> mapInArrow encode -> Iceberg-emulated
commit; mirror decode path; round-trip verifier.

Physical plan (SURVEY.md §3.3) — one shuffle total:

  scan (parquet, column-pruned by Catalyst)
    -> repartition(N, pid)            pid = source + '#' + xxhash64(doc_id)%S
    -> mapInArrow(encode)             numpy codecs per Arrow batch; each task
                                      keeps one writer per pid (pids are
                                      clustered per 8k-row Arrow batch — no
                                      cluster-wide sort of the payload);
                                      rows re-sort by doc_id per stripe, so
                                      stripe CONTENT is deterministic while
                                      stripe BOUNDARIES follow arrival order
                                      (BASELINE.md "Determinism contract");
                                      streams finished stripes straight into
                                      per-pid parquet files (temp + atomic
                                      rename; idempotent under task retry)
    -> collect tiny metadata rows -> manifest commit (driver)

Scale notes (designed for 10^12 rows / 1000 executors, tested on local[32]):
- the salt spreads each source over S buckets, defusing long-token-array skew
  (BASELINE.json:6); choose S so a bucket is a few GB: S ~ total_bytes /
  (n_sources * 4GiB).
- executors write data files directly (no second shuffle, no driver funnel);
  only O(#partitions) metadata rows cross to the driver, like an Iceberg
  commit.
- stripes are flushed by token count, so blob sizes stay uniform despite
  skewed document lengths; worker memory is bounded by MAX_BUFFERED_TOKENS
  across the task's open pid buffers + one Arrow batch, regardless of
  partition size (streaming ParquetWriter per pid).
- decode is the mirror image and prunes columns at the stream level (only
  requested columns' bytes are decompressed).
"""

from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .codecs import bloom as bloomc
from .stripe import decode_stripe, encode_stripe, footer_from_json, footer_to_json
from .warehouse import Warehouse

META_SCHEMA = (
    "pid string, file string, stripes long, n_rows long, n_tokens long, "
    "enc_bytes long, encode_s double, min_doc_id string, max_doc_id string"
)

STRIPE_FILE_SCHEMA = pa.schema(
    [
        ("pid", pa.string()),
        ("stripe_id", pa.int64()),
        ("n_rows", pa.int64()),
        ("n_tokens", pa.int64()),
        ("enc_bytes", pa.int64()),
        ("blob", pa.large_binary()),
        ("footer", pa.string()),
    ]
)

DEFAULT_STRIPE_TOKENS = 4_000_000  # ~8 MB encoded per stripe at ~2 B/token


def with_pid(
    df: DataFrame,
    salt_buckets: int,
    key_col: str = "doc_id",
    source_col: str | None = "source",
) -> DataFrame:
    """Logical partition id: explicit salt on (source, doc_id) (BASELINE.json:6).
    Generic tables pick their own key/source columns (source_col=None salts
    on the key alone — the pid prefix is then empty)."""
    src = F.col(source_col) if source_col else F.lit("")
    return df.withColumn(
        "pid",
        F.concat_ws(
            "#", src, F.pmod(F.xxhash64(F.col(key_col)), F.lit(salt_buckets)).cast("string")
        ),
    )


def rebalance_by_tokens(
    dfp: DataFrame,
    max_pid_tokens: int,
    key_col: str = "doc_id",
    weight_col: str | None = "n_tok",
) -> tuple[DataFrame, dict]:
    """Size-aware rebalance (SURVEY.md §2.2): cap each logical partition's
    token mass. The uniform salt bounds *expected* mass, but an adversarial
    source×bucket (a burst of giant documents hashing together) can still
    land one task with many × the ideal share; this pass splits exactly
    those buckets.

    One column-pruned aggregation over (pid, n_tok) — at 100 TB that is a
    narrow two-column scan with a map-side-combined shuffle onto
    O(sources × salt_buckets) keys, and only that driver-sized key list is
    collected. Overweight pids are re-salted into ceil(mass/cap) sub-buckets
    by an independent hash (xxhash64 over (doc_id, 1)). Deterministic for a
    given input, so resume runs recompute identical pid names. The per-pid
    bound becomes max(cap(1+ε), largest single document) — rows are atomic.

    Returns (df with split pids, {pid: n_splits})."""
    w = F.sum(weight_col) if weight_col else F.count(F.lit(1))
    mass = dfp.groupBy("pid").agg(w.alias("m")).collect()
    splits = {
        r["pid"]: -(-int(r["m"]) // max_pid_tokens)
        for r in mass
        if int(r["m"]) > max_pid_tokens
    }
    if not splits:
        return dfp, {}
    k = F.create_map(
        *[x for pid, n in sorted(splits.items()) for x in (F.lit(pid), F.lit(n))]
    )[F.col("pid")]
    sub = F.pmod(F.xxhash64(F.col(key_col), F.lit(1)), k).cast("string")
    # sub-buckets use '@', NOT the with_pid '#' separator: a source name that
    # itself contains '#' ("a#1" bucket 2 vs "a" bucket 1 sub 2) must not
    # collide with a split pid, or two logical partitions silently merge and
    # the max_pid_tokens cap stops binding
    out = dfp.withColumn(
        "pid",
        F.when(k.isNotNull(), F.concat_ws("@", F.col("pid"), sub)).otherwise(
            F.col("pid")
        ),
    )
    return out, splits


class _PidWriter:
    """Streams one pid's stripes into its snapshot data file (tmp + rename)."""

    def __init__(
        self,
        warehouse_path: str,
        snapshot: str,
        pid: str,
        key_col: str = "doc_id",
        key_blooms: bool = True,
    ):
        self.pid = pid
        self.key_col = key_col
        self.key_blooms = key_blooms
        self.final = Warehouse(warehouse_path).data_file(pid, snapshot)
        os.makedirs(os.path.dirname(self.final), exist_ok=True)
        self.tmp = self.final + f".inprogress-{uuid.uuid4().hex[:8]}"
        self.writer = pq.ParquetWriter(self.tmp, STRIPE_FILE_SCHEMA, compression="none")
        self.stripes = 0
        self.n_rows = 0
        self.n_tokens = 0
        self.enc_bytes = 0
        self.min_doc = None
        self.max_doc = None
        # file-level key bloom (ORC BLOOM_FILTER analog, puffin-style
        # sidecar): fixed m so worker memory stays O(1) per writer; readers
        # ignore it if over-full (bloom_from_meta checks saturation)
        self.file_bloom = np.zeros(bloomc.FILE_BLOOM_BITS // 8, dtype=np.uint8)
        self.bloom_n = 0
        self.t0 = time.perf_counter()

    def _key_hashes(self, ids: pa.Array):
        """Vectorized bloom double-hashes of a stripe's key values; None for
        key types without a bloom hasher (float keys make no sense anyway)."""
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if pa.types.is_string(ids.type) or pa.types.is_large_string(ids.type):
            return bloomc.hash_pairs_str_array(ids)
        if pa.types.is_integer(ids.type):
            return bloomc.hash_pairs_int(ids.cast(pa.int64()).to_numpy(zero_copy_only=False))
        return None

    def write_stripe(self, tbl: pa.Table) -> None:
        # deterministic stripe CONTENT: order rows by doc_id here (vectorized
        # take) instead of a cluster-wide sortWithinPartitions('pid','doc_id')
        # — the JVM sort moves the full token payload and costs ~3x the
        # pid-only clustering sort (measured at 322M tokens: 7.8s vs 2.4s on
        # 16 cores). Stripe boundaries still follow shuffle arrival order;
        # per-row decode equality is order-independent either way.
        tbl = tbl.take(pc.sort_indices(tbl.column(self.key_col)))
        data = tbl.drop_columns(["pid"])
        blob, footer = encode_stripe(data)
        # key bloom: one vectorized hash pass feeds BOTH the stripe-level
        # bloom (stripe footer stats, sized to this stripe's rows) and the
        # file-level bloom (OR-accumulated, written as a sidecar at close)
        hp = (
            self._key_hashes(tbl.column(self.key_col))
            if self.key_blooms
            else None
        )
        if hp is not None:
            h1, h2 = hp
            stats = footer["columns"][self.key_col].setdefault("stats", {})
            stats["bloom"] = bloomc.bloom_to_meta(
                bloomc.bloom_build(h1, h2, bloomc.stripe_bloom_bits(len(h1))),
                len(h1),
            )
            bloomc.bloom_insert(self.file_bloom, h1, h2)
            self.bloom_n += len(h1)
        if "tokens" in footer["columns"]:
            n_tok = int(footer["columns"]["tokens"].get("stats", {}).get("n_values", 0))
        else:
            n_tok = tbl.num_rows  # generic tables meter throughput in rows
        row = pa.record_batch(
            [
                pa.array([self.pid]),
                pa.array([self.stripes], type=pa.int64()),
                pa.array([tbl.num_rows], type=pa.int64()),
                pa.array([n_tok], type=pa.int64()),
                pa.array([len(blob)], type=pa.int64()),
                pa.array([blob], type=pa.large_binary()),
                pa.array([footer_to_json(footer)]),
            ],
            schema=STRIPE_FILE_SCHEMA,
        )
        self.writer.write_batch(row)
        self.stripes += 1
        self.n_rows += tbl.num_rows
        self.n_tokens += n_tok
        self.enc_bytes += len(blob)
        # native-typed key range (str for doc_id, int for int keys): the
        # manifest file-pruning range test compares in the key's own order,
        # so integer keys don't fall into string collation
        ids = tbl.column(self.key_col)
        lo, hi = ids[0].as_py(), ids[-1].as_py()
        self.min_doc = lo if self.min_doc is None else min(self.min_doc, lo)
        self.max_doc = hi if self.max_doc is None else max(self.max_doc, hi)

    def close(self) -> dict:
        self.writer.close()
        if self.bloom_n:
            # puffin-style sidecar, written BEFORE the data file becomes
            # visible: a committed data file implies its sidecar exists (a
            # crash in between leaves a harmless orphan sidecar). The
            # manifest stays O(200 bytes)/partition; planners read sidecars
            # only for files that survive range pruning.
            side_tmp = self.final + f".bloom.inprogress-{uuid.uuid4().hex[:8]}"
            with open(side_tmp, "w") as fh:
                json.dump(
                    {"column": self.key_col,
                     **bloomc.bloom_to_meta(self.file_bloom, self.bloom_n)},
                    fh,
                )
            os.replace(side_tmp, self.final + ".bloom.json")
        os.replace(self.tmp, self.final)  # atomic: file is complete or absent
        return {
            "pid": self.pid,
            "file": self.final,
            "stripes": self.stripes,
            "n_rows": self.n_rows,
            "n_tokens": self.n_tokens,
            "enc_bytes": self.enc_bytes,
            "encode_s": time.perf_counter() - self.t0,
            # non-string keys (int event/vec ids) render via json.dumps so the
            # string-typed META_SCHEMA row still carries them; file_matches
            # parses them back with the manifest schema's key type
            "min_doc_id": self.min_doc if isinstance(self.min_doc, str) else json.dumps(self.min_doc),
            "max_doc_id": self.max_doc if isinstance(self.max_doc, str) else json.dumps(self.max_doc),
        }


MAX_BUFFERED_TOKENS = 16_000_000  # global per-task cap across open pid buffers


def _make_encoder(
    warehouse_path: str,
    snapshot: str,
    stripe_tokens: int,
    key_col: str = "doc_id",
    weight_col: str | None = "n_tok",
    key_blooms: bool = True,
):
    """Multi-writer partition encoder: rows arrive in ARBITRARY pid order
    (no cluster-wide sort!) — each Arrow batch is clustered by pid locally
    (a ~8k-row Arrow sort, vectorized C++) and appended to that pid's
    buffer; stripes flush when a pid's buffer reaches stripe_tokens.

    This removes the JVM sortWithinPartitions from the encode plan — an
    O(n log n) full-row sort pass over the entire token payload whose
    removal measured +15-20% job throughput at 322M tokens. Worker memory
    stays bounded: per-pid buffers are capped collectively by
    MAX_BUFFERED_TOKENS (largest buffer flushes early as a smaller stripe —
    RLEv2 blocks are 512 values, so size is unaffected)."""

    def encode_partition(batches):
        writers: dict[str, _PidWriter] = {}
        bufs: dict[str, list[pa.RecordBatch]] = {}
        buf_tokens: dict[str, int] = {}
        total_buffered = 0
        metas: list[dict] = []

        def flush(pid: str) -> None:
            nonlocal total_buffered
            if bufs[pid]:
                # split the buffer at stripe_tokens boundaries so stripe
                # size has a UNIFORM upper bound (stripe_tokens + one row)
                # even when a single Arrow batch delivers a multiple of the
                # target — decode-side worker memory is bounded by stripe
                # size, so this must not scale with batch luck
                tbl = pa.Table.from_batches(bufs[pid])
                if weight_col:
                    wt = np.asarray(tbl.column(weight_col), dtype=np.int64)
                else:
                    wt = np.ones(tbl.num_rows, dtype=np.int64)
                csum = np.cumsum(wt)
                start = 0
                while start < tbl.num_rows:
                    base = int(csum[start - 1]) if start else 0
                    end = min(
                        int(np.searchsorted(csum, base + stripe_tokens, side="left")) + 1,
                        tbl.num_rows,
                    )
                    writers[pid].write_stripe(tbl.slice(start, end - start))
                    start = end
                total_buffered -= buf_tokens[pid]
                bufs[pid], buf_tokens[pid] = [], 0

        for batch in batches:
            pids_arr = batch.column("pid")
            order = pc.sort_indices(pids_arr)
            batch = batch.take(order)
            pids = np.asarray(batch.column("pid"))
            bounds = np.nonzero(pids[1:] != pids[:-1])[0] + 1
            starts = np.r_[0, bounds]
            ends = np.r_[bounds, len(pids)]
            if weight_col:
                ntoks = np.asarray(batch.column(weight_col), dtype=np.int64)
            else:
                ntoks = np.ones(len(pids), dtype=np.int64)
            csum = np.r_[0, np.cumsum(ntoks)]
            for s, e in zip(starts.tolist(), ends.tolist()):
                pid = str(pids[s])
                if pid not in writers:
                    writers[pid] = _PidWriter(
                        warehouse_path, snapshot, pid, key_col, key_blooms
                    )
                    bufs[pid], buf_tokens[pid] = [], 0
                bufs[pid].append(batch.slice(s, e - s))
                seg = int(csum[e] - csum[s])
                buf_tokens[pid] += seg
                total_buffered += seg
                if buf_tokens[pid] >= stripe_tokens:
                    flush(pid)
            while total_buffered >= MAX_BUFFERED_TOKENS:
                flush(max(buf_tokens, key=buf_tokens.get))
        for pid in writers:
            flush(pid)
            metas.append(writers[pid].close())
        if metas:
            yield pa.RecordBatch.from_pylist(metas)

    return encode_partition


def encode_table(
    spark: SparkSession,
    df: DataFrame,
    warehouse_path: str,
    snapshot: str,
    salt_buckets: int = 32,
    stripe_tokens: int = DEFAULT_STRIPE_TOKENS,
    num_partitions: int | None = None,
    resume: bool = True,
    max_pid_tokens: int | None = None,
    key_col: str = "doc_id",
    source_col: str | None = "source",
    weight_col: str | None = "n_tok",
    key_blooms: bool = True,
    extra: dict | None = None,
    advance_current: bool = True,
) -> dict:
    """Encode a (doc_id, tokens, n_tok, source) DataFrame into the warehouse;
    returns the committed manifest. Resumable: committed partitions are
    skipped, complete-but-uncommitted files from a killed run are adopted.
    `max_pid_tokens` enables the size-aware rebalance: overweight logical
    partitions are split before the (single) shuffle. The split decision runs
    on the FULL input — before the resume filter — so a resumed run derives
    the same pid names as the killed one.

    Any table encodes through the same path by naming its own layout:
    `key_col` (stripe sort + manifest min/max range, any orderable type),
    `source_col` (pid prefix = partition key; None salts on the key alone)
    and `weight_col` (stripe sizing mass; None weighs every row 1). The
    layout is recorded in the manifest so decode-side pruning knows which
    columns the file-level ranges describe.

    `key_blooms=False` skips the stripe/file key bloom filters (and their
    ~1% encode CPU): IN-set point lookups then fall back to range stats +
    exact row filtering — correct, just unpruned under the salt."""
    wh = Warehouse(warehouse_path)
    schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    dfp = with_pid(df, salt_buckets, key_col, source_col)
    if max_pid_tokens:
        dfp, _ = rebalance_by_tokens(dfp, max_pid_tokens, key_col, weight_col)

    committed = wh.committed_pids(snapshot) if resume else set()
    if resume:
        adopted = {}
        for pid, f in wh.orphan_files(snapshot).items():
            v = wh.validate_data_file(f, key_col=key_col)
            if v is not None:
                adopted[pid] = {**v, "file": f, "adopted": True, "encode_s": 0.0}
        if adopted:
            wh.commit(snapshot, adopted, schema, advance_current=advance_current)
            committed |= set(adopted)
    if committed:
        if len(committed) <= 1000:
            dfp = dfp.filter(~F.col("pid").isin(*committed))
        else:
            skip = spark.createDataFrame([(p,) for p in committed], "pid string")
            dfp = dfp.join(F.broadcast(skip), "pid", "left_anti")

    # each encode task is a JVM Arrow-feed thread + a Python codec worker
    # that strictly ALTERNATE (the core idles at every handoff), so fewer
    # tasks than cores under-fills the machine: alternated A/B at 322M
    # tokens measured parallelism/2 tasks clearly worst (19.0 vs 21.3
    # median Mtok/s unpinned; pinned 1v4-core protocol +11% at 2 tasks per
    # core). Default to one task per slot; the pinned scaling protocol
    # passes 2/core explicitly.
    num_partitions = num_partitions or max(
        spark.sparkContext.defaultParallelism, 2
    )
    meta_df = (
        dfp.repartition(num_partitions, "pid")
        # NO cluster-wide sort: the encoder clusters pids per Arrow batch
        # and keeps one writer per pid (see _make_encoder); doc_id order is
        # restored per stripe inside _PidWriter.write_stripe
        .mapInArrow(
            _make_encoder(
                warehouse_path, snapshot, stripe_tokens, key_col, weight_col,
                key_blooms,
            ),
            META_SCHEMA,
        )
    )
    rows = meta_df.collect()
    partitions = {r["pid"]: r.asDict() for r in rows}
    for p in partitions.values():
        p["tokens_per_s"] = p["n_tokens"] / p["encode_s"] if p["encode_s"] else None
    layout = {"key_col": key_col, "source_col": source_col, "weight_col": weight_col}
    return wh.commit(
        snapshot, partitions, schema,
        extra={"layout": layout, **(extra or {})},
        advance_current=advance_current,
    )


_ARROW_TO_SPARK = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "string": "string",
    "large_string": "string",
    "float": "float",
    "double": "double",
}


def _spark_type_str(t: str) -> str:
    if t in _ARROW_TO_SPARK:
        return _ARROW_TO_SPARK[t]
    if t.startswith("timestamp"):
        return "timestamp"
    if t.startswith("list") or t.startswith("large_list"):
        if "double" in t:
            return "array<double>"
        if "float" in t:
            return "array<float>"
        return "array<int>"
    if t.startswith("array"):  # spark simpleString already
        return t
    return t


def normalize_predicates(predicate) -> list[tuple]:
    """Accepted predicate forms (conjunction semantics, ORC search-argument
    style):
      ("col", lo, hi)          — BETWEEN lo AND hi (inclusive); either bound
                                 may be None = unbounded on that side
      ("col", values)          — IN set (values: list/tuple/set)
      [pred, pred, ...]        — AND of the above
    Normalized to [("between", col, lo, hi) | ("in", col, sorted_values)]."""
    if predicate is None:
        return []
    preds = predicate if isinstance(predicate, list) else [predicate]
    out = []
    for p in preds:
        if len(p) == 3:
            if p[1] is None and p[2] is None:
                continue  # unbounded on both sides: no-op conjunct
            out.append(("between", p[0], p[1], p[2]))
        elif len(p) == 2 and isinstance(p[1], (list, tuple, set, frozenset)):
            if not p[1]:
                raise ValueError(f"empty IN-set predicate on {p[0]!r}")
            out.append(("in", p[0], sorted(set(p[1]))))
        else:
            raise ValueError(
                f"predicate {p!r} is neither (col, lo, hi) nor (col, values)"
            )
    return out


def _pred_matches_range(pred: tuple, mn, mx) -> bool:
    """Can any value in [mn, mx] satisfy the predicate? (The shared
    file-level and stripe-level pruning test — conservative by
    construction: stats only ever EXCLUDE.)"""
    if pred[0] == "between":
        lo, hi = pred[2], pred[3]
        if lo is not None and mx < lo:
            return False
        if hi is not None and mn > hi:
            return False
        return True
    return any(mn <= v <= mx for v in pred[2])


def file_matches(
    pid: str,
    part: dict,
    preds: list[tuple],
    key_col: str = "doc_id",
    source_col: str | None = "source",
    key_parse=None,
) -> bool:
    """FILE-level pruning over driver-side manifest metadata (the Iceberg
    manifest-pruning analog): key-column (doc_id) predicates test the
    partition's [min_doc_id, max_doc_id] range (stripes are key-sorted, so
    it is tight); source-column predicates test the pid's source prefix —
    pid is source + '#' + bucket[@sub] (with_pid / rebalance_by_tokens),
    and neither suffix contains '#', so rsplit recovers the source exactly.
    Source pruning is PARTITION-KEY pruning: an equality/IN predicate on
    source skips every non-matching file without opening it. `key_parse`
    (e.g. int) restores non-string manifest key ranges to their native
    order before the range test."""
    src = pid.rsplit("#", 1)[0]
    for p in preds:
        col = p[1]
        if col == key_col:
            mn, mx = part.get("min_doc_id"), part.get("max_doc_id")
            # "" or absent = no recorded range — cannot exclude, for EVERY
            # key type: compact_snapshots writes "" when a source partition
            # lacked a range, and adopted resume partitions may carry no
            # keys at all; comparing the "" sentinel as a real string range
            # would silently prune live rows
            if mn in ("", None) or mx in ("", None):
                continue
            if key_parse is not None:
                mn, mx = key_parse(mn), key_parse(mx)
            if not _pred_matches_range(p, mn, mx):
                return False
        elif source_col is not None and col == source_col:
            if not _pred_matches_range(p, src, src):
                return False
    return True


def stripe_matches(footer: dict, col: str, lo, hi) -> bool:
    """Stripe-level predicate-pushdown test (ORC stripe-stats PPD): can any
    row of this stripe satisfy lo <= col <= hi? Conservative: stripes whose
    footer carries no min/max for `col` (strings, lists) always match."""
    return stripe_matches_pred(footer, ("between", col, lo, hi))


def stripe_matches_pred(footer: dict, pred: tuple) -> bool:
    """stripe_matches generalized to a normalized predicate (between/in)."""
    meta = footer["columns"].get(pred[1])
    if meta is None:
        return True
    st = meta.get("stats") or {}
    mn, mx = st.get("min"), st.get("max")
    if mn is None or mx is None:
        return True
    return _pred_matches_range(pred, mn, mx)


def stripe_bloom_matches(footer: dict, pred: tuple) -> bool:
    """Stripe-level bloom test for an IN-set predicate (ORC BLOOM_FILTER
    analog): can ANY of the probe values be in this stripe? Conservative —
    columns without a bloom in their footer stats always match."""
    meta = footer["columns"].get(pred[1])
    if meta is None:
        return True
    bl = (meta.get("stats") or {}).get("bloom")
    if not bl:
        return True
    is_str = footer["schema"].get(pred[1]) in ("string", "large_string")
    return bloomc.meta_might_contain(bl, pred[2], is_str)


def _row_mask(rb: pa.RecordBatch, preds: list[tuple]):
    """Exact row-level filter mask: AND of all conjuncts (arrow compute,
    no Python per row)."""
    mask = None
    for p in preds:
        c = rb.column(p[1])
        if pa.types.is_timestamp(c.type):
            # timestamp predicates are epoch counts at the column's unit
            # (the same integers the stripe stats carry)
            c = c.cast(pa.int64())
        if p[0] == "between":
            m = None
            if p[2] is not None:
                m = pc.greater_equal(c, p[2])
            if p[3] is not None:
                le = pc.less_equal(c, p[3])
                m = le if m is None else pc.and_(m, le)
        else:
            m = pc.is_in(c, value_set=pa.array(p[2], type=c.type))
        mask = m if mask is None else pc.and_(mask, m)
    return mask


def decode_table(
    spark: SparkSession,
    warehouse_path: str,
    snapshot: str | None = None,
    columns: list[str] | None = None,
    predicate: tuple | list | None = None,
    prune_metrics: dict | None = None,
    delete_inline_max: int | None = None,
) -> DataFrame:
    """Read committed stripes back into the original rows. Column projection
    prunes at the stream level (untouched columns are never decompressed).

    `predicate` pushes a CONJUNCTION of filters down three levels, mirroring
    ORC's search-argument model on the Iceberg-style layout. Forms (see
    normalize_predicates): a single (col, lo, hi) between, a single
    (col, values) IN-set, or a list of either — ANDed together.
      1. FILE level — driver-side manifest metadata only (like Iceberg
         manifest pruning): doc_id predicates test each partition's
         [min_doc_id, max_doc_id] range (stripes are doc_id-sorted so it is
         tight); source predicates test the pid's source prefix — true
         partition-key pruning, since source is part of the mandated salt
         key. Pruned files are never opened.
      2. STRIPE level — stripes whose footer stats are disjoint from ANY
         conjunct are skipped before a single stream of the blob is
         decompressed (stripe_matches_pred).
      3. ROW level — surviving stripes are filtered exactly (arrow compute),
         so the result equals an unpruned decode + filter (pruning is
         transparent; the pruned_scan* gate queries certify this against
         the SQL oracle).
    Note the mandated salt ANTI-clusters doc_ids across partitions, so
    doc_id file pruning pays on source-prefixed id ranges (the salt
    preserves the source prefix), and stripe-level pruning pays where
    arrival order correlates with the predicate column — e.g. time-ordered
    corpora. Source predicates prune files regardless.

    `prune_metrics` (optional dict) records proof that pruning fired:
    'files_total'/'files_pruned' are filled immediately (driver-side);
    'stripes_seen'/'stripes_skipped' are Spark accumulators — read
    `.value` after an action on the returned DataFrame.

    Merge-on-read deletes (deletes.py): when the snapshot's manifest lists
    `delete_files`, rows whose layout key appears in them are dropped —
    inline (an arrow `is_in` mask inside the decode kernel, zero extra
    shuffle) when the total delete-key count (parquet footers, driver-side)
    is ≤ `delete_inline_max` (default deletes.INLINE_DELETE_MAX), else via
    a `left_anti` join against the delete files (the unbounded path; Spark
    broadcasts or sort-merges by size). Both are exact; the `delete_scan`
    gate runs each against the other and the SQL oracle."""
    wh = Warehouse(warehouse_path)
    snapshot = wh.resolve_snapshot(snapshot)
    manifest = wh.read_manifest(snapshot)
    files = wh.committed_files(snapshot)
    if not files:
        # distinct from "every file pruned" below: a snapshot with nothing
        # committed is a caller error, not an empty query result
        raise ValueError(f"no committed files for snapshot {snapshot}")
    schema = manifest["schema"] if manifest else {}
    preds = normalize_predicates(predicate)
    for p in preds:
        if p[1] not in schema:
            raise ValueError(f"predicate column {p[1]!r} not in table schema")
        if _spark_type_str(schema[p[1]]).startswith("array"):
            raise ValueError(f"predicate on array column {p[1]!r} unsupported")
    names = columns or list(schema.keys())
    out_schema = ", ".join(f"{n} {_spark_type_str(schema[n])}" for n in names)
    if preds:
        files = plan_scan_files(manifest, preds, prune_metrics)
        if not files:  # every partition pruned: empty result, no job
            return spark.createDataFrame([], out_schema)
    if prune_metrics is not None:
        sc = spark.sparkContext
        prune_metrics["stripes_seen"] = sc.accumulator(0)
        prune_metrics["stripes_skipped"] = sc.accumulator(0)
        prune_metrics["stripes_bloom_skipped"] = sc.accumulator(0)
    acc_seen = (prune_metrics or {}).get("stripes_seen")
    acc_skip = (prune_metrics or {}).get("stripes_skipped")
    acc_bloom = (prune_metrics or {}).get("stripes_bloom_skipped")

    # merge-on-read deletes (deletes.py): delete entries are SEQ-SCOPED —
    # plain (delete_where) entries apply to every data file; {'path','seq'}
    # (upsert) entries apply only to files whose partition seq is lower,
    # so an upsert's own files keep the re-inserted keys. Group the
    # surviving files by their applicable delete set (a delete-free table
    # and the plain-delete case both collapse to ONE group), then pick the
    # apply strategy once from the TOTAL key count (parquet footers,
    # driver-side): inline is_in mask inside the decode kernel (zero extra
    # shuffle) vs a left_anti join per group (the unbounded path; Spark
    # broadcasts or sort-merges by size).
    dels_raw = (manifest or {}).get("delete_files") or []
    key_col = ((manifest or {}).get("layout") or {}).get("key_col", "doc_id")
    groups: dict[tuple[str, ...], list[str]] = {}
    if dels_raw:
        from . import deletes as _deletes

        part_seq = {
            p["file"]: p.get("seq", 0)
            for p in manifest["partitions"].values()
        }
        entries = _deletes.normalize_delete_entries(dels_raw)
        for f in files:
            fseq = part_seq.get(f, 0)
            appl = tuple(sorted(
                path for path, s in entries if s is None or s > fseq
            ))
            groups.setdefault(appl, []).append(f)
    else:
        groups[()] = list(files)
    all_del_paths = sorted({p for appl in groups for p in appl})
    inline_keymap = None  # path -> arrow key array, shipped in task closures
    anti_join = False
    if all_del_paths:
        from . import deletes as _deletes

        n_del = _deletes.count_delete_keys(all_del_paths)
        cap = (
            delete_inline_max
            if delete_inline_max is not None
            else _deletes.INLINE_DELETE_MAX
        )
        if n_del == 0:
            groups = {(): [f for fs in groups.values() for f in fs]}
        elif n_del <= cap:
            inline_keymap = {
                p: _deletes.load_delete_keys([p], key_col)
                for p in all_del_paths
            }
        else:
            anti_join = True

    # predicate columns must be decoded to filter rows; drop them after if
    # the caller did not ask for them (the delete key is handled the same
    # way, per group)
    pcols = [p[1] for p in preds]

    def decode_branch(gfiles: list[str], appl: tuple[str, ...]) -> DataFrame:
        use_key = bool(appl) and (inline_keymap is not None or anti_join)
        nk = use_key and key_col not in names
        inner = names + [key_col] if nk else names
        ischema = ", ".join(f"{n} {_spark_type_str(schema[n])}" for n in inner)
        rcols = inner + [c for c in pcols if c not in inner]
        keyset = None
        if inline_keymap is not None and appl:
            import pyarrow as pa

            ks = [
                k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k
                for k in (inline_keymap[p] for p in appl)
            ]
            keyset = ks[0] if len(ks) == 1 else pa.concat_arrays(ks)

        # {} normalizes to None: with the evolution invariant that every
        # added/renamed column keeps a mapping entry, an empty mapping
        # means "no evolution residue" — plain decode path
        colmap = (manifest or {}).get("column_mapping") or None

        def decode_partition(batches):
            it = decode_blob_batches(
                batches, preds, rcols, inner, acc_seen, acc_skip, acc_bloom,
                colmap=colmap, coltypes=schema if colmap else None,
            )
            if keyset is None:
                yield from it
                return
            import pyarrow.compute as pc

            kidx = inner.index(key_col)
            for b in it:
                # null keys are kept: is_in(null)=null -> fill False ->
                # invert True matches left_anti's null-join semantics
                hit = pc.fill_null(
                    pc.is_in(b.column(kidx), value_set=keyset), False
                )
                fb = b.filter(pc.invert(hit))
                yield fb.select(names) if nk else fb

        sdf = spark.read.parquet(*gfiles).select("blob", "footer")
        if anti_join and appl:
            out = sdf.mapInArrow(decode_partition, ischema)
            dk = spark.read.parquet(*appl).select(key_col).distinct()
            return out.join(dk, on=key_col, how="left_anti").select(*names)
        return sdf.mapInArrow(decode_partition, out_schema)

    branches = [decode_branch(gf, appl) for appl, gf in groups.items()]
    res = branches[0]
    for b in branches[1:]:
        res = res.unionByName(b)
    return res


def plan_scan_files(
    manifest: dict, preds: list[tuple], prune_metrics: dict | None = None
) -> list[str]:
    """FILE-level scan planning over driver-side metadata, shared by
    decode_table and the tokstripe Python data source:
      1. manifest range/partition-key prune (file_matches) — pruned files
         are never opened;
      2. sidecar bloom prune for IN-set predicates on the key column (the
         salt makes key RANGES too wide to exclude anything, so the bloom
         is what makes point lookups skip files). Only files that survived
         range pruning pay the sidecar read — one small GET per file at
         object-store scale, the planning read Iceberg does for puffin.
    `preds` must already be normalized (normalize_predicates)."""
    schema = manifest["schema"]
    layout = manifest.get("layout") or {}
    key_col = layout.get("key_col", "doc_id")
    src_col = layout.get("source_col", "source")
    key_parse = (
        int
        if _spark_type_str(schema.get(key_col, "string"))
        in ("tinyint", "smallint", "int", "bigint")
        else None
    )
    n_total = len(manifest["partitions"])
    files = [
        part["file"]
        for pid, part in manifest["partitions"].items()
        if file_matches(pid, part, preds, key_col, src_col, key_parse)
    ]
    if prune_metrics is not None:
        prune_metrics["files_total"] = n_total
        prune_metrics["files_pruned"] = n_total - len(files)
    in_key = [p for p in preds if p[0] == "in" and p[1] == key_col]
    if in_key and files:
        key_is_str = key_parse is None
        survivors = []
        for f in files:
            keep = True
            try:
                with open(f + ".bloom.json") as fh:
                    meta = json.load(fh)
                if meta.get("column") == key_col:
                    keep = all(
                        bloomc.meta_might_contain(meta, p[2], key_is_str)
                        for p in in_key
                    )
            except (OSError, ValueError):
                pass  # no/unreadable sidecar: cannot exclude
            if keep:
                survivors.append(f)
        if prune_metrics is not None:
            prune_metrics["files_bloom_pruned"] = len(files) - len(survivors)
        files = survivors
    return files


def _null_array(spark_type: str, n: int):
    """All-null arrow array of the arrow type matching a manifest spark
    type — the read shape of a schema-evolution ADDed column in files
    written before the add (evolution.py)."""
    import pyarrow as pa

    prim = {
        "tinyint": pa.int8(), "smallint": pa.int16(), "int": pa.int32(),
        "bigint": pa.int64(), "float": pa.float32(), "double": pa.float64(),
        "string": pa.string(), "boolean": pa.bool_(),
        "timestamp": pa.timestamp("us"),
    }
    if spark_type in prim:
        return pa.nulls(n, prim[spark_type])
    m = re.match(r"array<(\w+)>", spark_type)
    if m and m.group(1) in prim:
        return pa.nulls(n, pa.list_(prim[m.group(1)]))
    raise TypeError(f"cannot null-fill added column of type {spark_type!r}")


def decode_blob_batches(
    batches,
    preds: list[tuple],
    read_cols: list[str],
    names: list[str],
    acc_seen=None,
    acc_skip=None,
    acc_bloom=None,
    colmap: dict[str, list[str]] | None = None,
    coltypes: dict[str, str] | None = None,
):
    """Decode a stream of (blob, footer) Arrow batches into RecordBatches of
    `names` columns, applying the executor-side half of predicate pushdown:
    stripe-stats skip, stripe-bloom skip (both BEFORE any stream of the blob
    is decompressed), then the exact arrow row filter. Shared by
    decode_table's mapInArrow task and the tokstripe data source's read().

    `colmap` (evolution.py `column_mapping`: current name -> prior stored
    names, newest first) resolves schema evolution PER STRIPE: stripe
    footers key streams by the name current at write time, so a renamed
    column reads under whichever name this stripe stored, and an added
    column null-fills (type from `coltypes`, the manifest schema) in
    stripes that predate it. Predicates translate the same way for the
    stats/bloom skips; a stripe that lacks the column entirely cannot be
    excluded by stats and falls through to the exact row filter, where the
    null fill matches nothing."""
    for batch in batches:
        blobs = batch.column("blob")
        footers = batch.column("footer")
        for i in range(batch.num_rows):
            footer = footer_from_json(str(footers[i]))
            if acc_seen is not None:
                acc_seen.add(1)
            fcols = footer["columns"]

            def _stored(c):
                if c in fcols or colmap is None:
                    return c if c in fcols else None
                return next(
                    (a for a in colmap.get(c, ()) if a in fcols), None
                )

            spreds = preds
            if colmap is not None and preds:
                spreds = []
                for p in preds:
                    s = _stored(p[1])
                    if s is not None:
                        spreds.append((p[0], s) + tuple(p[2:]))
                    # else: this stripe has no data for the column — stats
                    # cannot exclude it; the row filter decides
            if spreds and not all(
                stripe_matches_pred(footer, p) for p in spreds
            ):
                if acc_skip is not None:
                    acc_skip.add(1)
                continue
            # STRIPE-level bloom: range stats passed, but an IN-set may
            # still miss every key in this stripe
            if spreds and not all(
                stripe_bloom_matches(footer, p)
                for p in spreds
                if p[0] == "in"
            ):
                if acc_skip is not None:
                    acc_skip.add(1)
                if acc_bloom is not None:
                    acc_bloom.add(1)
                continue
            if colmap is None:
                rb = decode_stripe(blobs[i].as_buffer(), footer, columns=read_cols)
            else:
                import pyarrow as pa

                stored = [(c, _stored(c)) for c in read_cols]
                present = [(c, s) for c, s in stored if s is not None]
                arrays, outn = [], []
                if present:
                    dec = decode_stripe(
                        blobs[i].as_buffer(), footer,
                        columns=[s for _, s in present],
                    )
                    for j, (c, _) in enumerate(present):
                        arrays.append(dec.column(j))
                        outn.append(c)
                n_rows = footer["n_rows"]
                for c, s in stored:
                    if s is None:
                        arrays.append(_null_array((coltypes or {})[c], n_rows))
                        outn.append(c)
                rb = pa.RecordBatch.from_arrays(arrays, names=outn)
                if outn != read_cols:
                    rb = rb.select(read_cols)
            if preds:
                rb = rb.filter(_row_mask(rb, preds))
                if rb.num_rows == 0:
                    continue
                if read_cols != names:
                    rb = rb.select(names)
            yield rb


EXPORT_META_SCHEMA = "pid string, stripes long, file string, n_rows long, orc_bytes long"


def export_orc(
    spark: SparkSession,
    warehouse_path: str,
    out_dir: str,
    snapshot: str | None = None,
) -> DataFrame:
    """Interchange sink: write the committed warehouse as reference-readable
    ORC files (orcexport.OrcFileWriter — liborc stream conventions,
    conformance-tested). One MULTI-STRIPE file per logical partition — the
    real ORC layout, O(#partitions) files rather than a file-per-stripe
    explosion — streamed executor-side stripe by stripe (memory stays one
    stripe) with tmp + atomic rename (idempotent under retry, same model as
    the encode sink); only O(#partitions) metadata rows return to the
    driver. A user of the reference ORC stack can consume the warehouse
    with any ORC reader after this — no engine code needed."""
    wh = Warehouse(warehouse_path)
    snapshot = wh.resolve_snapshot(snapshot)
    m = wh.read_manifest(snapshot) or {}
    # the exporter streams RAW stripe blobs, so snapshots whose correct
    # read requires merge-on-read state would export WRONG files: deleted
    # rows would resurrect, renamed columns would ship under per-file
    # stale names. Fold the state flat first; the rewrite clears both.
    if m.get("delete_files"):
        raise ValueError(
            f"snapshot {snapshot!r} carries merge-on-read delete files — "
            "exporting raw stripes would resurrect deleted rows; run "
            "maintenance.materialize_deletes first"
        )
    if m.get("column_mapping"):
        raise ValueError(
            f"snapshot {snapshot!r} has unmaterialized schema evolution — "
            "raw stripes store per-file WRITE-TIME column names; rewrite "
            "via compact_snapshots(mode='reencode') (or "
            "materialize_deletes) so every stream carries current names"
        )
    files = wh.committed_files(snapshot)
    if not files:
        raise ValueError(f"no committed files for snapshot {snapshot}")
    os.makedirs(out_dir, exist_ok=True)

    def export_partition(batches):
        from pyspark import TaskContext

        from .orcexport import OrcFileWriter

        # a pid's stripe rows can split across tasks at parquet row-group
        # boundaries, so the output name is (pid, taskPartition)-scoped:
        # no cross-task rename races, still O(#partitions) files, and a
        # retried task regenerates the identical name (idempotent)
        task_part = TaskContext.get().partitionId()
        writers: dict[str, tuple[OrcFileWriter, str, str]] = {}
        metas = []

        def finish(pid: str) -> None:
            w, tmp, final = writers.pop(pid)
            n_rows, n_stripes = w.n_rows, len(w.stripes)
            w.close()
            os.replace(tmp, final)
            metas.append(
                {
                    "pid": pid,
                    "stripes": n_stripes,
                    "file": final,
                    "n_rows": n_rows,
                    "orc_bytes": os.path.getsize(final),
                }
            )

        try:
            for batch in batches:
                for i in range(batch.num_rows):
                    pid = str(batch.column("pid")[i])
                    footer = footer_from_json(str(batch.column("footer")[i]))
                    rb = decode_stripe(batch.column("blob")[i].as_buffer(), footer)
                    if pid not in writers:
                        final = os.path.join(
                            out_dir, f"{pid.replace('/', '_')}-t{task_part}.orc"
                        )
                        tmp = final + f".inprogress-{uuid.uuid4().hex[:8]}"
                        writers[pid] = (OrcFileWriter(tmp), tmp, final)
                    writers[pid][0].add_stripe(rb)
            for pid in list(writers):
                finish(pid)
        finally:
            # a failed/retried task must not orphan its uuid-named temp
            # files (each attempt uses a fresh uuid, so nothing else would
            # ever clean them up) — drop any writer that did not finish
            for w, tmp, _ in writers.values():
                try:
                    w.fh.close()
                finally:
                    if os.path.exists(tmp):
                        os.remove(tmp)
        if metas:
            yield pa.RecordBatch.from_pylist(metas)

    sdf = spark.read.parquet(*files).select("pid", "stripe_id", "blob", "footer")
    return sdf.mapInArrow(export_partition, EXPORT_META_SCHEMA)


def import_orc(
    spark: SparkSession,
    orc_path: str,
    warehouse_path: str,
    snapshot: str,
    **encode_kw,
) -> dict:
    """Interchange source, symmetric with export_orc: ingest standard ORC
    files — written by ANY conforming writer (liborc, Spark's orc-core, or
    this engine's own exporter) — into the warehouse through the same
    single-shuffle encode pipeline. `spark.read.orc` (the JVM orc-core
    reader) does the container/stream decode with full predicate/schema
    handling; everything downstream (salting, rebalance, codec choice,
    resume, blooms) is exactly encode_table, so a reference ORC user's
    existing data migrates in with one call and no parquet detour.
    `encode_kw` forwards encode_table's layout/tuning knobs (key_col,
    source_col, weight_col, salt_buckets, stripe_tokens, ...); returns the
    committed manifest."""
    return encode_table(
        spark, spark.read.orc(orc_path), warehouse_path, snapshot, **encode_kw
    )


def _multiset_diff_counts(a: DataFrame, b: DataFrame, cols: list[str]) -> dict:
    """Exact multiset difference via union with +1/-1 tags — one shuffle and
    one pass over each side (semantically identical to symmetric exceptAll,
    the probe-verified pattern from SURVEY.md [PROBE-4], at half the cost)."""
    diff = (
        a.select(*cols).withColumn("_tag", F.lit(1))
        .unionAll(b.select(*cols).withColumn("_tag", F.lit(-1)))
        .groupBy(*cols)
        .agg(F.sum("_tag").alias("_d"))
        .where(F.col("_d") != 0)
    )
    row = diff.agg(
        F.coalesce(F.sum(F.when(F.col("_d") > 0, F.col("_d"))), F.lit(0)).alias("missing"),
        F.coalesce(F.sum(F.when(F.col("_d") < 0, -F.col("_d"))), F.lit(0)).alias("extra"),
    ).collect()[0]
    return {"missing": int(row["missing"]), "extra": int(row["extra"])}


def row_digest(cols: list[str]):
    """The verify row digest: xxhash64 over the row's JSON rendering.
    8 bytes/row cross the verify shuffle.

    The JSON pass is NOT optional: hashing raw columns directly makes
    nulls identity elements in xxhash64's fold, so whole collision CLASSES
    appear — ('a', NULL) == ('a', array()), [1, NULL] == [1],
    ('x', NULL) == (NULL, 'x') — exactly the shapes a PRESENT-stream
    decode bug would produce, silently passing the gate. JSON
    canonicalizes structure first, so only random 64-bit collisions
    remain, and those are sound for CORRUPTION detection in a multiset
    diff: collisions between two different correct rows cancel on both
    sides harmlessly; a corrupted row escapes only if its digest equals
    its own original's — 2^-64 per corrupted row, independent of corpus
    size (no birthday effect). On a digest mismatch the exact full-row
    diff re-runs anyway (verify_roundtrip)."""
    return F.xxhash64(F.to_json(F.struct(*[F.col(c) for c in cols])))


def verify_roundtrip(
    original: DataFrame,
    decoded: DataFrame,
    decoded_digest: DataFrame | None = None,
) -> dict:
    """Bit-equality gate (BASELINE.json:15): per-row token-array equality.

    Hash-first: each side is reduced to an 8-byte xxhash64 row digest
    (row_digest above — JVM-side, narrow) BEFORE the multiset-diff
    shuffle, so the verify exchange moves 8 bytes/row instead of the full
    token payload (~100× less shuffle at typical document lengths; at 100 TB
    the verify shuffle would otherwise be 2× corpus bytes). On a digest
    mismatch the exact full-row multiset diff re-runs as the drilldown so
    reported missing/extra counts stay exact row counts, not digest counts.

    `decoded_digest` (a single `_rd` column) lets a caller that already
    materialized the decoded side's digests — e.g. the flagship summary,
    which persists one narrow pass over the decode — share that pass instead
    of decoding the warehouse a second time."""
    cols = decoded.columns

    def digested(df: DataFrame) -> DataFrame:
        return df.select(row_digest(cols).alias("_rd"))

    dec_d = decoded_digest if decoded_digest is not None else digested(decoded)
    res = _multiset_diff_counts(digested(original), dec_d, ["_rd"])
    if res["missing"] or res["extra"]:
        res = _multiset_diff_counts(original, decoded, cols)
    return {**res, "ok": res["missing"] == 0 and res["extra"] == 0}
