"""`tokstripe` — the warehouse as a first-class Spark format via the Python
Data Source API (pyspark >= 4.1, `pyspark.sql.datasource`).

    from orc_spark.datasource import register
    register(spark)

    df = (spark.read.format("tokstripe")
          .option("path", warehouse).option("snapshot", "snap1").load()
          .where(F.col("doc_id").isin("7", "11")))      # pushed down

    (df2.write.format("tokstripe")
        .option("path", warehouse).option("snapshot", "snap2").save())

Read path — Catalyst's filter pushdown reaches the engine's three prune
levels through `DataSourceReader.pushFilters`:
  - planning time (driver): accepted filters run the manifest range prune +
    sidecar key-bloom prune (pipeline.plan_scan_files), so pruned files
    never become input partitions — Spark schedules NO task for them;
  - one `InputPartition` per surviving data file; `read()` streams the
    file's stripes through the shared decode generator
    (pipeline.decode_blob_batches): stripe-stats skip, stripe-bloom skip,
    then the exact arrow row filter — yielding Arrow RecordBatches straight
    into Spark's arrow ingestion;
  - filters fully handled here (EqualTo / In / >= / <= with int/str probes
    on scalar int/string columns, int/float probes on float/double columns)
    are consumed, so Spark does not re-evaluate them; strict < / > are used
    as conservative inclusive PRUNE HINTS and returned to Spark for the
    exact residual. Timestamp filters (Catalyst hands datetime probe
    values) are translated to epoch counts at the column's stored unit
    (stripe.py stores timestamps as epoch ints at the arrow unit) and
    pushed as PRUNE HINTS ONLY, bounds rounded conservatively (lower
    floored, upper ceiled) and the original filter always returned to
    Spark for exact evaluation — so a tz/unit mismatch can widen the scan
    but never change results; everything else is returned untouched.
  - column pruning: pass an explicit narrower `.schema(...)` and only those
    columns' streams are decompressed (the Python DS API does not forward
    Catalyst's column pruning, so the full-schema default decodes all
    columns; project with .schema for stream-level pruning).

Write path — executor tasks stream stripes into per-(pid, task) data files
with the SAME tmp+atomic-rename writers the pipeline uses (`_PidWriter`:
stripe split at stripe_tokens, key-sorted stripe content, stripe + sidecar
blooms), and the driver commits the collected partition metadata as one
atomic manifest (`DataSourceWriter.commit`) — Iceberg-style: data files are
invisible until the manifest rename. A failed job aborts by sweeping
in-progress temp files; already-renamed files are harmless orphans outside
the manifest. The writer does NOT reshuffle (Spark's DSv2 Python API cannot
require a distribution): rows are bucketed into pids per incoming batch, so
pre-`repartition(source, key)` upstream for one-file-per-pid layout; without
it each task writes its own pid@wN files (more, smaller files — same
correctness, metadata still O(#files)).

Streaming — `writeStream.format("tokstripe")` gives exactly-once micro-batch
encode: each task stages files under a per-invocation unique snapshot name,
and `commit(messages, batchId)` publishes them as snapshot
`<snapshot>-e<batchId>`; a replayed epoch (driver restart) detects the
already-committed batch manifest and DELETES its re-staged files instead of
committing twice. `readStream` tails committed snapshots as micro-batches
(append semantics); with `.option("mode", "cdc")` it becomes a CHANGELOG
stream instead: each commit's inserts decode from just the files it added
and its delete pre-images decode from the parent snapshot via pruned
IN-set point lookups, emitted with `_change_type` / `_commit_snapshot` /
`_commit_ordinal` — the streaming twin of `cdc.changes_between`, same
offsets, exactly-once across restarts.

KNOWN UPSTREAM SHARP EDGE (Spark 4.1, `spark.sql.python.filterPushdown
.enabled`): use ONE action per `load()` when mixing filtered and
unfiltered reads of the same DataFrame. The JVM caches the Python read
plan on the relation's `PythonDataSourceV2.readInfo` field; a query WITH
pushable filters overwrites it (`setReadInfo`) with the pruned plan, and
a LATER action with no filters on the SAME loaded DataFrame reuses that
stale pruned plan (`getOrCreateReadInfo`) — returning the previous
query's filtered rows. Verified against this engine (filtered count then
unfiltered count on one `load()` returns the filtered count twice; a
fresh `load()` is always correct, and so is any second query that itself
carries filters, because the pushdown rule re-plans). Nothing the Python
reader can observe at plan or read time distinguishes the stale reuse —
the plan worker is simply never invoked for the second query. Pinned in
tests/test_deletes.py::test_upstream_readinfo_cache_pin so a Spark
upgrade that fixes it surfaces here.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


def register(spark) -> None:
    """Register the format on `spark` — ANY session, not just the engine's
    get_spark. Spark 4.1 hard-fails a reader that overrides pushFilters when
    `spark.sql.python.filterPushdown.enabled` is false (its default) —
    [DATA_SOURCE_PUSHDOWN_DISABLED], not a silent no-pushdown — so enable
    the conf here (it is runtime-settable; verified on live sessions). If
    the session refuses the conf, register the fallback datasource whose
    reader does NOT override pushFilters: reads degrade to
    unpruned-but-correct (Spark evaluates every filter itself) instead of
    erroring. The registry is shared across sessions of one SparkContext
    (re-registering the name raises DATA_SOURCE_ALREADY_EXISTS), so a
    repeat register() is a no-op for the registry but still sets the
    session conf — which is per-session and the actual failure mode.

    Variant choice is made by the FIRST register() on a context (the
    registry is context-wide, the conf per-session), so a later session
    with the opposite conf state is handled explicitly: fallback-registered
    + pushdown-capable session reads correctly, just unpruned; pushdown-
    registered + a session whose conf cannot be enabled would hard-fail at
    read time, so register() raises the clear error up front."""
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        enabled = (
            str(spark.conf.get("spark.sql.python.filterPushdown.enabled")).lower()
            == "true"
        )
    except Exception:
        enabled = False
    ctx_id = id(spark.sparkContext)
    registered = _REGISTERED_VARIANT.get(ctx_id)
    if registered is None:
        try:
            spark.dataSource.register(
                TokstripeDataSource if enabled else TokstripeDataSourceNoPushdown
            )
            _REGISTERED_VARIANT[ctx_id] = enabled
        except Exception as e:  # registered by an earlier session: keep it
            if "DATA_SOURCE_ALREADY_EXISTS" not in str(e):
                raise
            # unknown earlier variant (registered outside this module's
            # bookkeeping, e.g. another process image): assume pushdown —
            # that is what every engine entry point registers when the conf
            # is settable, which it is on every session we have observed
            _REGISTERED_VARIANT[ctx_id] = True
            registered = True
    if registered is True and not enabled:
        raise RuntimeError(
            "the 'tokstripe' format was registered with filter pushdown on "
            "this SparkContext, but this session could not enable "
            "spark.sql.python.filterPushdown.enabled — reads from this "
            "session would fail with DATA_SOURCE_PUSHDOWN_DISABLED. Enable "
            "the conf on this session (it is runtime-settable) or create "
            "the session through orc_spark.session.get_spark."
        )


_REGISTERED_VARIANT: dict[int, bool] = {}


class TokstripeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tokstripe"

    def _warehouse(self):
        from .warehouse import Warehouse

        path = self.options.get("path")
        if not path:
            raise ValueError("tokstripe requires .option('path', <warehouse dir>)")
        return Warehouse(path)

    def schema(self):
        from .pipeline import _spark_type_str

        wh = self._warehouse()
        snapshot = wh.resolve_snapshot(self.options.get("snapshot"))
        manifest = wh.read_manifest(snapshot) if snapshot else None
        if not manifest:
            raise ValueError(
                f"no committed snapshot {snapshot!r} under {wh.path!r}"
            )
        cols = ", ".join(
            f"{n} {_spark_type_str(t)}" for n, t in manifest["schema"].items()
        )
        if self.options.get("mode") == "cdc":
            # changelog stream (readStream + mode=cdc): table columns plus
            # change attribution, same shape as cdc.changes_between
            cols += (
                ", _change_type string, _commit_snapshot string, "
                "_commit_ordinal int"
            )
        return cols

    def reader(self, schema: StructType) -> "TokstripeReader":
        return TokstripeReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> "TokstripeWriter":
        return TokstripeWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> "TokstripeStreamWriter":
        return TokstripeStreamWriter(self.options, schema)

    def streamReader(self, schema: StructType) -> "TokstripeStreamReader":
        return TokstripeStreamReader(self.options, schema)


class _FilePartition(InputPartition):
    def __init__(self, path: str, dels: tuple = (), change: str = "",
                 snap: str = "", ordinal: int = -1, keys: tuple = (),
                 kcol: str = "", colmap: dict | None = None):
        self.path = path
        self.dels = dels  # delete files applicable to THIS file (seq-scoped)
        # CDC-stream extras (mode="cdc"): change type + commit attribution,
        # pre-image key IN-set (delete partitions), and the source commit's
        # evolution mapping for name resolution
        self.change = change
        self.snap = snap
        self.ordinal = ordinal
        self.keys = keys
        self.kcol = kcol
        self.colmap = colmap


class _TokstripeReaderBase(DataSourceReader):
    """Planning + execution shared by both reader variants. Does NOT
    override pushFilters — registered as-is (TokstripeReaderNoPushdown)
    when the session cannot enable Python filter pushdown; self._preds
    then stays empty and every file of the snapshot becomes a partition."""

    def __init__(self, options, schema: StructType):
        from .pipeline import _spark_type_str
        from .warehouse import Warehouse

        if options.get("mode") == "cdc":
            raise ValueError(
                "mode='cdc' is a STREAM read (spark.readStream); the batch "
                "changelog is cdc.changes_between(spark, path, from, to)"
            )
        wh = Warehouse(options.get("path"))
        self._snapshot = wh.resolve_snapshot(options.get("snapshot"))
        manifest = wh.read_manifest(self._snapshot) if self._snapshot else None
        if not manifest or not manifest.get("partitions"):
            raise ValueError(
                f"no committed snapshot {self._snapshot!r} under {wh.path!r}"
            )
        self._manifest = manifest
        # the schema Spark asked for (defaults to schema(); may be a user-
        # narrowed subset => stream-level column pruning in decode_stripe)
        self._names = [f.name for f in schema.fields]
        unknown = [n for n in self._names if n not in manifest["schema"]]
        if unknown:
            raise ValueError(f"columns {unknown} not in snapshot schema")
        self._raw_types = dict(manifest["schema"])  # arrow strings keep ts unit
        self._types = {
            n: _spark_type_str(t) for n, t in manifest["schema"].items()
        }
        # schema evolution (evolution.py): current name -> prior stored
        # names; resolved per stripe in the shared decode kernel
        self._colmap = manifest.get("column_mapping") or None
        self._preds: list[tuple] = []       # exact: engine fully evaluates
        self._hint_preds: list[tuple] = []  # prune-only: Spark re-evaluates
        # merge-on-read deletes (deletes.py): entries are seq-scoped (an
        # upsert's delete file applies only to files BELOW its seq), so
        # partitions() attaches each file's applicable delete paths. Small
        # key sets load once at planning and ship in the reader (it is
        # serialized to every task); large sets load per task in read() —
        # the same per-task equality-delete merge Iceberg readers do,
        # memory-bounded by the set size (materialize_deletes is the
        # remedy for huge ones)
        from . import deletes as _deletes

        self._del_entries = _deletes.normalize_delete_entries(
            manifest.get("delete_files") or []
        )
        self._key_col = (manifest.get("layout") or {}).get("key_col", "doc_id")
        self._del_keymap = None  # path -> arrow key array, when small
        if self._del_entries:
            paths = [p for p, _ in self._del_entries]
            if _deletes.count_delete_keys(paths) <= _deletes.INLINE_DELETE_MAX:
                self._del_keymap = {
                    p: _deletes.load_delete_keys([p], self._key_col)
                    for p in paths
                }

    # -- planning ---------------------------------------------------------

    def _ts_scale(self, col: str) -> int | None:
        """Microseconds per stored epoch unit of timestamp column `col`
        (stripe.py encodes timestamps as epoch ints at the arrow unit).
        Datasource-written manifests carry the bare spark name 'timestamp'
        — Spark's arrow batches are always microseconds, so default us.
        Nanoseconds (finer than a datetime probe) are not translated."""
        import re

        m = re.match(r"timestamp\[(\w+)", self._raw_types.get(col, ""))
        unit = m.group(1) if m else "us"
        return {"s": 1_000_000, "ms": 1_000, "us": 1}.get(unit)

    @staticmethod
    def _ts_epoch(v, scale: int, round_up: bool) -> int:
        """datetime probe -> epoch count at the column's unit. Naive
        datetimes are session-local wall time (TimestampType.fromInternal);
        astimezone() attaches the process tz, which local-mode shares with
        the JVM session. Rounding is directional so a coarser stored unit
        only ever WIDENS the hint range (floor lower bounds, ceil upper)."""
        import datetime as _dt

        if v.tzinfo is None:
            v = v.astimezone()
        us = (v - _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)) // _dt.timedelta(
            microseconds=1
        )
        q, r = divmod(us, scale)
        return q + (1 if round_up and r else 0)

    def _pushable(self, f) -> str | None:
        """Single-segment column reference, scalar non-array type, probe
        values matching the column family (int/str for int/string columns,
        finite int/float for float/double) — else not pushable. Timestamps
        go through _translate_ts instead."""
        import math

        if len(f.attribute) != 1:
            return None
        col = f.attribute[0]
        t = self._types.get(col)
        if t is None or t.startswith("array") or t == "timestamp":
            return None
        if not hasattr(f, "value"):  # IsNull/IsNotNull/Not(...)
            return None
        # In.value arrives as a LIST from the pushdown worker (the API type
        # hint says tuple) — accept both or every IN-set is silently
        # rejected
        vals = f.value if isinstance(f.value, (tuple, list)) else (f.value,)
        if t in ("float", "double"):
            if not all(
                isinstance(v, (int, float))
                and not isinstance(v, bool)
                and math.isfinite(v)
                for v in vals
            ):
                return None
        elif not all(
            isinstance(v, (int, str)) and not isinstance(v, bool) for v in vals
        ):
            return None
        return col

    def _translate_ts(self, f) -> tuple | None:
        """Timestamp filter -> conservative inclusive prune-hint predicate
        over the stored epoch ints, or None. The caller ALWAYS yields the
        original filter back to Spark, so hints only skip files/stripes
        whose stats are disjoint from the widened range — rounding or tz
        slack can cost pruning, never rows."""
        import datetime as _dt

        if len(f.attribute) != 1 or not hasattr(f, "value"):
            return None
        col = f.attribute[0]
        if self._types.get(col) != "timestamp":
            return None
        scale = self._ts_scale(col)
        if scale is None:
            return None
        # In.value arrives as a LIST from the pushdown worker (the API type
        # hint says tuple) — accept both or every IN-set is silently
        # rejected
        vals = f.value if isinstance(f.value, (tuple, list)) else (f.value,)
        if not all(isinstance(v, _dt.datetime) for v in vals):
            return None
        if isinstance(f, (EqualTo, In)):
            lo = min(self._ts_epoch(v, scale, round_up=False) for v in vals)
            hi = max(self._ts_epoch(v, scale, round_up=True) for v in vals)
            return ("between", col, lo, hi)
        if isinstance(f, (GreaterThan, GreaterThanOrEqual)):
            return ("between", col, self._ts_epoch(f.value, scale, False), None)
        if isinstance(f, (LessThan, LessThanOrEqual)):
            return ("between", col, None, self._ts_epoch(f.value, scale, True))
        return None

    def partitions(self):
        from .pipeline import plan_scan_files

        preds = self._preds + self._hint_preds
        if preds:
            files = plan_scan_files(self._manifest, preds)
        else:
            files = [p["file"] for p in self._manifest["partitions"].values()]
        if self._del_entries:
            seq_of = {
                p["file"]: p.get("seq", 0)
                for p in self._manifest["partitions"].values()
            }
            parts = []
            for f in files:
                fs = seq_of.get(f, 0)
                appl = tuple(sorted(
                    p for p, s in self._del_entries if s is None or s > fs
                ))
                parts.append(_FilePartition(f, appl))
        else:
            parts = [_FilePartition(f) for f in files]
        # empty scan: the API needs >= 1 partition; read() of a pruned-out
        # file yields nothing, so hand back one no-op partition
        return parts or [_FilePartition("")]

    # -- execution (executor-side) ---------------------------------------

    def read(self, partition: _FilePartition):
        if not partition.path:
            return
        import pyarrow.parquet as pq

        from .pipeline import decode_blob_batches

        preds = self._preds + self._hint_preds
        pcols = [p[1] for p in preds]
        appl = getattr(partition, "dels", ())
        del_keys = None
        if appl:
            import pyarrow as pa

            from . import deletes as _deletes

            km = self._del_keymap
            ks = [
                km[p] if km is not None
                else _deletes.load_delete_keys([p], self._key_col)
                for p in appl
            ]
            ks = [
                k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k
                for k in ks
            ]
            del_keys = ks[0] if len(ks) == 1 else pa.concat_arrays(ks)
        need_key = del_keys is not None and self._key_col not in self._names
        inner = self._names + [self._key_col] if need_key else self._names
        read_cols = inner + [c for c in pcols if c not in inner]
        pf = pq.ParquetFile(partition.path)
        for b in pf.iter_batches(columns=["blob", "footer"]):
            for rb in decode_blob_batches(
                [b], preds, read_cols, inner,
                colmap=self._colmap,
                coltypes=self._raw_types if self._colmap else None,
            ):
                if del_keys is not None:
                    import pyarrow.compute as pc

                    hit = pc.fill_null(
                        pc.is_in(rb.column(inner.index(self._key_col)),
                                 value_set=del_keys),
                        False,
                    )
                    rb = rb.filter(pc.invert(hit))
                    if need_key:
                        rb = rb.select(self._names)
                yield rb


class TokstripeReaderNoPushdown(_TokstripeReaderBase):
    """Availability fallback: identical reads, no pushFilters override, so
    sessions that cannot enable spark.sql.python.filterPushdown.enabled
    still read the format (Spark applies all filters post-scan)."""


class TokstripeReader(_TokstripeReaderBase):
    def pushFilters(self, filters):
        for f in filters:
            col = self._pushable(f)
            if col is None:
                ts_hint = self._translate_ts(f)
                if ts_hint is not None:
                    self._hint_preds.append(ts_hint)
                yield f
            elif isinstance(f, EqualTo):
                self._preds.append(("in", col, [f.value]))
            elif isinstance(f, In):
                self._preds.append(("in", col, sorted(set(f.value))))
            elif isinstance(f, GreaterThanOrEqual):
                self._preds.append(("between", col, f.value, None))
            elif isinstance(f, LessThanOrEqual):
                self._preds.append(("between", col, None, f.value))
            elif isinstance(f, GreaterThan):
                # inclusive superset prunes; Spark applies the strict rest
                self._hint_preds.append(("between", col, f.value, None))
                yield f
            elif isinstance(f, LessThan):
                self._hint_preds.append(("between", col, None, f.value))
                yield f
            else:
                yield f


class TokstripeDataSourceNoPushdown(TokstripeDataSource):
    """Same format name, fallback reader (see register)."""

    def reader(self, schema: StructType) -> "TokstripeReaderNoPushdown":
        return TokstripeReaderNoPushdown(self.options, schema)


class TokstripeStreamReader(DataSourceStreamReader):
    """Tail the warehouse as a stream: every snapshot that commits becomes a
    micro-batch (one task per data file). The offset is a single integer —
    a position in the warehouse's append-only commit log
    (Warehouse.commit_log), so checkpoints stay O(1) no matter how long the
    warehouse's tail grows (the previous full-name-list offset grew without
    bound). Snapshot publication is atomic (one manifest rename), so a
    logged snapshot is complete; snapshots must not be re-committed after
    publication when consumed this way (encode_table commits once at the
    end of a job; stream-writer epochs are final). Use
    .option("snapshot_prefix", ...) to tail one logical stream (e.g. a
    stream writer's '<name>-e' epochs) out of a shared warehouse — the
    prefix filter applies at planning, positions are warehouse-global."""

    CDC_COLS = ("_change_type", "_commit_snapshot", "_commit_ordinal")

    def __init__(self, options, schema: StructType):
        self._wh_path = options.get("path")
        if not self._wh_path:
            raise ValueError("tokstripe requires .option('path', <warehouse dir>)")
        self._prefix = options.get("snapshot_prefix", "")
        self._cdc = options.get("mode") == "cdc"
        self._names = [f.name for f in schema.fields]
        self._types = {f.name: f.dataType.simpleString() for f in schema.fields}
        if self._cdc:
            self._names = [n for n in self._names if n not in self.CDC_COLS]

    def _wh(self):
        from .warehouse import Warehouse

        return Warehouse(self._wh_path)

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        return {"pos": len(self._wh().commit_log())}

    def partitions(self, start: dict, end: dict):
        wh = self._wh()
        log = wh.commit_log()
        # legacy (pre-log) checkpoints carry name-lists under "seen"; honor
        # them at BOTH bounds — a replayed legacy batch (start AND end
        # legacy) must re-deliver exactly its original names, not everything
        # committed since, or the following pos-based batch re-delivers the
        # overhang (duplicates, breaking exactly-once)
        if "seen" in end:
            in_end = set(end["seen"])
            cand = [s for s in log if s in in_end]
        else:
            cand = log[: end.get("pos", len(log))]
        if "seen" in start:
            in_start = set(start["seen"])
            new = [s for s in cand if s not in in_start]
        else:
            # pos start with legacy end cannot occur (offsets only move
            # forward from legacy to pos); slice is the pos/pos fast path
            new = cand[start.get("pos", 0):]
        new = [s for s in new if s.startswith(self._prefix)]
        # this is an APPEND stream (Iceberg incremental-append-scan
        # semantics, deletes.py): 'delete' snapshots share their parent's
        # data files verbatim — emitting one would re-deliver the whole
        # parent table, so they are metadata-only here; 'stage' snapshots
        # are an upsert's staging commit (their files deliver exactly once
        # through the upsert dest); an 'upsert' delivers only its NEW
        # files (partition seq == the upsert's seq). Retractions are out
        # of scope for an append stream, as in Iceberg.
        if self._cdc:
            parts = self._cdc_partitions(wh, log, new)
            return parts or [_FilePartition("")]
        out = []
        for s in new:
            m = wh.read_manifest(s)
            if m is None:  # expired, or a removed stage manifest
                continue
            op = m.get("operation")
            if op in ("delete", "stage"):
                continue
            parts = m.get("partitions", {}).values()
            if op == "upsert":
                seq = m.get("seq")
                files = [p["file"] for p in parts if p.get("seq", 0) == seq]
            else:
                files = [p["file"] for p in parts]
            # evolution-aware: this commit's alias mapping resolves its
            # files' stored stream names against the bound read schema
            cm = m.get("column_mapping") or None
            out += [_FilePartition(f, colmap=cm) for f in files]
        return out or [_FilePartition("")]

    def _cdc_partitions(self, wh, log, new):
        """Changelog planning (mode='cdc'), mirroring cdc.changes_between:
        per commit, inserts = the files it added (decoded directly), delete
        pre-images = its new delete keys read from the PARENT snapshot via
        the pruned IN-set scan, honoring the parent's own deletes. Pre-image
        keys ride in the partition (driver-planned); a delete commit whose
        key set exceeds deletes.INLINE_DELETE_MAX fails loudly — consume a
        table-rewrite-sized delete as a new base, not a change stream."""
        from . import deletes as _deletes
        from .pipeline import plan_scan_files

        out = []
        for s in new:
            m = wh.read_manifest(s)
            if m is None:
                if s.endswith("-stage"):
                    continue
                raise ValueError(
                    f"snapshot {s!r} in the CDC stream range is expired — "
                    "its row pre-images are gone"
                )
            op = m.get("operation") or "append"
            if op in ("stage", "evolve") or m.get("compacted_from") \
                    or m.get("materialized_from"):
                continue
            ordinal = log.index(s)
            kcol = (m.get("layout") or {}).get("key_col", "doc_id")
            colmap = m.get("column_mapping") or None
            parent_name = m.get("delete_parent") or m.get("upsert_parent")
            if op in ("delete", "upsert"):
                pm = wh.read_manifest(parent_name) if parent_name else None
                if pm is None:
                    raise ValueError(
                        f"parent {parent_name!r} of {s!r} is expired — "
                        "CDC pre-images are gone"
                    )
                pdels = set(_deletes.delete_files_of(pm))
                new_dels = [
                    p for p in _deletes.delete_files_of(m) if p not in pdels
                ]
                if new_dels:
                    n_keys = _deletes.count_delete_keys(new_dels)
                    if n_keys > _deletes.INLINE_DELETE_MAX:
                        raise ValueError(
                            f"delete commit {s!r} removes {n_keys} keys — "
                            "above the CDC stream's in-partition bound; "
                            "re-baseline the consumer or use batch "
                            "cdc.changes_between"
                        )
                    keys = tuple(
                        _deletes.load_delete_keys(new_dels, kcol).to_pylist()
                    )
                    if keys:
                        pentries = _deletes.normalize_delete_entries(
                            pm.get("delete_files") or []
                        )
                        hit_files = set(plan_scan_files(
                            pm, [("in", kcol, list(keys))]
                        ))
                        for p in pm["partitions"].values():
                            f = p["file"]
                            if f not in hit_files:
                                continue
                            fseq = p.get("seq", 0)
                            appl = tuple(sorted(
                                d for d, ds in pentries
                                if ds is None or ds > fseq
                            ))
                            out.append(_FilePartition(
                                f, dels=appl, change="delete", snap=s,
                                ordinal=ordinal, keys=keys, kcol=kcol,
                                colmap=pm.get("column_mapping"),
                            ))
            parts = m.get("partitions", {}).values()
            if op == "upsert":
                seq = m.get("seq")
                ins = [p["file"] for p in parts if p.get("seq", 0) == seq]
            elif op == "delete":
                ins = []
            else:
                ins = [p["file"] for p in parts]
            out += [
                _FilePartition(f, change="insert", snap=s, ordinal=ordinal,
                               colmap=colmap)
                for f in ins
            ]
        return out

    def read(self, partition: _FilePartition):
        if not partition.path:
            return
        import pyarrow.parquet as pq

        from .pipeline import decode_blob_batches

        names = self._names
        kcol = partition.kcol
        preds = [("in", kcol, list(partition.keys))] if partition.keys else []
        appl = getattr(partition, "dels", ())
        need_key = bool(appl) and kcol and kcol not in names
        inner = names + [kcol] if need_key else names
        read_cols = inner + [p[1] for p in preds if p[1] not in inner]
        del_keys = None
        if appl:
            import pyarrow as pa

            from . import deletes as _deletes

            ks = [
                k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k
                for k in (_deletes.load_delete_keys([p], kcol or "doc_id")
                          for p in appl)
            ]
            del_keys = ks[0] if len(ks) == 1 else pa.concat_arrays(ks)
        colmap = getattr(partition, "colmap", None)
        pf = pq.ParquetFile(partition.path)
        for b in pf.iter_batches(columns=["blob", "footer"]):
            for rb in decode_blob_batches(
                [b], preds, read_cols, inner,
                colmap=colmap, coltypes=self._types if colmap else None,
            ):
                if del_keys is not None:
                    import pyarrow.compute as pc

                    hit = pc.fill_null(
                        pc.is_in(rb.column(inner.index(kcol)),
                                 value_set=del_keys),
                        False,
                    )
                    rb = rb.filter(pc.invert(hit))
                    if need_key:
                        rb = rb.select(names)
                if self._cdc:
                    import pyarrow as pa

                    n = rb.num_rows
                    rb = pa.RecordBatch.from_arrays(
                        list(rb.columns)
                        + [
                            pa.array([partition.change] * n, pa.string()),
                            pa.array([partition.snap] * n, pa.string()),
                            pa.array([partition.ordinal] * n, pa.int32()),
                        ],
                        names=names + list(self.CDC_COLS),
                    )
                yield rb

    def commit(self, end: dict) -> None:
        pass  # snapshots are durable; nothing to release


class _CommitMsg(WriterCommitMessage):
    def __init__(self, partitions: dict):
        self.partitions = partitions


def _encode_task(options, schema: StructType, snapshot: str, batches):
    """Executor-side shared write path (batch + streaming): bucket rows into
    pids, stream stripes through the pipeline's per-pid writers (stripe
    split, key-sorted content, blooms, tmp+atomic rename), return the
    partition metadata dicts."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from pyspark import TaskContext

    from .codecs import bloom as bloomc
    from .pipeline import _make_encoder

    key_col = options.get("key_col", "doc_id")
    source_col = options.get("source_col", "source")
    if source_col == "":
        source_col = None
    weight_col = options.get("weight_col", "n_tok")
    if weight_col == "":
        weight_col = None
    salt = int(options.get("salt_buckets", "32"))
    stripe_tokens = int(options.get("stripe_tokens", "4000000"))
    field_names = [f.name for f in schema.fields]
    if weight_col is not None and weight_col not in field_names:
        weight_col = None
    tid = TaskContext.get().partitionId() if TaskContext.get() else 0

    def with_pid(rb: pa.RecordBatch) -> pa.RecordBatch:
        keys = rb.column(key_col)
        if pa.types.is_string(keys.type) or pa.types.is_large_string(keys.type):
            h1, _ = bloomc.hash_pairs_str_array(keys)
        else:
            h1, _ = bloomc.hash_pairs_int(
                keys.cast(pa.int64()).to_numpy(zero_copy_only=False)
            )
        bucket = pc.cast(pa.array((h1 % salt).astype("int64")), pa.string())
        if source_col is not None:
            pid = pc.binary_join_element_wise(
                rb.column(source_col).cast(pa.string()), bucket, "#b"
            )
        else:
            pid = pc.binary_join_element_wise(
                pa.array(["all"] * rb.num_rows), bucket, "#b"
            )
        pid = pc.binary_join_element_wise(pid, f"w{tid}", "@")
        return rb.append_column("pid", pid)

    encode = _make_encoder(
        options.get("path"), snapshot, stripe_tokens, key_col, weight_col
    )
    metas = {}
    for meta_batch in encode(with_pid(b) for b in batches):
        for row in meta_batch.to_pylist():
            metas[row["pid"]] = row
    return metas


def _schema_dict(schema: StructType) -> dict:
    return {f.name: f.dataType.simpleString() for f in schema.fields}


class TokstripeWriter(DataSourceArrowWriter):
    """Batch writer: tasks write data files (atomic rename, idempotent under
    task retry — a retried partition regenerates the same (pid, task) file
    names), driver publishes ONE manifest in commit(). overwrite=True
    replaces an existing snapshot's manifest; otherwise the snapshot must
    not already be committed."""

    def __init__(self, options, schema: StructType, overwrite: bool):
        self.options = dict(options)
        self.schema = schema
        self.overwrite = overwrite
        self.snapshot = self.options.get("snapshot") or f"ds-{uuid.uuid4().hex[:12]}"
        from .warehouse import Warehouse

        wh = Warehouse(self.options.get("path"))
        if not overwrite and wh.read_manifest(self.snapshot):
            raise ValueError(
                f"snapshot {self.snapshot!r} already committed; use "
                f"mode('overwrite') or a new snapshot name"
            )

    def write(self, iterator):
        return _CommitMsg(
            _encode_task(self.options, self.schema, self.snapshot, iterator)
        )

    def commit(self, messages):
        from .warehouse import Warehouse

        wh = Warehouse(self.options.get("path"))
        if self.overwrite:
            try:
                os.remove(wh.manifest_file(self.snapshot))
            except OSError:
                pass
        partitions = {}
        for m in messages:
            if m is not None:
                partitions.update(m.partitions)
        layout = {
            "key_col": self.options.get("key_col", "doc_id"),
            "source_col": self.options.get("source_col", "source") or None,
            "weight_col": self.options.get("weight_col", "n_tok") or None,
        }
        wh.commit(
            self.snapshot, partitions, _schema_dict(self.schema),
            extra={"layout": layout},
        )

    def abort(self, messages):
        _sweep_inprogress(self.options.get("path"))


def _sweep_inprogress(warehouse_path: str) -> None:
    """Remove leftover '*.inprogress-*' temp files after a failed job.
    Renamed-but-uncommitted data files stay — they are invisible to readers
    (manifest never published) and resumable jobs may adopt them."""
    data_dir = os.path.join(warehouse_path, "data")
    if not os.path.isdir(data_dir):
        return
    for d in os.listdir(data_dir):
        pd = os.path.join(data_dir, d)
        if not os.path.isdir(pd):
            continue
        for f in os.listdir(pd):
            if ".inprogress-" in f:
                try:
                    os.remove(os.path.join(pd, f))
                except OSError:
                    pass


class TokstripeStreamWriter(DataSourceStreamArrowWriter):
    """Micro-batch sink with exactly-once across driver restarts: tasks
    stage data files under a unique per-invocation snapshot name; commit
    publishes them as '<snapshot>-e<batchId>'. A replayed epoch sees the
    batch manifest already committed and deletes its re-staged files
    instead of double-publishing."""

    def __init__(self, options, schema: StructType):
        self.options = dict(options)
        self.schema = schema
        self.base = self.options.get("snapshot", "stream")

    def _epoch_snapshot(self, batch_id: int) -> str:
        return f"{self.base}-e{batch_id:06d}"

    def write(self, iterator):
        stage = f"{self.base}-stage-{uuid.uuid4().hex[:12]}"
        return _CommitMsg(
            _encode_task(self.options, self.schema, stage, iterator)
        )

    def commit(self, messages, batchId: int):
        from .warehouse import Warehouse

        wh = Warehouse(self.options.get("path"))
        snap = self._epoch_snapshot(batchId)
        partitions = {}
        for m in messages:
            if m is not None:
                partitions.update(m.partitions)
        if wh.read_manifest(snap):
            # replayed epoch after restart: already published exactly once —
            # drop the re-staged files
            for p in partitions.values():
                try:
                    os.remove(p["file"])
                    side = p["file"] + ".bloom.json"
                    if os.path.exists(side):
                        os.remove(side)
                except OSError:
                    pass
            return
        layout = {
            "key_col": self.options.get("key_col", "doc_id"),
            "source_col": self.options.get("source_col", "source") or None,
            "weight_col": self.options.get("weight_col", "n_tok") or None,
        }
        wh.commit(snap, partitions, _schema_dict(self.schema), extra={"layout": layout})

    def abort(self, messages, batchId: int):
        # remove staged files of the failed epoch (they are referenced only
        # by the never-published commit messages) + temp leftovers
        for m in messages:
            if m is None:
                continue
            for p in m.partitions.values():
                try:
                    os.remove(p["file"])
                    side = p["file"] + ".bloom.json"
                    if os.path.exists(side):
                        os.remove(side)
                except OSError:
                    pass
        _sweep_inprogress(self.options.get("path"))
