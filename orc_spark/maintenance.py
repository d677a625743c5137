"""Warehouse maintenance: snapshot compaction and expiry.

The stream sink commits ONE snapshot per micro-batch epoch (streaming.py), so
a long-running ingest leaves the warehouse with many small per-epoch files
per pid: planning cost (manifest + bloom-sidecar reads) grows with file
count, and tiny stripes under-amortize their footers. These are the Iceberg
`rewrite_data_files` / `expire_snapshots` analogs for this layout.

`compact_snapshots` has two modes with very different costs:

- **concat** (default): per pid, the stripe rows of every source file are
  streamed into ONE dest file — blobs are copied verbatim, NEVER decoded
  (zero codec CPU, I/O-bound); file blooms OR together (same fixed m,
  codecs/bloom.FILE_BLOOM_BITS) and key ranges merge in the key's native
  order. Stripe count is preserved; what collapses is the FILE count —
  exactly the per-epoch fragmentation the stream sink creates. One Spark
  stage, no shuffle: the pid->files plan is O(#pids) driver metadata,
  executors stream file-to-file, only META rows return (same commit
  discipline as encode_table).
- **reencode**: decode the union of the source snapshots and push it back
  through encode_table — full codec cost, but tiny stripes re-pack to
  `stripe_tokens` and codec choices re-fit the merged distribution. Use
  when stripes (not just files) are fragmented.

Both commit `dest_snapshot` atomically with `compacted_from` lineage; source
snapshots stay readable until `expire_snapshots` removes them. Expiry
reference-checks data files against the surviving manifests because
merge-on-read delete snapshots (deletes.py) share their parent's files;
`concat` refuses delete-bearing sources (verbatim blob copy would resurrect
deleted rows) — `materialize_deletes` / `mode="reencode"` rewrite those
through the full decode (deletes applied) -> encode pipeline instead.

At 100 TB: concat tasks are pure streaming copies (memory = one Arrow row
group), one task per pid, no shuffle, no driver funnel; expiry is a metadata
walk + delete fan-out. Both idempotent — concat re-runs skip committed pids
via the warehouse resume contract, expiry re-runs are no-ops.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import SparkSession

from .codecs import bloom as bloomc
from .pipeline import (
    DEFAULT_STRIPE_TOKENS,
    META_SCHEMA,
    STRIPE_FILE_SCHEMA,
    decode_table,
    encode_table,
)
from .warehouse import Warehouse


def _load_source_manifests(wh: Warehouse, snapshots: list[str]) -> list[dict]:
    manifests = []
    for s in snapshots:
        m = wh.read_manifest(s)
        if m is None:
            raise ValueError(f"snapshot {s!r} has no manifest")
        manifests.append(m)
    schema0 = manifests[0]["schema"]
    layout0 = manifests[0].get("layout") or {}
    for s, m in zip(snapshots[1:], manifests[1:]):
        if m["schema"] != schema0:
            raise ValueError(f"snapshot {s!r} schema differs — cannot compact")
        if (m.get("layout") or {}) != layout0:
            raise ValueError(f"snapshot {s!r} layout differs — cannot compact")
    return manifests


def _merge_sidecar_blooms(files: list[str], dest: str) -> None:
    """OR the source files' key blooms into one sidecar for the merged file.
    All writers use the same fixed FILE_BLOOM_BITS, so the union is exact
    (a bloom of the union of key sets). Any missing/mismatched sidecar means
    no merged sidecar — planners then simply cannot bloom-prune this file,
    which is always conservative."""
    acc, n, col = None, 0, None
    for f in files:
        try:
            with open(f + ".bloom.json") as fh:
                meta = json.load(fh)
            bits = bloomc.bloom_from_meta(meta)
        except (OSError, ValueError):
            return
        if bits is None or len(bits) * 8 != bloomc.FILE_BLOOM_BITS:
            return
        if acc is None:
            acc, col = bits.copy(), meta.get("column")
        elif meta.get("column") != col:
            return
        else:
            acc |= bits
        n += int(meta.get("n", 0))
    if acc is None:
        return
    tmp = dest + f".bloom.inprogress-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump({"column": col, **bloomc.bloom_to_meta(acc, n)}, fh)
    os.replace(tmp, dest + ".bloom.json")


def _concat_pid(
    warehouse_path: str, dest_snapshot: str, pid: str, files: list[str]
) -> dict:
    """Stream one pid's source files into its single dest file, stripe rows
    copied verbatim (blob bytes untouched), stripe_id renumbered. Runs
    executor-side; memory = one parquet row group."""
    wh = Warehouse(warehouse_path)
    final = wh.data_file(pid, dest_snapshot)
    os.makedirs(os.path.dirname(final), exist_ok=True)
    tmp = final + f".inprogress-{uuid.uuid4().hex[:8]}"
    t0 = time.perf_counter()
    stripes = n_rows = n_tokens = enc_bytes = 0
    try:
        with pq.ParquetWriter(tmp, STRIPE_FILE_SCHEMA, compression="none") as w:
            for f in files:
                pf = pq.ParquetFile(f)
                for rg in range(pf.num_row_groups):
                    t = pf.read_row_group(rg)
                    k = t.num_rows
                    t = t.set_column(
                        t.schema.get_field_index("stripe_id"),
                        "stripe_id",
                        pa.array(
                            np.arange(stripes, stripes + k, dtype=np.int64)
                        ),
                    )
                    w.write_table(t)
                    stripes += k
                    n_rows += int(sum(t.column("n_rows").to_pylist()))
                    n_tokens += int(sum(t.column("n_tokens").to_pylist()))
                    enc_bytes += int(sum(t.column("enc_bytes").to_pylist()))
    except BaseException:
        try:
            os.remove(tmp)
        except OSError:
            pass
        raise
    _merge_sidecar_blooms(files, final)  # sidecar lands BEFORE data visible
    os.replace(tmp, final)
    return {
        "pid": pid,
        "file": final,
        "stripes": stripes,
        "n_rows": n_rows,
        "n_tokens": n_tokens,
        "enc_bytes": enc_bytes,
        "encode_s": time.perf_counter() - t0,
    }


def compact_snapshots(
    spark: SparkSession,
    warehouse_path: str,
    snapshots: list[str],
    dest_snapshot: str,
    mode: str = "concat",
    stripe_tokens: int = DEFAULT_STRIPE_TOKENS,
    salt_buckets: int = 32,
) -> dict:
    """Merge `snapshots` (in the given order — decode order is concat order,
    so keep them chronological) into one `dest_snapshot`. Returns the
    committed manifest. See module docstring for the concat/reencode
    tradeoff."""
    wh = Warehouse(warehouse_path)
    if not snapshots:
        raise ValueError("no source snapshots")
    if dest_snapshot in snapshots:
        raise ValueError("dest snapshot must not be a compaction source")
    manifests = _load_source_manifests(wh, snapshots)
    schema = manifests[0]["schema"]
    layout = manifests[0].get("layout") or {}
    extra = {"layout": layout, "compacted_from": list(snapshots)}

    if mode == "reencode":
        dfs = [decode_table(spark, warehouse_path, s) for s in snapshots]
        df = dfs[0]
        for d in dfs[1:]:
            df = df.unionByName(d)
        encode_table(
            spark,
            df,
            warehouse_path,
            dest_snapshot,
            salt_buckets=salt_buckets,
            stripe_tokens=stripe_tokens,
            key_col=layout.get("key_col", "doc_id"),
            source_col=layout.get("source_col", "source"),
            weight_col=layout.get("weight_col", "n_tok"),
        )
        return wh.commit(dest_snapshot, {}, schema, extra=extra)
    if mode != "concat":
        raise ValueError(f"unknown compaction mode {mode!r}")
    for s, m in zip(snapshots, manifests):
        if m.get("delete_files"):
            raise ValueError(
                f"snapshot {s!r} carries merge-on-read delete files: concat "
                "copies blobs verbatim and would resurrect deleted rows — "
                "use maintenance.materialize_deletes (or mode='reencode') "
                "to rewrite it first"
            )
        if m["schema"] != schema or (m.get("column_mapping") or {}) != (
            manifests[0].get("column_mapping") or {}
        ):
            raise ValueError(
                f"snapshot {s!r} has a different schema/evolution state "
                "than the first source: concat copies blobs verbatim — "
                "use mode='reencode' to unify schemas"
            )
    # blobs keep their stored stream names, so the dest must inherit the
    # sources' evolution mapping (evolution.py); reencode writes fresh
    # streams under current names and clears it
    if manifests[0].get("column_mapping"):
        extra["column_mapping"] = manifests[0]["column_mapping"]
        extra["retired_names"] = manifests[0].get("retired_names") or []

    # pid -> ordered source files + parsed key ranges (driver-side metadata
    # only: O(#pids), the same scale class as an Iceberg manifest rewrite)
    key_col = layout.get("key_col", "doc_id")
    key_is_int = schema.get(key_col, "string") in (
        "tinyint", "smallint", "int", "bigint",
    )
    plan: dict[str, list[str]] = {}
    lo: dict[str, object] = {}
    hi: dict[str, object] = {}
    for m in manifests:
        for pid, part in m["partitions"].items():
            plan.setdefault(pid, []).append(part["file"])
            mn, mx = part.get("min_doc_id"), part.get("max_doc_id")
            if mn is None or mx is None or mn == "" or mx == "":
                continue
            if key_is_int:
                mn, mx = int(json.loads(mn)), int(json.loads(mx))
            if pid not in lo or mn < lo[pid]:
                lo[pid] = mn
            if pid not in hi or mx > hi[pid]:
                hi[pid] = mx

    committed = wh.committed_pids(dest_snapshot)  # idempotent re-run
    todo = sorted(p for p in plan if p not in committed)
    if todo:
        rows = spark.createDataFrame(
            [(p, json.dumps(plan[p])) for p in todo], "pid string, files string"
        )
        n_tasks = min(len(todo), spark.sparkContext.defaultParallelism)

        def run(batches):
            for b in batches:
                out = [
                    _concat_pid(
                        warehouse_path,
                        dest_snapshot,
                        b.column("pid")[i].as_py(),
                        json.loads(b.column("files")[i].as_py()),
                    )
                    for i in range(b.num_rows)
                ]
                for r in out:  # META_SCHEMA parity for the commit below
                    r["min_doc_id"] = r["max_doc_id"] = ""
                yield pa.RecordBatch.from_pylist(out)

        metas = (
            rows.repartition(n_tasks, "pid").mapInArrow(run, META_SCHEMA).collect()
        )
        parts = {}
        for r in metas:
            d = r.asDict()
            p = d["pid"]
            # "" = no recorded range (file_matches treats it as cannot-exclude)
            for k, v in (("min_doc_id", lo.get(p)), ("max_doc_id", hi.get(p))):
                d[k] = v if isinstance(v, str) else ("" if v is None else json.dumps(v))
            d["compacted"] = True
            parts[p] = d
    else:
        parts = {}
    return wh.commit(dest_snapshot, parts, schema, extra=extra)


def materialize_deletes(
    spark: SparkSession,
    warehouse_path: str,
    snapshot: str | None = None,
    dest_snapshot: str | None = None,
    stripe_tokens: int = DEFAULT_STRIPE_TOKENS,
    salt_buckets: int = 32,
) -> dict:
    """Rewrite a delete-bearing snapshot into `dest_snapshot` with its
    merge-on-read deletes applied — the Iceberg
    `rewrite_data_files` pass that folds v2 delete files back into data
    files. decode_table applies the delete files during the scan, so this
    is exactly the reencode pipeline; the resulting manifest carries NO
    `delete_files` (the rows are physically gone) plus
    `materialized_from` lineage. The source snapshot stays readable (and
    still merge-on-read) until expired; its delete files become
    collectable once no surviving manifest references them. Cost: full
    decode+encode of the LIVE rows — pay it when the delete ratio or the
    per-read merge cost warrants, same calculus as Iceberg."""
    wh = Warehouse(warehouse_path)
    snapshot = wh.resolve_snapshot(snapshot)
    m = wh.read_manifest(snapshot)
    if not m:
        raise ValueError(f"no manifest for snapshot {snapshot!r}")
    dels = m.get("delete_files") or []
    if dest_snapshot is None:
        dest_snapshot = f"{snapshot}-mat"
    if wh.read_manifest(dest_snapshot):
        raise ValueError(f"snapshot {dest_snapshot!r} already exists")
    layout = m.get("layout") or {}
    df = decode_table(spark, warehouse_path, snapshot=snapshot)
    encode_table(
        spark,
        df,
        warehouse_path,
        dest_snapshot,
        salt_buckets=salt_buckets,
        stripe_tokens=stripe_tokens,
        key_col=layout.get("key_col", "doc_id"),
        source_col=layout.get("source_col", "source"),
        weight_col=layout.get("weight_col", "n_tok"),
    )
    return wh.commit(
        dest_snapshot,
        {},
        m["schema"],
        extra={
            "layout": layout,
            "materialized_from": snapshot,
            "deletes_applied": len(dels),
        },
    )


def expire_snapshots(
    warehouse_path: str, expire: list[str], keep_current: bool = True
) -> dict:
    """Delete the listed snapshots' manifests, then every data file, bloom
    sidecar, and delete file of theirs that no SURVIVING manifest still
    references. Encode, stream, and compact write per-snapshot files, but
    merge-on-read delete snapshots (deletes.py) share their parent's data
    files verbatim — so expiry reference-checks against the remaining
    manifests (the same reachability root vacuum uses) instead of assuming
    exclusivity: expiring a delete's parent keeps the shared files alive
    for the child, expiring both collects them. Refuses to expire the
    CURRENT snapshot unless `keep_current=False` (after compaction, CURRENT
    is the dest snapshot, so expiring the sources is always safe).
    Idempotent: missing files are fine. Returns {'files_deleted': n,
    'snapshots': [...]}. At 100 TB the deletes fan out per object and the
    reference set is O(#partitions x #snapshots) manifest entries — driver
    metadata, same as Iceberg's expire-snapshots planning."""
    wh = Warehouse(warehouse_path)
    cur = wh.current_snapshot_id()
    expiring = set(expire)
    refd = {
        r["snapshot"]: name for name, r in wh.refs().items()
    }
    for s in expire:
        if keep_current and s == cur:
            raise ValueError(f"refusing to expire CURRENT snapshot {s!r}")
        if s in refd:
            raise ValueError(
                f"snapshot {s!r} is pinned by ref {refd[s]!r} — tags/"
                "branches protect retention (delete_ref first)"
            )
    doomed = [wh.read_manifest(s) for s in expire]
    # drop manifests first so the survivors' reference set is final
    n = 0
    for s in expire:
        try:
            os.remove(wh.manifest_file(s))
            n += 1
        except OSError:
            pass
    from .deletes import delete_files_of

    live: set[str] = set()
    for f in os.listdir(wh.manifest_dir):
        if not (f.startswith("snap-") and f.endswith(".json")):
            continue
        m = wh.read_manifest(f[len("snap-"):-len(".json")])
        live.update(p["file"] for p in (m or {}).get("partitions", {}).values())
        live.update(delete_files_of(m))
    for m in doomed:
        cand = [f["file"] for f in (m or {}).get("partitions", {}).values()]
        cand += delete_files_of(m)
        for f in cand:
            if f in live:
                continue
            for path in (f, f + ".bloom.json"):
                try:
                    os.remove(path)
                    n += 1
                except OSError:
                    pass
    return {"files_deleted": n, "snapshots": list(expiring)}


VACUUM_MIN_AGE_S = 3 * 24 * 3600.0  # Iceberg remove_orphan_files' default


def vacuum_orphans(
    warehouse_path: str,
    min_age_s: float = VACUUM_MIN_AGE_S,
    include_uncommitted: bool = False,
) -> dict:
    """Remove-orphan-files (the Iceberg `remove_orphan_files` analog):
    delete data files and bloom sidecars on disk that NO manifest
    references. `min_age_s` defaults to 3 days (Iceberg's
    remove_orphan_files default) because a vacuum racing a FIRST-TIME
    encode — which publishes no manifest until its final commit — would
    otherwise delete the run's already-renamed data files and in-flight
    temps out from under it; `min_age_s=0` is for tests only, safe solely
    when no encode can be running. Three classes, handled differently:

      * `*.inprogress-*` temps — always garbage once older than
        `min_age_s` (a live task's temp is younger; production uses hours,
        tests 0);
      * `snap-<id>.parquet` whose id has NO manifest at all — an encode
        that died before its first commit; deleted past `min_age_s`;
      * complete files of a LIVE snapshot whose pid is not committed —
        these are the resume path's ADOPTION candidates (warehouse.
        orphan_files) and are KEPT unless `include_uncommitted=True`
        (deleting them is safe — resume re-encodes — but wastes work).

    Committed files are never touched: the manifest set is the root of
    reachability, exactly like Iceberg's metadata tree. Returns
    {'files_deleted', 'bytes_deleted', 'kept_adoptable'}."""
    wh = Warehouse(warehouse_path)
    manifests = {
        f[len("snap-"):-len(".json")]
        for f in os.listdir(wh.manifest_dir)
        if f.startswith("snap-") and f.endswith(".json")
    }
    committed: set[str] = set()
    for snap in manifests:
        m = wh.read_manifest(snap)
        committed.update(p["file"] for p in (m or {}).get("partitions", {}).values())
        # merge-on-read delete files are manifest-reachable too (deletes.py)
        from .deletes import delete_files_of

        committed.update(delete_files_of(m))
    now = time.time()
    deleted = bytes_deleted = kept = 0
    for root, _, files in os.walk(wh.data_dir):
        for f in files:
            full = os.path.join(root, f)
            if full in committed or full[: -len(".bloom.json")] in committed:
                continue
            try:
                age = now - os.path.getmtime(full)
            except OSError:
                continue  # raced with a concurrent delete/rename
            if age < min_age_s:
                continue
            if ".inprogress-" in f:
                pass  # always garbage past the age threshold
            else:
                snap = f.split("snap-", 1)[-1].split(".")[0] if "snap-" in f else None
                if snap in manifests and not include_uncommitted:
                    kept += 1  # adoption candidate for a resume of `snap`
                    continue
            try:
                sz = os.path.getsize(full)
                os.remove(full)
                deleted += 1
                bytes_deleted += sz
            except OSError:
                pass
    return {
        "files_deleted": deleted,
        "bytes_deleted": bytes_deleted,
        "kept_adoptable": kept,
    }


def _main() -> None:
    """spark-submit / python -m orc_spark.maintenance — the operational
    counterpart of job.py for warehouse upkeep:

      python -m orc_spark.maintenance --warehouse W \
          --compact stream-000,stream-001 --dest main \
          [--mode concat|reencode] [--expire-sources] [--cpus N]
    """
    import argparse

    from .session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--compact", required=True,
                    help="comma-separated source snapshot ids")
    ap.add_argument("--dest", required=True, help="destination snapshot id")
    ap.add_argument("--mode", choices=["concat", "reencode"], default="concat")
    ap.add_argument("--stripe-tokens", type=int, default=DEFAULT_STRIPE_TOKENS)
    ap.add_argument("--expire-sources", action="store_true",
                    help="delete the source snapshots after the dest commit")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()
    snaps = [s for s in args.compact.split(",") if s]
    spark = get_spark(cpus=args.cpus, app_name="orc_spark_maintenance")
    spark.sparkContext.setLogLevel("ERROR")
    m = compact_snapshots(
        spark, args.warehouse, snaps, args.dest,
        mode=args.mode, stripe_tokens=args.stripe_tokens,
    )
    out = {
        "dest": args.dest,
        "mode": args.mode,
        "partitions": len(m["partitions"]),
        "stripes": sum(p["stripes"] for p in m["partitions"].values()),
        "n_rows": sum(p["n_rows"] for p in m["partitions"].values()),
        "enc_bytes": sum(p["enc_bytes"] for p in m["partitions"].values()),
    }
    if args.expire_sources:
        out["expired"] = expire_snapshots(args.warehouse, snaps)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    _main()
