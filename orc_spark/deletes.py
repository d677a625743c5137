"""Merge-on-read row-level deletes — the Iceberg v2 equality-delete analog.

Iceberg v2 deletes rows without rewriting data files: a delete commit
produces a NEW snapshot that references the SAME data files plus "delete
files" that readers merge at scan time (merge-on-read), and a later
rewrite materializes them. These are the engine's analogs, built on the
warehouse's manifest tree:

  * `delete_where(spark, wh, predicate)` never touches a data file. It
    computes the matching keys with a PRUNED scan (the predicate pushes
    down all three levels through `decode_table`, so only matching
    files/stripes are read), writes them as parquet delete files under
    `data/_deletes/`, and commits a NEW snapshot whose manifest shares the
    parent's `partitions` verbatim — zero data copy, exactly Iceberg's
    new-snapshot-same-files shape — with the accumulated `delete_files`
    list. The parent snapshot still reads the full table, so every delete
    is time-travelable (`metadata.snapshot_as_of`) and reversible
    (`Warehouse.rollback`).
  * Semantics are EQUALITY deletes on the table's layout key (Iceberg's
    equality delete files, not positional): every row whose key appears in
    a delete file is dropped at read time. On key-unique tables (the
    mandated doc_id layout) this is exact row deletion; on tables with
    duplicate keys it drops ALL rows of a matching key — Iceberg's
    documented equality-delete behavior, stated here so nobody is
    surprised.
  * `upsert(spark, wh, df_new)` is MERGE INTO on the layout key, built
    from the same two primitives Iceberg v2 uses: df_new encodes into NEW
    files at sequence number `max_seq + 1`, and its keys commit as a
    SEQ-SCOPED delete file ({'path','seq'} manifest entries) that readers
    merge only into files BELOW that seq — old versions vanish, the
    upsert's own files keep the new versions. Plain `delete_where`
    entries stay bare strings = apply to every file. Readers group files
    by applicable delete set (decode_table / the tokstripe reader), so
    mixed chains (delete → upsert → delete) read exactly.
  * Reads stay exact and scale-shaped. `decode_table` applies deletes one
    of two ways, chosen by the total delete-key count (read from parquet
    footers, O(#delete files) driver-side): small sets ship in the task
    closure as an arrow `is_in` mask inside the decode kernel (zero extra
    shuffle — the common case: deletes are tiny next to the table); large
    sets become a `left_anti` join against the delete-file DataFrame, and
    Spark broadcasts or sort-merges as size dictates — the 100-TB path.
  * Lifecycle is manifest-rooted like everything else: delete files are
    invisible until the manifest rename (a crash mid-`delete_where` leaves
    age-gated orphans that `vacuum_orphans` collects), `vacuum` treats
    manifest `delete_files` as reachable, `expire_snapshots` reference-
    checks shared files, and `compact_snapshots` refuses delete-bearing
    sources (blob concat would resurrect deleted rows) and points at
    `maintenance.materialize_deletes`, which rewrites through the full
    decode→encode pipeline and drops the delete files from the result.
"""

from __future__ import annotations

import os
import tempfile
import time

from pyspark.sql import SparkSession, functions as F

from .warehouse import Warehouse

DELETES_DIRNAME = "_deletes"

# Above this many total delete keys, decode_table switches from the
# in-kernel is_in mask (keys in the task closure) to a left_anti join.
# 100k string keys is ~a few MB in the closure — well under broadcast
# etiquette; the join path has no ceiling.
INLINE_DELETE_MAX = 100_000


def deletes_dir(warehouse_path: str) -> str:
    return os.path.join(warehouse_path, "data", DELETES_DIRNAME)


def normalize_delete_entries(raw: list) -> list[tuple[str, int | None]]:
    """Manifest `delete_files` entries -> [(path, seq)]. Plain string
    entries (delete_where) have seq None = apply to EVERY data file; dict
    entries {'path','seq'} (upsert) apply only to data files whose
    partition 'seq' is LOWER — Iceberg's sequence-number scoping, which is
    what lets an upsert's own new files carry the re-inserted keys the
    same commit deleted from the old files."""
    out: list[tuple[str, int | None]] = []
    for e in raw or []:
        if isinstance(e, str):
            out.append((e, None))
        else:
            out.append((e["path"], e.get("seq")))
    return out


def delete_files_of(manifest: dict | None) -> list[str]:
    """Delete-file PATHS of a manifest (seq scoping stripped) — the
    reachability view expire/vacuum need."""
    return [p for p, _ in normalize_delete_entries(
        (manifest or {}).get("delete_files") or []
    )]


def max_seq(manifest: dict) -> int:
    """Highest sequence number in a manifest (partitions and delete
    entries); new upserts commit at max_seq + 1."""
    seqs = [p.get("seq", 0) for p in manifest.get("partitions", {}).values()]
    seqs += [s for _, s in normalize_delete_entries(
        manifest.get("delete_files") or []
    ) if s is not None]
    return max(seqs, default=0)


def count_delete_keys(files: list[str]) -> int:
    """Total rows across delete files from parquet footers only — the
    driver-side O(#files) sizing read that picks the apply strategy."""
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def load_delete_keys(files: list[str], key_col: str):
    """Materialize the delete-key column as ONE arrow array (driver-side;
    callers gate on count_delete_keys first). Distinct not required —
    `is_in` semantics don't care about duplicates."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tabs = [pq.read_table(f, columns=[key_col]) for f in files]
    return pa.concat_tables(tabs).column(key_col).combine_chunks()


def _write_delete_files(keys_df, warehouse_path: str, dest: str) -> list[str]:
    """Write a key DataFrame as parquet delete files under data/_deletes/:
    staged write, then atomic per-file renames to their final names. Files
    are invisible until some manifest lists them (a crash here leaves
    age-gated orphans for vacuum)."""
    ddir = deletes_dir(warehouse_path)
    os.makedirs(ddir, exist_ok=True)
    staging = tempfile.mkdtemp(prefix=".staging-", dir=ddir)
    new_files: list[str] = []
    try:
        keys_df.write.mode("overwrite").parquet(staging)
        parts = sorted(
            f for f in os.listdir(staging)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        for i, part in enumerate(parts):
            final = os.path.join(ddir, f"snap-{dest}-del-{i:05d}.parquet")
            os.replace(os.path.join(staging, part), final)
            new_files.append(final)
    finally:
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
    return new_files


def _branch_base(wh: Warehouse, branch: str, snapshot: str | None) -> str:
    """Base snapshot of a branch-scoped write: an explicit `snapshot` wins
    (and creates the branch at commit if it does not exist yet); otherwise
    the branch ref's current target."""
    if snapshot is not None:
        return wh.resolve_snapshot(snapshot)
    ref = wh.get_ref(branch)
    if ref is None:
        raise ValueError(
            f"branch {branch!r} does not exist - create it with "
            "Warehouse.set_ref(name, snapshot, kind='branch') or pass "
            "snapshot= to base the first branch write explicitly"
        )
    if ref["kind"] != "branch":
        raise ValueError(f"ref {branch!r} is a tag - tags are immutable")
    return ref["snapshot"]


def delete_where(
    spark: SparkSession,
    warehouse_path: str,
    predicate,
    snapshot: str | None = None,
    dest: str | None = None,
    branch: str | None = None,
) -> dict:
    """Commit a merge-on-read delete: a new snapshot `dest` (default
    `<snapshot>-d<n>`) sharing `snapshot`'s data files, whose readers drop
    every row matching `predicate` (forms per normalize_predicates: key or
    any stat-tracked column, BETWEEN / IN / conjunction — evaluated once,
    now, against the snapshot being deleted from; rows are removed by key
    equality thereafter). Returns the committed manifest with
    `n_deleted` (distinct keys this call removed) added.

    A predicate matching nothing still commits `dest` (Iceberg also
    snapshots no-op deletes) with no new delete file.

    `branch=` makes this a BRANCH-SCOPED write (Iceberg branch commits):
    the base defaults to the branch ref's target, CURRENT does not move,
    and the branch ref advances to `dest` instead — main readers never see
    the branch's deletes until someone fast-forwards (Warehouse.rollback
    to the branch target is the publish step of write-audit-publish)."""
    wh = Warehouse(warehouse_path)
    if branch is not None:
        snapshot = _branch_base(wh, branch, snapshot)
    else:
        snapshot = wh.resolve_snapshot(snapshot)
    manifest = wh.read_manifest(snapshot)
    if not manifest:
        raise ValueError(f"no manifest for snapshot {snapshot!r}")
    layout = manifest.get("layout") or {}
    key_col = layout.get("key_col", "doc_id")
    # RAW entries, scoping preserved: an inherited {'path','seq'} upsert
    # delete must stay seq-scoped in the child manifest
    parent_dels = list(manifest.get("delete_files") or [])
    if dest is None:
        # chain-stable default: strip the parent's own suffix so a
        # long-lived table's chain stays `<root>-d1, <root>-d2, …`
        # instead of growing `-d1-d2-…` without bound
        dest = f"{_root(snapshot)}-d{len(parent_dels) + 1}"
    if wh.read_manifest(dest):
        raise ValueError(f"snapshot {dest!r} already exists")

    from .pipeline import decode_table

    # pruned scan: only files/stripes that can match the predicate are read
    keys = decode_table(
        spark, warehouse_path, snapshot=snapshot, columns=[key_col],
        predicate=predicate,
    ).distinct()

    new_files = _write_delete_files(keys, warehouse_path, dest)
    n_deleted = count_delete_keys(new_files)
    if n_deleted == 0:
        for f in new_files:
            os.remove(f)
        new_files = []

    # seq-scope the new entries: they apply to every file that exists NOW
    # (all have seq <= max_seq) but not to files a LATER upsert commits at
    # a higher seq — otherwise re-inserting a once-deleted key would
    # silently resurrect the old delete. Exactly Iceberg's sequence rule.
    from .evolution import inherited_meta

    seq = max_seq(manifest) + 1
    out = wh.commit(
        dest,
        dict(manifest["partitions"]),  # shared verbatim — zero data copy
        dict(manifest["schema"]),
        extra={
            "layout": layout,
            "delete_files": parent_dels
            + [{"path": p, "seq": seq} for p in new_files],
            "operation": "delete",
            "delete_parent": snapshot,
            **inherited_meta(manifest),
        },
        advance_current=branch is None,
    )
    if branch is not None:
        wh.set_ref(branch, dest, kind="branch")
    out["n_deleted"] = n_deleted
    return out


def update_where(
    spark: SparkSession,
    warehouse_path: str,
    predicate,
    set_exprs: dict,
    snapshot: str | None = None,
    dest: str | None = None,
    branch: str | None = None,
) -> dict:
    """UPDATE … SET … WHERE sugar over `upsert`: decode the matching rows
    (the predicate pushes down all three prune levels), apply `set_exprs`
    ({column: SQL expression string or Column}), and commit the result as
    a merge-on-read upsert — matching rows get new versions, nothing else
    is touched, no data file rewritten. Expressions must preserve column
    types (upsert enforces the schema). Returns the upsert manifest
    (`n_upserted` = rows updated)."""
    from .pipeline import decode_table

    wh = Warehouse(warehouse_path)
    if branch is not None:
        snapshot = _branch_base(wh, branch, snapshot)
    else:
        snapshot = wh.resolve_snapshot(snapshot)
    df = decode_table(spark, warehouse_path, snapshot=snapshot,
                      predicate=predicate)
    for c, e in set_exprs.items():
        if c not in df.columns:
            raise ValueError(f"SET column {c!r} not in schema {df.columns}")
        df = df.withColumn(c, F.expr(e) if isinstance(e, str) else e)
    return upsert(spark, warehouse_path, df, snapshot=snapshot, dest=dest,
                  branch=branch)


def _root(snapshot: str) -> str:
    """Strip the delete/upsert suffix chain so default names stay
    `<root>-d<n>` / `<root>-u<n>` instead of growing without bound."""
    import re

    return re.sub(r"(-[du]\d+)+$", "", snapshot)


def upsert(
    spark: SparkSession,
    warehouse_path: str,
    df_new,
    snapshot: str | None = None,
    dest: str | None = None,
    salt_buckets: int = 32,
    stripe_tokens: int | None = None,
    key_blooms: bool = True,
    branch: str | None = None,
) -> dict:
    """Merge-on-read UPSERT (Iceberg `MERGE INTO … WHEN MATCHED UPDATE
    WHEN NOT MATCHED INSERT`, keyed on the table's layout key): commit a
    new snapshot `dest` (default `<root>-u<seq>`) where every row of
    `df_new` replaces the existing row with the same key (all rows of it,
    on duplicate-key tables — equality-delete semantics) and keys not
    present append. Zero rewrite of existing data: `df_new` encodes
    through the full single-shuffle pipeline into NEW files committed at
    sequence number `seq = max_seq(parent) + 1`, and one delete file of
    `df_new`'s keys is committed AT that seq — seq-scoped, so readers
    merge it into files BELOW seq (the old versions) but never into the
    upsert's own files (which carry the new versions). Reads stay the
    engine's merge-on-read paths (inline mask / anti-join, grouped per
    applicable-delete set); `materialize_deletes` folds the chain flat.

    The new files stage under snapshot `<dest>-stage` (its manifest is
    removed after the atomic dest commit; the append stream reader skips
    'stage' operations, and delivers the upsert's NEW files exactly once
    via the dest snapshot). Returns the committed manifest plus
    `n_upserted` (distinct keys written). `branch=` scopes the commit to a
    branch ref (see delete_where): CURRENT stays put, the branch advances."""
    from .pipeline import DEFAULT_STRIPE_TOKENS, encode_table

    wh = Warehouse(warehouse_path)
    if branch is not None:
        snapshot = _branch_base(wh, branch, snapshot)
    else:
        snapshot = wh.resolve_snapshot(snapshot)
    manifest = wh.read_manifest(snapshot)
    if not manifest:
        raise ValueError(f"no manifest for snapshot {snapshot!r}")
    schema = {f.name: f.dataType.simpleString() for f in df_new.schema.fields}
    if schema != manifest["schema"]:
        raise ValueError(
            f"upsert schema {schema} != table schema {manifest['schema']}"
        )
    layout = manifest.get("layout") or {}
    key_col = layout.get("key_col", "doc_id")
    seq = max_seq(manifest) + 1
    if dest is None:
        dest = f"{_root(snapshot)}-u{seq}"
    if wh.read_manifest(dest):
        raise ValueError(f"snapshot {dest!r} already exists")
    stage = f"{dest}-stage"

    encode_table(
        spark,
        df_new,
        warehouse_path,
        stage,
        salt_buckets=salt_buckets,
        stripe_tokens=stripe_tokens or DEFAULT_STRIPE_TOKENS,
        key_col=key_col,
        source_col=layout.get("source_col", "source"),
        weight_col=layout.get("weight_col", "n_tok"),
        key_blooms=key_blooms,
        extra={"operation": "stage", "stage_for": dest},
        advance_current=False,  # never the table's default read
    )
    staged = wh.read_manifest(stage)

    new_files = _write_delete_files(
        df_new.select(key_col).distinct(), warehouse_path, dest
    )
    n_upserted = count_delete_keys(new_files)

    merged = dict(manifest["partitions"])  # parent files shared verbatim
    for pid, part in staged["partitions"].items():
        merged[f"{pid}@u{seq}"] = {**part, "seq": seq}
    dels = list(manifest.get("delete_files") or [])
    dels += [{"path": p, "seq": seq} for p in new_files]

    from .evolution import inherited_meta

    out = wh.commit(
        dest,
        merged,
        dict(manifest["schema"]),
        extra={
            "layout": layout,
            "delete_files": dels,
            "operation": "upsert",
            "upsert_parent": snapshot,
            "seq": seq,
            **inherited_meta(manifest),
        },
        advance_current=branch is None,
    )
    if branch is not None:
        wh.set_ref(branch, dest, kind="branch")
    # drop the stage manifest: its files are reachable through dest now
    # (expire/vacuum reference-check against surviving manifests); the
    # commit-log line keeps its ordinal, readers skip missing manifests
    try:
        os.remove(wh.manifest_file(stage))
    except OSError:
        pass
    out["n_upserted"] = n_upserted
    return out
