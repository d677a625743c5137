"""Schema evolution — the Iceberg add/drop/rename-column analog, metadata
only: no data file is touched.

`evolve_schema` commits a NEW snapshot sharing the parent's files (and
delete files) with an evolved schema:

  * ADD — the column appends to the schema; files written before the add
    simply lack its streams, so readers null-fill (exactly Iceberg's
    null-for-missing-field-id rule). Files written AFTER (upserts,
    compaction reencode) carry real streams under the new name.
  * RENAME — the manifest schema gets the new name and the old name joins
    the column's ALIAS LIST (`column_mapping`: current name -> prior
    stored names, newest first). Stripe footers key streams by the name
    current at WRITE time, so a mixed table (files from before and after
    the rename, e.g. via upsert) resolves per stripe: readers try the
    current name, then each alias. This is the engine's substitute for
    Iceberg's field IDs — names, plus a guard that makes them unambiguous:
  * name reuse is REFUSED. Adding or renaming-to a name that any older
    file may still store (a dropped column's name, a rename's old name —
    tracked in `retired_names`) would silently read the OLD column's bytes
    into the new column; Iceberg survives this via field IDs, we refuse
    the evolution instead (rewrite via maintenance.materialize_deletes /
    compact reencode first, which re-keys every stream to current names
    and clears the mapping).
  * DROP — removed from the schema (streams stay in old files, never
    decoded; stream-level projection means they are never even
    decompressed). The name retires.
  * layout columns (key/source/weight) cannot be dropped or renamed: the
    manifest ranges, pid prefixes, and stripe sort are keyed to them.

Readers: decode_table and the tokstripe format resolve through the alias
lists inside the decode kernel (pipeline.decode_blob_batches); predicate
pushdown translates per stripe (stats under an alias still prune; a
predicate on a column a stripe lacks entirely cannot exclude the stripe
and falls through to the exact row filter, where null-filled columns
match nothing). delete_where/upsert/compact-concat inherit the mapping;
materialize/reencode clear it (their files are written fresh).
"""

from __future__ import annotations

from .warehouse import Warehouse

_META_KEYS = ("column_mapping", "retired_names")


def inherited_meta(manifest: dict) -> dict:
    """Evolution metadata a shared-files commit (delete_where, upsert,
    compact concat) must carry from its parent manifest."""
    return {k: manifest[k] for k in _META_KEYS if manifest.get(k)}


def evolve_schema(
    warehouse_path: str,
    snapshot: str | None = None,
    dest: str | None = None,
    add: dict[str, str] | None = None,
    drop: list[str] | None = None,
    rename: dict[str, str] | None = None,
) -> dict:
    """Commit snapshot `dest` (default `<snapshot>-evN`) = `snapshot` with
    columns added (`{name: spark_type}`), dropped, and/or renamed
    (`{old: new}`). Pure metadata — same files, same delete files. Raises
    on layout-column changes and on retired-name reuse (see module
    docstring)."""
    add = add or {}
    drop = list(drop or [])
    rename = rename or {}
    wh = Warehouse(warehouse_path)
    snapshot = wh.resolve_snapshot(snapshot)
    m = wh.read_manifest(snapshot)
    if not m:
        raise ValueError(f"no manifest for snapshot {snapshot!r}")
    schema = dict(m["schema"])
    layout = m.get("layout") or {}
    mapping = {k: list(v) for k, v in (m.get("column_mapping") or {}).items()}
    retired = set(m.get("retired_names") or [])

    protected = {
        layout.get("key_col", "doc_id"),
        layout.get("source_col"),
        layout.get("weight_col"),
    } - {None}
    for c in list(rename) + drop:
        if c in protected:
            raise ValueError(
                f"column {c!r} is a layout column (key/source/weight) — "
                "pruning ranges, pid prefixes, and stripe sort are keyed "
                "to it; rewrite the table to change it"
            )
        if c not in schema:
            raise ValueError(f"column {c!r} not in schema {list(schema)}")
    # every name an older file may still store, after this evolution
    stored_names = set(schema) | retired
    for al in mapping.values():
        stored_names.update(al)
    for n in list(add) + list(rename.values()):
        if n in stored_names and n not in drop:
            raise ValueError(
                f"name {n!r} was (or still is) stored in data files — "
                "reusing it would read the old column's bytes; rewrite "
                "first (materialize_deletes / compact reencode)"
            )
    overlap = set(add) & set(rename.values())
    if overlap or len(set(rename.values())) != len(rename):
        raise ValueError("conflicting new names in add/rename")

    new_schema: dict[str, str] = {}
    new_mapping: dict[str, list[str]] = {}
    new_retired = set(retired)
    for name, typ in schema.items():
        aliases = mapping.get(name, [])
        if name in drop:
            new_retired.add(name)
            new_retired.update(aliases)
            continue
        if name in rename:
            nn = rename[name]
            new_schema[nn] = typ
            new_mapping[nn] = [name] + aliases  # newest alias first
            new_retired.add(name)
        else:
            new_schema[name] = typ
            # keep an EXISTING entry even when its alias list is empty: an
            # added column's [] marks "no stored data anywhere — null-fill"
            # and must survive later evolutions, or a reader of a mixed
            # table loses the fill signal
            if name in mapping or aliases:
                new_mapping[name] = aliases
    for name, typ in add.items():
        new_schema[name] = typ
        new_mapping[name] = []  # no stored data anywhere: null-fill

    if dest is None:
        n = 1
        while wh.read_manifest(f"{snapshot}-ev{n}"):
            n += 1
        dest = f"{snapshot}-ev{n}"
    elif wh.read_manifest(dest):
        raise ValueError(f"snapshot {dest!r} already exists")

    extra = {
        "layout": layout,
        "column_mapping": new_mapping,
        "retired_names": sorted(new_retired),
        "operation": "evolve",
        "evolve_parent": snapshot,
    }
    if m.get("delete_files"):
        extra["delete_files"] = list(m["delete_files"])
    return wh.commit(dest, dict(m["partitions"]), new_schema, extra=extra)
