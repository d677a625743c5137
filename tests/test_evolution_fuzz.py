"""Randomized schema-evolution chain fuzz: seeded sequences of
rename/add/drop interleaved with upserts and deletes, checked after every
commit against a driver-side model. The hard invariants: alias chains keep
resolving across mixed-name files, added columns null-fill exactly until a
write populates them, drops never leak back, and merge-on-read composes."""

import random

import pytest
from pyspark.sql import functions as F

from orc_spark import deletes
from orc_spark.evolution import evolve_schema
from orc_spark.pipeline import decode_table, encode_table

BASE_COLS = ["doc_id", "tokens", "source", "n_tok"]


def _base_rows(n=150):
    rng = random.Random(777)
    return [
        (
            f"d{i:05d}",
            [rng.randrange(99) for _ in range(rng.randrange(2, 8))],
            f"s{i % 3}",
            0,
        )
        for i in range(n)
    ]


def test_random_evolution_chains(spark, tmp_path):
    rng = random.Random(31337)
    wh = str(tmp_path / "wh")
    rows = [(d, t, s, len(t)) for d, t, s, _ in _base_rows()]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, source string, n_tok int"
    )
    # weight_col=None frees n_tok for rename/drop
    encode_table(spark, df, wh, snapshot="f0", salt_buckets=2,
                 stripe_tokens=300, weight_col=None)
    # model: key -> {current-name: value}; schema: ordered {name: sparktype}
    schema = {"doc_id": "string", "tokens": "array<int>",
              "source": "string", "n_tok": "int"}
    model = {
        d: {"doc_id": d, "tokens": tuple(t), "source": s, "n_tok": n}
        for d, t, s, n in rows
    }
    snap = "f0"
    next_col = [0]
    next_key = [0]
    protected = {"doc_id", "source"}
    for step in range(8):
        op = rng.choice(["rename", "add", "drop", "upsert", "delete"])
        if op == "rename":
            cands = [c for c in schema if c not in protected]
            old = rng.choice(cands)
            new = f"c{next_col[0]}"
            next_col[0] += 1
            snap = evolve_schema(wh, snapshot=snap, rename={old: new})[
                "snapshot_id"
            ]
            schema = {new if k == old else k: v for k, v in schema.items()}
            for r in model.values():
                r[new] = r.pop(old)
        elif op == "add":
            new = f"c{next_col[0]}"
            next_col[0] += 1
            snap = evolve_schema(wh, snapshot=snap, add={new: "int"})[
                "snapshot_id"
            ]
            schema[new] = "int"
            for r in model.values():
                r[new] = None
        elif op == "drop":
            cands = [c for c in schema if c not in protected]
            if len(cands) <= 1:
                continue
            col = rng.choice(cands)
            snap = evolve_schema(wh, snapshot=snap, drop=[col])["snapshot_id"]
            del schema[col]
            for r in model.values():
                del r[col]
        elif op == "delete":
            src = f"s{rng.randrange(3)}"
            res = deletes.delete_where(
                spark, wh, ("source", [src]), snapshot=snap
            )
            snap = res["snapshot_id"]
            doomed = [d for d, r in model.items() if r["source"] == src]
            assert res["n_deleted"] == len(doomed)
            for d in doomed:
                del model[d]
        else:  # upsert under the CURRENT schema (populates added columns)
            live = sorted(model)
            upd = rng.sample(live, min(len(live), 3))
            new_rows = []
            for d in upd + [f"k{next_key[0] + i}" for i in range(2)]:
                row = {"doc_id": d}
                for c, t in schema.items():
                    if c == "doc_id":
                        continue
                    if t == "array<int>":
                        row[c] = [rng.randrange(50)]
                    elif t == "int":
                        row[c] = rng.randrange(1000)
                    else:
                        row[c] = f"s{rng.randrange(3)}"
                new_rows.append(row)
            next_key[0] += 2
            sdf = spark.createDataFrame(
                [tuple(r[c] for c in schema) for r in new_rows],
                ", ".join(f"{c} {t}" for c, t in schema.items()),
            )
            res = deletes.upsert(spark, wh, sdf, snapshot=snap,
                                 salt_buckets=2, stripe_tokens=300)
            snap = res["snapshot_id"]
            for r in new_rows:
                model[r["doc_id"]] = {
                    c: tuple(r[c]) if isinstance(r[c], list) else r[c]
                    for c in schema
                }
        got = {}
        for r in decode_table(spark, wh, snapshot=snap).collect():
            d = r.asDict()
            got[d["doc_id"]] = {
                c: tuple(d[c]) if isinstance(d[c], list) else d[c]
                for c in schema
            }
        assert got == model, (
            f"step {step} op {op}: decode diverged "
            f"({len(got)} rows vs model {len(model)})"
        )
