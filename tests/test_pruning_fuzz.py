"""Property fuzz of the predicate-pushdown DECISION layer (no Spark in the
loop): for random tables and random conjunctions of between/IN predicates,
the three-level scheme — file_matches over manifest ranges, then
stripe_matches_pred over stripe stats, then the exact _row_mask — must
select EXACTLY the brute-force row set. This pins the two properties the
deterministic tests sample only pointwise:

  soundness   — a pruned file/stripe never contains a satisfying row
                (pruning is transparent for ANY stats layout, not just the
                clustered fixtures);
  exactness   — the surviving rows equal a per-row Python evaluation of the
                conjunction, including unbounded/one-sided ranges, IN-sets,
                and predicates over the key, source, and payload columns.
"""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from orc_spark.pipeline import (
    _row_mask,
    file_matches,
    normalize_predicates,
    stripe_matches_pred,
)

SOURCES = ["a", "b", "c"]

row_st = st.tuples(
    st.integers(0, 50),            # k: key column
    st.sampled_from(SOURCES),      # source
    st.integers(-20, 100),         # n: payload int
)

bound_st = st.one_of(st.none(), st.integers(-5, 60))


def _between(col):
    return st.tuples(st.just(col), bound_st, bound_st)


def _inset(col, values):
    return st.tuples(
        st.just(col),
        st.lists(values, min_size=1, max_size=4).map(lambda v: list(set(v))),
    )


pred_st = st.one_of(
    _between("k"),
    _between("n"),
    _inset("k", st.integers(0, 50)),
    _inset("source", st.sampled_from(SOURCES)),
)


def _sat(row, p):
    v = {"k": row[0], "source": row[1], "n": row[2]}[p[1]]
    if p[0] == "between":
        return (p[2] is None or v >= p[2]) and (p[3] is None or v <= p[3])
    return v in p[2]


@settings(max_examples=300, deadline=None)
@given(
    rows=st.lists(row_st, min_size=1, max_size=60),
    raw_preds=st.lists(pred_st, min_size=0, max_size=3),
    n_buckets=st.integers(1, 3),
    stripe_rows=st.integers(1, 7),
)
def test_three_level_prune_equals_brute_force(
    rows, raw_preds, n_buckets, stripe_rows
):
    preds = normalize_predicates(raw_preds)
    expect = sorted(r for r in rows if all(_sat(r, p) for p in preds))

    # lay the table out exactly like the encoder: pid = source#bucket,
    # rows key-sorted within a pid, stripes of `stripe_rows` rows each,
    # per-stripe min/max stats for every scalar column, per-file key range
    groups: dict[str, list] = {}
    for r in rows:
        pid = f"{r[1]}#{hash(r[0]) % n_buckets}"
        groups.setdefault(pid, []).append(r)

    got = []
    for pid, grp in groups.items():
        grp = sorted(grp)
        part = {
            "min_doc_id": min(r[0] for r in grp),
            "max_doc_id": max(r[0] for r in grp),
        }
        if not file_matches(pid, part, preds, key_col="k", source_col="source"):
            # soundness: a pruned file has no satisfying row
            assert not any(all(_sat(r, p) for p in preds) for r in grp)
            continue
        for i in range(0, len(grp), stripe_rows):
            stripe = grp[i : i + stripe_rows]
            footer = {
                "columns": {
                    c: {
                        "stats": {
                            "min": min(r[j] for r in stripe),
                            "max": max(r[j] for r in stripe),
                        }
                    }
                    for j, c in ((0, "k"), (1, "source"), (2, "n"))
                }
            }
            if not all(stripe_matches_pred(footer, p) for p in preds):
                assert not any(all(_sat(r, p) for p in preds) for r in stripe)
                continue
            rb = pa.RecordBatch.from_pydict(
                {
                    "k": pa.array([r[0] for r in stripe], pa.int64()),
                    "source": pa.array([r[1] for r in stripe]),
                    "n": pa.array([r[2] for r in stripe], pa.int64()),
                }
            )
            mask = _row_mask(rb, preds)
            kept = rb if mask is None else rb.filter(mask)
            got.extend(
                zip(
                    kept.column("k").to_pylist(),
                    kept.column("source").to_pylist(),
                    kept.column("n").to_pylist(),
                )
            )

    assert sorted(got) == expect
