"""Unit tests for the training-data ops not fully covered by the oracle
contract test: multimodal plumbing, LSH candidate generation, and dedup
behavior on actual duplicates (testdata has none, so synthesize some)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def test_multimodal_meta_and_features(spark):
    from orc_spark.multimodal import (
        binarize_documents,
        extract_meta,
        fake_decode_features,
        frame_sample,
    )

    df = binarize_documents(spark, SF_DIR)
    n = df.count()
    meta = extract_meta(df).collect()
    assert len(meta) == n
    assert all(r["n_bytes"] > 0 and 0 <= r["first_byte"] < 256 for r in meta)
    assert all(len(r["md5_prefix"]) == 16 for r in meta)

    feats = fake_decode_features(df, dim=16).collect()
    assert len(feats) == n
    assert all(len(r["features"]) == 16 for r in feats)
    # deterministic: same payload -> same features
    f0 = {r["doc_id"]: r["features"] for r in feats}
    f1 = {r["doc_id"]: r["features"] for r in fake_decode_features(df, 16).collect()}
    assert f0 == f1

    frames = frame_sample(df, every_n_bytes=64)
    grp = frames.groupBy("doc_id").count().collect()
    assert len(grp) == n
    assert all(r["count"] >= 1 for r in grp)


def test_decode_media_is_stubbed():
    from orc_spark.multimodal import decode_media

    with pytest.raises(NotImplementedError):
        decode_media(b"\xff\xd8\xff", "image")


def test_lsh_candidates_share_buckets(spark):
    from orc_spark import similarity

    b = similarity.lsh_buckets(spark, SF_DIR).collect()
    assert sum(r["n_vecs"] for r in b) == spark.read.parquet(
        f"{SF_DIR}/embeddings.parquet"
    ).count()
    cands = similarity.lsh_ann_candidates(spark, SF_DIR).collect()
    # every candidate pair is ordered and within one bucket
    assert all(r["id_a"] < r["id_b"] for r in cands)


def test_dedup_exact_finds_planted_duplicates(spark, tmp_path):
    """testdata documents are all distinct; plant real duplicates and check
    the keep-min-doc_id policy."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from orc_spark import textops

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(10).collect()
    rows = {c: [r[c] for r in docs] for c in docs[0].asDict()}
    # duplicate doc 0's text into ids 1 and 2
    rows["text"][1] = rows["text"][0]
    rows["text"][2] = rows["text"][0]
    d = str(tmp_path / "dup")
    os.makedirs(d)
    pq.write_table(pa.table(rows), f"{d}/documents.parquet")

    res = {r["keep_id"]: r["n_dups"] for r in textops.dedup_exact(spark, d).collect()}
    keep0 = min(rows["doc_id"][0], rows["doc_id"][1], rows["doc_id"][2])
    assert res[keep0] == 3
    assert sum(res.values()) == 10


def test_minhash_candidates_catch_planted_near_dup(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from orc_spark import textops

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(10).collect()
    rows = {c: [r[c] for r in docs] for c in docs[0].asDict()}
    # near-duplicate: doc 1 = doc 0 plus one extra word
    rows["text"][1] = rows["text"][0] + " extra"
    d = str(tmp_path / "near")
    os.makedirs(d)
    pq.write_table(pa.table(rows), f"{d}/documents.parquet")

    pairs = {
        (r["id_a"], r["id_b"])
        for r in textops.minhash_candidates(spark, d).collect()
    }
    a, b = sorted([rows["doc_id"][0], rows["doc_id"][1]])
    assert (a, b) in pairs


def test_dedup_clusters_merge_planted_near_dups(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from orc_spark import textops

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(12).collect()
    rows = {c: [r[c] for r in docs] for c in docs[0].asDict()}
    # a 3-clique of near-dups: docs 1 and 2 are tiny edits of doc 0
    rows["text"][1] = rows["text"][0] + " extra"
    rows["text"][2] = rows["text"][0] + " more"
    d = str(tmp_path / "clus")
    os.makedirs(d)
    pq.write_table(pa.table(rows), f"{d}/documents.parquet")

    labels = {
        r["doc_id"]: (r["cluster_id"], r["is_keeper"])
        for r in textops.dedup_clusters(spark, d).collect()
    }
    assert len(labels) == 12  # every doc labeled, singletons included
    trio = [str(rows["doc_id"][i]) for i in (0, 1, 2)]
    cids = {labels[t][0] for t in trio}
    assert cids == {min(trio)}, "planted near-dup clique not merged"
    # exactly one keeper per cluster, and it is the cluster_id doc
    keepers = [d_ for d_, (c, k) in labels.items() if k]
    assert sorted(keepers) == sorted({c for c, _ in labels.values()})
    # every candidate edge ended up intra-cluster
    for r in textops.minhash_candidates(spark, d).collect():
        assert labels[str(r["id_a"])][0] == labels[str(r["id_b"])][0]


def test_dedup_clusters_raises_when_not_converged(spark, tmp_path):
    """Partially-propagated labels must never be returned silently: any
    edge needs >=2 rounds (propagate + confirm), so max_iters=1 on a graph
    with a planted near-dup edge must raise (regression r3)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from orc_spark import textops

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(6).collect()
    rows = {c: [r[c] for r in docs] for c in docs[0].asDict()}
    rows["text"][1] = rows["text"][0] + " extra"
    d = str(tmp_path / "noconv")
    os.makedirs(d)
    pq.write_table(pa.table(rows), f"{d}/documents.parquet")
    with _pytest.raises(RuntimeError, match="did not converge"):
        textops.dedup_clusters(spark, d, max_iters=1)


def test_connected_components_star_long_path(spark):
    """The large-star/small-star variant must label a path-graph component
    of diameter 40 in O(log d) rounds — where diameter-bounded label
    propagation at the same round budget must raise, not silently split
    the component (verdict r3 item 6)."""
    import pytest as _pytest

    from orc_spark import textops

    ids = [f"n{i:02d}" for i in range(41)] + ["solo"]
    nodes = spark.createDataFrame([(i,) for i in ids], ["node"])
    path_edges = [(f"n{i:02d}", f"n{i+1:02d}") for i in range(40)]
    pairs = spark.createDataFrame(path_edges, ["u", "v"])

    labs = {
        r["node"]: r["lab"]
        for r in textops.connected_components(
            nodes, pairs, max_iters=10, algorithm="star"
        ).collect()
    }
    assert len(labs) == 42
    assert all(labs[f"n{i:02d}"] == "n00" for i in range(41))
    assert labs["solo"] == "solo"

    with _pytest.raises(RuntimeError, match="did not converge"):
        textops.connected_components(
            nodes, pairs, max_iters=10, algorithm="label"
        ).collect()


def test_connected_components_star_agrees_with_label(spark):
    """On a multi-component graph with cliques, chains, and reversed edge
    orientations, star and label modes must produce identical labelings."""
    import random

    from orc_spark import textops

    rng = random.Random(7)
    ids = [f"d{i:03d}" for i in range(60)]
    edges = []
    # three planted components with mixed shapes
    for base in (0, 20, 40):
        members = ids[base : base + rng.randint(3, 9)]
        for a, b in zip(members, members[1:]):
            edges.append((b, a) if rng.random() < 0.5 else (a, b))
        if len(members) > 3:  # add a chord + a duplicate edge
            edges.append((members[0], members[-1]))
            edges.append(edges[-1])
    nodes = spark.createDataFrame([(i,) for i in ids], ["node"])
    pairs = spark.createDataFrame(edges, ["u", "v"])

    lab = {
        r["node"]: r["lab"]
        for r in textops.connected_components(
            nodes, pairs, algorithm="label"
        ).collect()
    }
    star = {
        r["node"]: r["lab"]
        for r in textops.connected_components(
            nodes, pairs, algorithm="star"
        ).collect()
    }
    assert lab == star
    assert len(lab) == 60


def test_dedup_clusters_star_mode_matches_default(spark, tmp_path):
    """dedup_clusters(algorithm='star') over the real candidate graph must
    equal the default label-propagation output row for row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from orc_spark import textops

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(12).collect()
    rows = {c: [r[c] for r in docs] for c in docs[0].asDict()}
    rows["text"][1] = rows["text"][0] + " extra"
    rows["text"][2] = rows["text"][0] + " more"
    d = str(tmp_path / "star")
    os.makedirs(d)
    pq.write_table(pa.table(rows), f"{d}/documents.parquet")

    def snap(df):
        return sorted(map(tuple, df.collect()))

    assert snap(textops.dedup_clusters(spark, d, algorithm="star")) == snap(
        textops.dedup_clusters(spark, d)
    )


def test_all_pairs_guards_refuse_big_inputs(spark):
    """The two documented quadratic oracles must refuse large inputs and
    point at their scale-safe twins unless allow_quadratic=True is passed
    explicitly (the correctness-gate registrations do pass it)."""
    import pytest as _pytest

    from orc_spark import similarity, textops

    with _pytest.raises(ValueError, match="lsh_refined_pairs"):
        similarity.embedding_dup_pairs(spark, SF_DIR, max_rows=10)
    with _pytest.raises(ValueError, match="minhash_candidates"):
        textops.jaccard_pairs(spark, SF_DIR, max_docs=10)
    # opting in bypasses the guard regardless of size
    assert (
        similarity.embedding_dup_pairs(
            spark, SF_DIR, min_sim_f6=400_000, max_rows=10, allow_quadratic=True
        ).count()
        > 0
    )
