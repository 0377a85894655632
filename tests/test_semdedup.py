"""SemDeDup differential test: the full operator against an
independent python reference (union-find over brute-force cosine
pairs) built on the SAME cluster assignment — kmeans itself is pinned
separately by test_kmeans-style references and the unrolled-CTE
oracle, so this test isolates the pairing / closure / keep stages."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
TAU_PPM = 350_000


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .where(F.col("vec_id") < 120)   # keep the O(n^2) reference fast
        .cache()
    )


def _cos_ppm(a, b):
    dot = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
    na = 0.0
    for x in a:
        na += float(x) * float(x)
    nb = 0.0
    for y in b:
        nb += float(y) * float(y)
    return math.floor(dot / (math.sqrt(na) * math.sqrt(nb))
                      * 1_000_000 + 0.5)


def test_semdedup_matches_union_find_reference(spark, emb):
    from logparser_spark.operators.kmeans import kmeans_fit_assign
    from logparser_spark.operators.semdedup import semdedup

    out = semdedup(emb, k=3, iters=2, tau_ppm=TAU_PPM).collect()
    vecs = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    # ground-truth assignment from the separately-pinned kmeans op
    asg = {
        r["vec_id"]: (r["cluster"], r["dist"])
        for r in kmeans_fit_assign(emb, k=3, iters=2).collect()
    }

    # reference: union-find over brute-force within-cluster pairs
    parent = {i: i for i in vecs}

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    ids = sorted(vecs)
    for i in ids:
        for j in ids:
            if i >= j or asg[i][0] != asg[j][0]:
                continue
            if _cos_ppm(vecs[i], vecs[j]) >= TAU_PPM:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    comp_ref = {i: find(i) for i in ids}

    got = {r["vec_id"]: r for r in out}
    assert set(got) == set(vecs)
    for i in ids:
        assert got[i]["cluster"] == asg[i][0]
        assert got[i]["dist"] == asg[i][1]
        assert got[i]["component_id"] == comp_ref[i], i

    # keep rule: exactly one per component — the max-dist member,
    # ties to the smaller id
    comps: dict[int, list] = {}
    for i in ids:
        comps.setdefault(comp_ref[i], []).append(i)
    for cid, members in comps.items():
        champ = min(members, key=lambda i: (-asg[i][1], i))
        for i in members:
            assert got[i]["keep"] == (i == champ), (cid, i)


def test_semdedup_has_nontrivial_groups(spark, emb):
    """The corpus + tau must actually exercise the closure: at least
    one multi-member component, and keeps == #components."""
    from logparser_spark.operators.semdedup import semdedup

    out = semdedup(emb, k=3, iters=2, tau_ppm=TAU_PPM)
    agg = out.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("keep").cast("int")).alias("kept"),
    ).collect()
    assert any(r["n"] > 1 for r in agg)
    assert all(r["kept"] == 1 for r in agg)
