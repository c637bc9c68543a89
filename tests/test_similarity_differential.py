"""Adversarial differential test for the embedding-similarity family.

Constructed 64-dim geometry with EXACT cosines: a scaled exact duplicate
(cosine 1), 3-4-5-triangle vectors (cosine exactly 0.6 and 0.8 — integer
dots, integer norms), an orthogonal vector, an antipode, and 34 fillers on
distinct basis axes (pairwise cosine 0, and enough vectors that the
LSH miner's 32 data-derived hyperplanes exist). Every value is exact in
float32 and the decimal-dot pipeline, so the assertions are equalities,
not tolerances, except the single 1/sqrt(2) case.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from e_commerce_data_warehouse_recommendation_system_spark import registry

DIM = 64


def _vec(pairs: dict[int, float]) -> list[float]:
    v = [0.0] * DIM
    for i, x in pairs.items():
        v[i] = x
    return v


@pytest.fixture(scope="module")
def emb_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sim_diff")
    out = str(base / "fixture")
    os.makedirs(out)
    for t in (
        "region nation customer supplier part orders lineitem events documents"
    ).split():
        os.symlink(f"/root/testdata/sf0.001/{t}.parquet", f"{out}/{t}.parquet")
    rows = [
        (0, _vec({0: 1.0}), 0),            # the query (0 % 100 == 0)
        (1, _vec({0: 2.0}), 0),            # scaled duplicate: cos(0,1) = 1
        (2, _vec({0: 3.0, 1: 4.0}), 0),    # cos(0,2) = 3/5 = 0.6 exactly
        (3, _vec({1: 1.0}), 0),            # orthogonal: cos(0,3) = 0
        (4, _vec({0: 1.0, 1: 1.0}), 0),    # cos(0,4) = 1/sqrt(2)
        (5, _vec({0: -1.0}), 0),           # antipode: cos(0,5) = -1
    ] + [
        (i, _vec({i: 1.0}), 0) for i in range(6, 40)  # distinct axes
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{out}/embeddings.parquet")
    return out


def _duck(emb_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        path = f"{emb_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con


def _differential(spark, emb_dir, name):
    comp = registry.components().get(name)
    if comp is None:
        fn, oracle = registry.queries()[name], registry.oracles()[name]
    else:
        fn, oracle = comp.fn, comp.oracle
    got = sorted(tuple(r) for r in fn(spark, emb_dir).collect())
    want = sorted(tuple(r) for r in _duck(emb_dir).execute(oracle).fetchall())
    assert got == want, (name, got, want)
    return got


def test_cosine_topk_exact_geometry(spark, emb_dir):
    got = _differential(spark, emb_dir, "sim_cosine_topk")
    top = sorted((r for r in got if r[0] == 0), key=lambda r: r[3])
    # rank 1..3 are the planted geometry with exact values
    assert [r[1] for r in top[:3]] == [1, 4, 2]
    assert top[0][2] == 1.0
    assert abs(top[1][2] - 1 / math.sqrt(2)) < 1e-12
    assert top[2][2] == 0.6
    # ranks 4-5: the zero-cosine tie broken by ascending neighbor id
    assert [r[1] for r in top[3:]] == [3, 6] and all(r[2] == 0.0 for r in top[3:])


def test_embedding_exact_pairs(spark, emb_dir):
    got = _differential(spark, emb_dir, "dedup_embedding_exact")
    pairs = {(a, b): c for a, b, c in got}
    assert set(pairs) == {
        (0, 1), (0, 2), (0, 4), (1, 2), (1, 4), (2, 3), (2, 4), (3, 4),
    }
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 2)] == pairs[(1, 2)] == 0.6
    assert pairs[(2, 3)] == 0.8
    assert abs(pairs[(2, 4)] - 7 / (5 * math.sqrt(2))) < 1e-12


def test_embedding_lsh_finds_the_duplicate(spark, emb_dir):
    got = _differential(spark, emb_dir, "dedup_embedding_cosine")
    exact = {(a, b) for a, b, _ in _differential(spark, emb_dir, "dedup_embedding_exact")}
    pairs = {(a, b): c for a, b, c in got}
    # identical-direction vectors share every sign bit: guaranteed found
    assert pairs[(0, 1)] == 1.0
    # bucketed results are a subset of the exact twin (no false positives)
    assert set(pairs) <= exact
