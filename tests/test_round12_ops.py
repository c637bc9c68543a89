"""Round-12 tests: the ALS temporal backtest (the learned fourth row of
the backtest leaderboard) and its measured lift-vs-popularity floors.

The census component's counts are oracle-checked cross-engine
(scripts/check_correctness.py); these tests pin what SQL cannot — the
model-valued hit-rates. Measured micro precision@k (1e6 * hits /
(users * k)) at sf0.001 / 0.01 / 0.1:

    popularity  64583 /  7823 / 729
    ALS plain   75000 /  7939 / 690   (lift 1.161 / 1.015 / 0.947)
    ALS + MMR   72916 /  8076 / 765   (lift 1.129 / 1.032 / 1.049)

ALS at the SHIPPED config (rank 16) beats popularity at the two smaller
SFs and loses by ~6% at sf0.1. Round 12 explained the sf0.1 loss as
"TPC-H baskets are near-random"; the round-13 hyperparameter grid
(rec_backtest_als_grid, tests/test_round13_ops.py, COVERAGE.md round
13) REFUTED that: rank 150 wins at every SF (reg 0.1: lift
1.19/1.05/1.25; reg 0.01 at sf0.1: lift 1.30) — the rank-16 model was
capacity-starved as the catalog grew, not facing an unlearnable
dataset. The shipped config stays rank 16 as the cost/quality default
(≈10x fewer factor parameters); the grid is the recorded evidence for
the trade. MMR diversification does NOT cost temporal hit-rate (it
slightly helps at 0.01/0.1). The floors below leave wide margin but
catch a broken serve path (a random shelf measures ~5% of popularity).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from e_commerce_data_warehouse_recommendation_system_spark.recommend.queries import (
    BACKTEST_ALS_LIFT_FLOOR_PCT,
    TOP_K,
    _backtest_als_artifacts,
    _backtest_als_rates,
    rec_backtest_als,
    rec_backtest_leaderboard,
    rec_backtest_popularity,
)
from e_commerce_data_warehouse_recommendation_system_spark.sources.readers import prepare
from tests.conftest import SF0001

# full-gate lane: multi-minute property/identity/streaming work (see pytest.ini)
pytestmark = pytest.mark.slow


def _pop_rate_micro(spark) -> tuple[int, int, int]:
    pop = rec_backtest_popularity(spark, SF0001).agg(
        F.count(F.lit(1)).alias("u"), F.sum("n_hits").alias("h")
    ).first()
    return int(pop.u), int(pop.h), 1000000 * int(pop.h) // (int(pop.u) * TOP_K)


def test_backtest_als_census_contract(spark):
    """Census invariants at sf0.001: every eval user trained pre-cutoff,
    exactly k predictions each (the pool-width guarantee), and both
    genuine flags hold — novelty (no predicted item seen pre-cutoff) and
    hit boundedness."""
    prepare(spark, SF0001)
    rows = rec_backtest_als(spark, SF0001).collect()
    assert rows
    users = [r.user_id for r in rows]
    assert len(users) == len(set(users))
    for r in rows:
        assert r.n_pred == TOP_K
        assert r.n_novel_items >= 1
        assert r.novelty_ok
        assert r.hits_bounded_ok


def test_backtest_als_leakage_guard(spark):
    """The backtest model must be trained on strictly pre-cutoff pairs:
    its item dictionary cannot contain an item that first appears
    post-cutoff (if one exists in the fixture), and the truth set is
    disjoint from the training pairs by construction — re-derived here
    from the artifacts, not assumed."""
    prepare(spark, SF0001)
    art = _backtest_als_artifacts(spark, SF0001)
    # truth ∩ pre must be empty (novelty of the eval protocol itself)
    overlap = art["truth"].join(art["pre"], ["u", "i"], "left_semi").count()
    assert overlap == 0
    # every trained item id exists in the pre slice
    pre_items = art["pre"].select(F.col("i")).distinct()
    orphan_items = art["items"].join(pre_items, "i", "left_anti").count()
    assert orphan_items == 0


def test_backtest_als_lift_floors(spark):
    """The measured-rate floors behind the leaderboard's contract flags:
    plain-ALS and MMR-diversified micro hit-rates vs popularity's
    SQL-exact rate on the same novel-truth protocol. Pins BOTH the
    contract floor (>= {floor}% of popularity) and the measured sf0.001
    values with regression margin (measured 75000 / 72916 vs popularity
    64583)."""
    prepare(spark, SF0001)
    rates = _backtest_als_rates(spark, SF0001)
    _, _, pop_rate = _pop_rate_micro(spark)
    assert rates["rate_micro"] * 100 >= pop_rate * BACKTEST_ALS_LIFT_FLOOR_PCT
    assert rates["mmr_rate_micro"] * 100 >= pop_rate * BACKTEST_ALS_LIFT_FLOOR_PCT
    # measured-value regression floors (seeded fit, deterministic fixture):
    # generous margin under the measured 75000/72916
    assert rates["rate_micro"] >= 55000
    assert rates["mmr_rate_micro"] >= 55000
    # and the lift itself: ALS beats popularity at this SF (recorded)
    assert rates["rate_micro"] > pop_rate


def test_dq_embeddings_contract_clean_and_catches_injection(spark, tmp_path_factory):
    """The embeddings contract reports zero violations on the shipped
    sf0.001 testdata (where coverage is exactly 1:1), and each rule fires
    on an injected corrupted table — driven through the REAL component
    over a constructed fixture dir, not a re-built rule list."""
    import math
    import os

    from e_commerce_data_warehouse_recommendation_system_spark.registry import (
        components,
    )

    fn = components()["dq_embeddings_checks"].fn
    clean = {r.rule: r.violations for r in fn(spark, SF0001).collect()}
    assert len(clean) == 11
    for rule, v in clean.items():
        if rule.startswith("digest:"):
            continue
        assert v == 0, (rule, v)
    # norm digest sanity on the clean table: 64-dim unit-ish vectors
    assert 0 < clean["digest:min_sqnorm_micro"] <= clean["digest:max_sqnorm_micro"]

    base = tmp_path_factory.mktemp("emb_dq")
    out = str(base / "fixture")
    os.makedirs(out)
    for t in (
        "region nation customer supplier part orders lineitem events"
    ).split():
        os.symlink(f"/root/testdata/sf0.001/{t}.parquet", f"{out}/{t}.parquet")
    docs = [(i, f"doc {i}", "en", "src1", 6 + len(str(i))) for i in range(1, 5)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{out}/documents.parquet")
    vecs = [
        (1, [1.0, 0.0], 3),  # ok (2-dim majority)
        (2, [float("nan"), 1.0], 0),  # NaN component
        (3, [0.0, 0.0], 0),  # zero norm
        (99, [1.0, float("inf")], 11),  # orphan id + Inf + label out of range
        (None, [0.5, 0.5, 0.5], None),  # null id + ragged dim + null label
    ]
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{out}/embeddings.parquet")
    got = {r.rule: r.violations for r in fn(spark, out).collect()}
    assert got["not_null(vec_id)"] == 1
    assert got["dim_consistent(embedding)"] == 1  # two distinct dims
    assert got["finite(embedding)"] == 2  # NaN row + Inf row
    assert got["nonzero_norm(embedding)"] == 1
    assert got["accepted_range(label)"] == 2  # label 11 + null label
    assert got["fk_orphan_vectors(documents)"] >= 1  # id 99 (null id joins nothing)
    assert got["census:docs_without_vector"] == 1  # doc 4 has no vector
    # NaN/Inf rows fall out of the decimal digest as NULLs (skipped by the
    # aggregates); the clean rows still produce a well-defined integer sum
    assert got["digest:sum_sqnorm_micro"] is not None
    assert math.isfinite(float(got["digest:sum_sqnorm_micro"]))


def test_cluster_weights_algebra(spark):
    """Weight algebra on the real component: every cluster's members share
    its root and size; exactly one keeper per cluster (the root itself);
    weight_micro == 1e6 // size; singleton docs keep full weight; the
    effective-corpus identity holds (sum of 1e6//size over members of a
    size-s cluster = s * (1e6 // s), summed over clusters)."""
    from e_commerce_data_warehouse_recommendation_system_spark.registry import (
        components,
    )

    rows = components()["dedup_cluster_weights"].fn(spark, SF0001).collect()
    assert rows
    by_root: dict = {}
    for r in rows:
        by_root.setdefault(r.cluster_root, []).append(r)
    for root, members in by_root.items():
        size = len(members)
        keepers = [m for m in members if m.is_keeper]
        assert len(keepers) == 1 and keepers[0].doc_id == root
        assert root == min(m.doc_id for m in members)
        for m in members:
            assert m.cluster_size == size
            assert m.weight_micro == 1000000 // size
    # at least one non-trivial cluster exists in the fixture, and
    # singletons keep weight exactly 1.0
    assert any(len(m) > 1 for m in by_root.values())
    assert any(
        len(m) == 1 and m[0].weight_micro == 1000000 for m in by_root.values()
    )


def test_hybrid_rrf_fusion_properties(spark):
    """Fusion invariants on the real component: <= k rows per query with
    contiguous ranks; every hit came from at least one modality; RRF
    scores are consistent with the flags (a both-modality hit outscores
    floor bounds); ordering is (score desc, id asc); and both
    single-modality and (if present) dual-modality hits exist."""
    from e_commerce_data_warehouse_recommendation_system_spark.operators.dedup import (
        RRF_FUSION_K,
    )
    from e_commerce_data_warehouse_recommendation_system_spark.operators.similarity import (
        TOPK,
    )
    from e_commerce_data_warehouse_recommendation_system_spark.registry import (
        components,
    )

    rows = components()["sim_hybrid_rrf"].fn(spark, SF0001).collect()
    assert rows
    max_single = 1000000 // (RRF_FUSION_K + 1)
    by_q: dict = {}
    for r in rows:
        assert r.from_vector or r.from_lexical
        assert r.neighbor_id != r.query_id
        if r.from_vector and r.from_lexical:
            assert r.rrf_micro > max_single
        else:
            assert 0 < r.rrf_micro <= max_single
        by_q.setdefault(r.query_id, []).append(r)
    for q, hits in by_q.items():
        assert len(hits) <= TOPK
        hits.sort(key=lambda r: r.fused_rank)
        assert [r.fused_rank for r in hits] == list(range(1, len(hits) + 1))
        for a, b in zip(hits, hits[1:]):
            assert (a.rrf_micro, -a.neighbor_id) >= (b.rrf_micro, -b.neighbor_id)
    assert any(r.from_vector and not r.from_lexical for r in rows)
    assert any(r.from_lexical and not r.from_vector for r in rows)


def test_data_card_consistency(spark):
    """The release card's cells must be mutually consistent and conserve
    the corpus: per group, unique <= docs, gopher-pass <= docs, effective
    mass <= docs (weights never exceed 1.0) and >= the per-group doc count
    would imply no dedup — at least one group must show effective < docs
    (the fixture plants duplicate families); the group doc totals must sum
    to the documents table row count."""
    from e_commerce_data_warehouse_recommendation_system_spark.registry import (
        components,
    )
    from e_commerce_data_warehouse_recommendation_system_spark.sources.readers import (
        prepare as _prep,
    )

    _prep(spark, SF0001)
    rows = components()["text_data_card"].fn(spark, SF0001).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_exact_unique <= r.n_docs
        assert 0 <= r.n_gopher_pass <= r.n_docs
        assert 0 < r.effective_docs_micro <= r.n_docs * 1000000
        assert r.n_tokens > 0 and r.n_chars > 0
    assert sum(r.n_docs for r in rows) == spark.table("documents").count()
    assert any(r.effective_docs_micro < r.n_docs * 1000000 for r in rows)


def test_backtest_coldstart_population_disjoint(spark):
    """The cold-start census covers EXACTLY the users the warm backtests
    cannot: disjoint from every pre-cutoff user, and together with the
    popularity backtest's novel-eval users it covers all users with
    post-cutoff activity whose items qualify for their protocol. Bounds:
    hits <= min(k, n_post_items)."""
    from e_commerce_data_warehouse_recommendation_system_spark.recommend.queries import (
        TOP_K,
        _backtest_pre_post,
    )
    from e_commerce_data_warehouse_recommendation_system_spark.registry import (
        components,
    )
    from e_commerce_data_warehouse_recommendation_system_spark.sources.readers import (
        prepare as _prep,
    )

    _prep(spark, SF0001)
    rows = components()["rec_backtest_coldstart"].fn(spark, SF0001).collect()
    pre, post = _backtest_pre_post(spark)
    pre_users = {r.u for r in pre.select("u").distinct().collect()}
    post_users = {r.u for r in post.select("u").distinct().collect()}
    cold_expected = post_users - pre_users
    assert {r.user_id for r in rows} == cold_expected
    for r in rows:
        assert 0 <= r.n_hits <= min(TOP_K, r.n_post_items)
        assert r.p_at_k_micro == 1000000 * r.n_hits // TOP_K


def test_ivf_incremental_add_contract(spark):
    """Incremental ANN ingestion: the contract rows must show the batch
    really arrived (queries unservable before, all servable after), the
    base/batch split conserves the corpus, and both genuine parity flags
    hold (additivity + serve identity vs the one-shot index)."""
    from e_commerce_data_warehouse_recommendation_system_spark.registry import (
        components,
    )
    from e_commerce_data_warehouse_recommendation_system_spark.sources.readers import (
        prepare as _prep,
    )

    _prep(spark, SF0001)
    rows = {
        r.label: r.value_num
        for r in components()["sim_ivf_incremental_add"].fn(spark, SF0001).collect()
    }
    n_emb = spark.table("embeddings").count()
    assert rows["n_base"] + rows["n_batch"] == n_emb
    assert rows["n_batch"] >= 1
    assert rows["n_queries_before"] == 0
    assert rows["n_queries_after"] >= 1
    assert rows["assignment_additive_ok"] == 1
    assert rows["serve_identical_ok"] == 1


def test_backtest_leaderboard_totals_consistent(spark):
    """The leaderboard's SQL-exact baseline totals must equal the
    aggregates of the census components it summarizes, and the ALS flags
    must be true (the lift floors hold at sf0.001)."""
    prepare(spark, SF0001)
    row = rec_backtest_leaderboard(spark, SF0001).first()
    pop_u, pop_h, _ = _pop_rate_micro(spark)
    assert row.pop_users == pop_u
    assert row.pop_hits == pop_h
    # warm restriction (r12 ADVICE): the floor's popularity denominator is
    # the ALS-eval population EXACTLY — novel-truth users present pre-cutoff
    assert row.pop_warm_users == row.als_users
    assert row.pop_warm_hits <= row.pop_hits
    assert row.pop_warm_users <= row.pop_users
    assert row.als_users <= row.pop_users  # cold users drop from ALS's side
    assert row.als_truth <= row.pop_truth
    assert row.als_rate_floor_met
    assert row.als_mmr_rate_floor_met
    assert row.mkv_pred <= row.mkv_users * TOP_K
