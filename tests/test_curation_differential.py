"""Adversarial differential test for the curation pipeline.

The driver checks text_curation_pipeline against its DuckDB oracle on the
FIXED testdata; this builds a small constructed corpus holding every
tricky shape at once — exact duplicates, a doc sharing a >= 13-token span
with the eval holdout (contaminated), a near-dup pair whose later doc is
excised down to UNDER the shingle width (exercising the short-doc guard
INSIDE the pipeline at the decontamination stage), funnel rejects of every
rule, and a heavily skewed source distribution (so the temperature
downsample genuinely drops) — runs the Spark pipeline AND the same DuckDB
oracle on that corpus, and compares the full 7-row result exactly.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F  # noqa: F401 (parity with sibling tests)

from e_commerce_data_warehouse_recommendation_system_spark import registry

# full-gate lane: multi-minute property/identity/streaming work (see pytest.ini)
pytestmark = pytest.mark.slow


def _doc(words: list[str]) -> str:
    return " ".join(words)


def _filler(tag: str, n: int, stopword_every: int = 6) -> list[str]:
    """n distinct-ish 4-6 char words, a stopword every few tokens so the
    funnel's stopword-fraction rule passes."""
    out = []
    for i in range(n):
        out.append("the" if i % stopword_every == 0 else f"{tag}tok{i:03d}")
    return out


@pytest.fixture(scope="module")
def adversarial_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("curation_diff")
    out = str(base / "fixture")
    os.makedirs(out)
    for t in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        os.symlink(f"/root/testdata/sf0.001/{t}.parquet", f"{out}/{t}.parquet")

    shared30 = _filler("shared", 30)        # 30-token span shared by a pair
    evalspan = _filler("leak", 16)          # >= 13-token span planted in eval
    rows = []
    # eval holdout (doc_id % 100 == 0) carrying the leak span
    rows.append((100, _doc(_filler("ev", 10) + evalspan), "en", "bench", None))
    # clean keepers across two sources (skewed: srcA dominant)
    for i in range(12):
        rows.append((200 + i, _doc(_filler(f"a{i}", 30)), "en", "srcA", None))
    for i in range(3):
        rows.append((300 + i, _doc(_filler(f"b{i}", 30)), "en", "srcB", None))
    # exact duplicates: 401 keeps (min id), 402 drops at stage 2
    dup = _doc(_filler("dup", 28))
    rows.append((401, dup, "en", "srcA", None))
    rows.append((402, dup, "en", "srcA", None))
    # near-dup pair: 411 keeps its copy; 412 shares the 30-token span and
    # keeps only 4 tokens after excision (< shingle width 8 -> the guard)
    rows.append((411, _doc(_filler("uniq", 12) + shared30), "en", "srcA", None))
    rows.append((412, _doc(shared30 + ["tail1", "tail2", "tail3", "tail4"]), "en", "srcA", None))
    # contaminated: clean prefix + the eval leak span -> dropped at stage 4
    rows.append((421, _doc(_filler("cl", 14) + evalspan), "en", "srcA", None))
    # funnel rejects, one per rule
    rows.append((501, "tiny", "en", "srcA", None))                      # < 100 chars
    rows.append((502, _doc(["the"] + ["looooooooooooooong"] * 19), "en", "srcA", None))  # mean toklen > 12
    rows.append((503, _doc([f"x{i}" for i in range(40)]) + " " + "y" * 60, "en", "srcA", None))  # no stopwords
    rows.append((504, _doc(_filler("fr", 30)), "fr", "srcA", None))     # wrong lang
    rows = [(i, t, lang, src, len(t)) for (i, t, lang, src, _) in rows]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{out}/documents.parquet")
    return out


def _duck(adversarial_dir):
    """DuckDB connection over the fixture: symlinked tables are single
    files; the Spark-written documents table is a DIRECTORY of part files
    and needs the glob form."""
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        path = f"{adversarial_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con


def test_pipeline_matches_oracle_on_adversarial_corpus(spark, adversarial_dir):
    comp = registry.components()["text_curation_pipeline"]
    got = sorted(
        (tuple(r) for r in comp.fn(spark, adversarial_dir).collect()),
    )
    con = _duck(adversarial_dir)
    want = sorted(tuple(r) for r in con.execute(comp.oracle).fetchall())
    assert got == want, (got, want)

    by = {r[1]: r for r in got}  # stage name -> row
    # the constructed shapes actually fired:
    assert by["c4_funnel"][4] == 4, by["c4_funnel"]          # 4 funnel rejects
    assert by["exact_dedup"][4] == 1                          # dup 402 dropped
    # excision trimmed tokens; doc 412 survives with 4 tokens (not dropped)
    assert by["span_excision"][6] > 0 and by["span_excision"][4] == 0
    assert by["decontamination"][4] == 1                      # doc 421 dropped
    assert by["mixture_downsample"][4] > 0                    # srcA downsampled
    assert by["pack_sequences"][8] >= 1                       # sequences emitted


def test_streaming_ingest_matches_oracle_on_adversarial_corpus(spark, adversarial_dir):
    comp = registry.components()["stream_curation_ingest"]
    got = sorted(tuple(r) for r in comp.fn(spark, adversarial_dir).collect())
    con = _duck(adversarial_dir)
    want = sorted(tuple(r) for r in con.execute(comp.oracle).fetchall())
    assert got == want, (got, want)
