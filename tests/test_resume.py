"""Resumability e2e (SURVEY.md §5, BASELINE.json: "resumable from
per-partition checkpoints with lineage"): a build whose fragment stage
partially completed (simulated kill: one bucket's checkpoint deleted)
resumes by recomputing ONLY the missing bucket, and the resumed index
answers queries identically to a clean build."""

import json
import os
import shutil

import pytest

from aarhus_spark.operators.build import IndexPaths, build_index, _done_buckets
from aarhus_spark.operators.search import search_taat
from aarhus_spark.sources.fixtures import gen_pages, gen_queries

N_PAGES = 600
N_BUCKETS = 5


@pytest.fixture(scope="module")
def corpus():
    pdf = gen_pages(N_PAGES)
    return pdf, gen_queries(pdf).head(10)


def _results(spark, idx, queries):
    qdf = spark.createDataFrame(queries)
    return sorted(tuple(r) for r in search_taat(spark, idx, qdf).collect())


def test_resume_recomputes_only_missing_bucket(spark, corpus, tmpdir_session):
    pdf, queries = corpus
    pages = spark.createDataFrame(pdf)
    clean = os.path.join(tmpdir_session, "idx_clean")
    build_index(spark, pages, clean, n_partitions=4, n_buckets=N_BUCKETS, salts=2)
    want = _results(spark, clean, queries)

    # simulate a mid-job kill: bucket 2's checkpoint (manifest + data) is
    # missing, segments/stats never written
    broken = os.path.join(tmpdir_session, "idx_broken")
    shutil.copytree(clean, broken)
    p = IndexPaths(broken)
    os.remove(os.path.join(p.manifests, "bucket-2.json"))
    shutil.rmtree(os.path.join(p.fragments, "bucket=2"))
    os.remove(p.stats)
    shutil.rmtree(p.segments)
    manifest_mtimes = {
        f: os.path.getmtime(os.path.join(p.manifests, f))
        for f in os.listdir(p.manifests) if f.endswith(".json")
    }
    assert _done_buckets(p.manifests) == {0, 1, 3, 4}

    build_index(spark, pages, broken, n_partitions=4, n_buckets=N_BUCKETS,
                salts=2, resume=True)

    # only bucket 2 recomputed: the other manifests untouched
    for f, old in manifest_mtimes.items():
        assert os.path.getmtime(os.path.join(p.manifests, f)) == old, f
    assert _done_buckets(p.manifests) == set(range(N_BUCKETS))
    with open(os.path.join(p.manifests, "bucket-2.json")) as fh:
        man = json.load(fh)
    assert man["rows"] > 0 and man["postings"] > 0  # lineage metrics present

    # identical answers
    assert _results(spark, broken, queries) == want


def test_resume_completed_build_is_noop(spark, corpus, tmpdir_session):
    pdf, _ = corpus
    pages = spark.createDataFrame(pdf)
    idx = os.path.join(tmpdir_session, "idx_noop")
    s1 = build_index(spark, pages, idx, n_partitions=4, n_buckets=3, salts=2)
    seg_mtime = os.path.getmtime(os.path.join(IndexPaths(idx).segments, "_SUCCESS"))
    s2 = build_index(spark, pages, idx, resume=True)
    assert s2["N"] == s1["N"]
    assert os.path.getmtime(os.path.join(IndexPaths(idx).segments, "_SUCCESS")) == seg_mtime


def test_metrics_lineage_written(spark, corpus, tmpdir_session):
    pdf, _ = corpus
    pages = spark.createDataFrame(pdf)
    idx = os.path.join(tmpdir_session, "idx_metrics")
    build_index(spark, pages, idx, n_partitions=4, n_buckets=3, salts=2)
    p = IndexPaths(idx)
    lines = [json.loads(l) for l in open(p.metrics)]
    stages = {m["stage"] for m in lines}
    assert {"prepare+docids+doclens", "head-detect",
            "fragments", "merge+segments", "dictionary"} <= stages
    for f in os.listdir(p.manifests):
        man = json.load(open(os.path.join(p.manifests, f)))
        assert {"bucket", "rows", "postings", "tokens_per_sec", "wall_s"} <= set(man)
