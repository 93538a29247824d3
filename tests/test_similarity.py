"""ANN quality gates: the IVF probe schedule must rank cells by true
centroid distance, which shows up as recall vs the brute-force top-k."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_cpp_spark.functions import similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from parquet_cpp_spark.session import get_spark
    return get_spark(master="local[4]", app_name="pcs-sim",
                     shuffle_partitions=4)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.probe_id, set()).add(r.vec_id)
    return out


def _clustered_embeddings(spark, n_clusters=16, per_cluster=80, dim=64,
                          seed=5):
    """Synthetic clusterable corpus: IVF's contract is recall on data with
    cluster structure (the sf embeddings are near-uniform random, where no
    4-of-16-cell schedule can reach high recall by construction)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)) * 4
    rows = []
    vid = 0
    for c in range(n_clusters):
        pts = centers[c] + rng.standard_normal((per_cluster, dim))
        for p in pts:
            rows.append((vid, [float(x) for x in p], f"c{c}"))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label string")


def test_ivf_recall_vs_bruteforce(spark):
    """nprobe=4 of 16 cells with true nearest-centroid ranking recovers
    >= 0.9 of the brute-force cosine top-k on clustered data (the
    modular-offset cell stand-in this replaced picks arbitrary cells and
    fails this bar)."""
    emb = _clustered_embeddings(spark)
    probes = [0, 100, 300, 700, 1100]
    k = 5
    exact = _topk_sets(similarity.topk_cosine(emb, probes, k=k))
    ivf = _topk_sets(similarity.topk_cosine_ivf(emb, probes, k=k,
                                                n_centroids=16, nprobe=4))
    hits = sum(len(exact[p] & ivf.get(p, set())) for p in exact)
    total = sum(len(exact[p]) for p in exact)
    recall = hits / total
    assert recall >= 0.9, f"IVF recall {recall:.2f} < 0.9"


def test_ivf_assign_deterministic(spark, emb):
    a = similarity.ivf_assign(emb).select("vec_id", "ivf_cell").collect()
    b = similarity.ivf_assign(emb).select("vec_id", "ivf_cell").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
