"""Embedding similarity-search tests."""

import math

import pytest
from pyspark.sql import functions as F

from jaccard_join_duckdb_spark.operators.similarity import (
    cosine_near_duplicates,
    cosine_topk_bruteforce,
    lsh_bucket_topk,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def embeddings(spark):
    from jaccard_join_duckdb_spark.sources import load_table
    return load_table(spark, SF_SMALL, "embeddings").cache()


def test_topk_self_is_rank1_when_included(spark):
    rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = cosine_topk_bruteforce(df, df, k=1, include_self=True)
    for r in out.collect():
        assert r.neighbor_id == r.query_id and r.cosine == 1.0


def test_topk_known_geometry(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 1.0]),
        (3, [-1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.filter("vec_id = 0")
    out = {r.rank: r for r in cosine_topk_bruteforce(df, q, k=3).collect()}
    assert out[1].neighbor_id == 1
    assert out[2].neighbor_id == 2
    assert out[3].neighbor_id == 3
    assert abs(out[1].cosine - 0.9 / math.sqrt(0.82)) < 1e-6


def test_topk_real_embeddings(embeddings):
    q = embeddings.filter(F.col("vec_id") < 5)
    out = cosine_topk_bruteforce(embeddings, q, k=5)
    rows = out.collect()
    assert len(rows) == 25
    # ranks are 1..5 per query, scores non-increasing
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q_id, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == [1, 2, 3, 4, 5]
        scores = [r.cosine for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_near_duplicates_threshold(embeddings):
    sub = embeddings.filter(F.col("vec_id") < 100)
    out = cosine_near_duplicates(sub, threshold=0.9)
    for r in out.collect():
        assert r.cosine >= 0.9
        assert r.l_id < r.r_id


def test_lsh_topk_subset_of_brute(embeddings):
    """LSH top-k scores can't exceed brute-force; rank-1 within the
    same bucket should usually agree."""
    q = embeddings.filter(F.col("vec_id") < 3)
    brute = {(r.query_id, r.rank): r.cosine for r in cosine_topk_bruteforce(embeddings, q, k=3).collect()}
    approx = {(r.query_id, r.rank): r.cosine for r in lsh_bucket_topk(embeddings, q, k=3, n_planes=2).collect()}
    for key, sc in approx.items():
        assert sc <= brute[(key[0], 1)] + 1e-9


def test_banded_topk_recall_ordering(embeddings):
    """ANN top-k recall is monotone in banding: the banded path's
    candidate set is a structural superset of the single-band path
    (band 0 = the identical plane set, one sequential hyperplane
    stream), so its recall@k against brute force can only be >= —
    and more bands can only add candidates."""
    from jaccard_join_duckdb_spark.operators.similarity import (
        ann_recall,
        lsh_banded_topk,
    )

    q = embeddings.filter(F.col("vec_id") < 10)
    exact = cosine_topk_bruteforce(embeddings, q, k=5)
    r_single = ann_recall(lsh_bucket_topk(embeddings, q, k=5, n_planes=4), exact)
    r_banded = ann_recall(
        lsh_banded_topk(embeddings, q, k=5, n_bands=8, n_planes=4), exact
    )
    r_banded16 = ann_recall(
        lsh_banded_topk(embeddings, q, k=5, n_bands=16, n_planes=4), exact
    )
    assert r_single <= r_banded <= r_banded16 <= 1.0
    # OR-amplification must actually recover neighbors on this corpus,
    # not just tie the single band (sf0.1: 0.16 → 0.80 → 0.94).
    assert r_banded > r_single
    out = lsh_banded_topk(embeddings, q, k=5, n_bands=8, n_planes=4)
    assert out.columns == ["query_id", "neighbor_id", "cosine", "rank"]


def test_pandas_topk_matches_expression_topk(spark, embeddings):
    """The numpy-matmul path must produce the same neighbor ranking as
    the expression-based brute force (scores equal to ~1e-9; the 6-dp
    rounding may differ only on exact ties)."""
    from jaccard_join_duckdb_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_pandas,
    )

    q = embeddings.filter("vec_id < 5")
    want = {
        (r.query_id, r.neighbor_id, r.rank): r.cosine
        for r in cosine_topk_bruteforce(embeddings, q, k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id, r.rank): r.cosine
        for r in cosine_topk_pandas(embeddings, q, k=5).collect()
    }
    assert set(got) == set(want)
    for key, score in got.items():
        assert abs(score - want[key]) <= 1e-5


def test_ivf_topk_recall(spark, embeddings):
    """IVF probes a subset of lists — recall against brute force must
    stay high on this corpus and the output schema must match."""
    from jaccard_join_duckdb_spark.operators.similarity import (
        cosine_topk_bruteforce,
        ivf_topk,
    )

    q = embeddings.filter("vec_id < 10")
    brute = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_bruteforce(embeddings, q, k=5).collect()
    }
    ivf = ivf_topk(embeddings, q, k=5, n_lists=8, n_probe=4)
    assert ivf.columns == ["query_id", "neighbor_id", "cosine", "rank"]
    got = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    recall = len(got & brute) / len(brute)
    assert recall >= 0.5, f"IVF recall collapsed: {recall}"
    # determinism: same seed, same result
    again = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(embeddings, q, k=5, n_lists=8, n_probe=4).collect()
    }
    assert got == again


def test_banded_lsh_recall_ordering(embeddings):
    """Candidate recall is monotone: single-band LSH ⊆ banded LSH ⊆
    exact all-pairs. Band 0 of the banded variant uses the identical
    plane set as the single-band operator (one sequential hyperplane
    stream), so the subset relation is structural, not statistical."""
    from jaccard_join_duckdb_spark.operators.similarity import (
        cosine_near_duplicates_lsh_banded,
        hyperplanes,
        lsh_bucket_expr,
    )

    t, planes = 0.4, hyperplanes(64, 4)
    exact = {
        (r.l_id, r.r_id)
        for r in cosine_near_duplicates(
            embeddings, threshold=t
        ).collect()
    }
    single = {
        (r.l_id, r.r_id)
        for r in cosine_near_duplicates(
            embeddings,
            threshold=t,
            block_expr=lsh_bucket_expr(F.col("embedding"), planes),
        ).collect()
    }
    banded = {
        (r.l_id, r.r_id)
        for r in cosine_near_duplicates_lsh_banded(
            embeddings, threshold=t, n_bands=4, n_planes=4
        ).collect()
    }
    assert single <= banded <= exact
    # OR-amplification should actually help on this corpus, not just
    # tie — banded recall strictly above single-band.
    assert len(banded) > len(single)


def test_ivf_kmeans_centroids_recall(spark, embeddings):
    """centroids="kmeans" (seeded spherical k-means on a bounded
    deterministic sample) is deterministic across invocations and its
    recall vs brute force is measurable and sane."""
    from jaccard_join_duckdb_spark.operators.similarity import (
        ann_recall,
        ivf_topk,
    )

    q = embeddings.filter(F.col("vec_id") < 10)
    exact = cosine_topk_bruteforce(embeddings, q, k=5)
    km1 = ivf_topk(embeddings, q, k=5, n_lists=8, n_probe=4, centroids="kmeans")
    km2 = ivf_topk(embeddings, q, k=5, n_lists=8, n_probe=4, centroids="kmeans")
    rows1 = sorted(map(tuple, km1.collect()))
    assert rows1 == sorted(map(tuple, km2.collect()))  # deterministic
    r = ann_recall(km1, exact)
    assert 0.0 <= r <= 1.0
    # probing half the lists of a near-orthogonal corpus must do far
    # better than chance; exactness isn't required, sanity is
    assert r >= 0.3


def test_embedding_lsh_index_bucketed_roundtrip(spark, embeddings):
    """write_embedding_lsh_index → read_embedding_lsh_index: the
    table-backed index produces byte-identical matches to the
    in-memory one (hyperplanes regenerate deterministically from the
    build parameters). Plan-level exchange evidence is exit-gated in
    tools/index_bucket_bench.py."""
    from jaccard_join_duckdb_spark.operators.similarity import (
        embedding_lsh_index,
        embedding_lsh_match,
        read_embedding_lsh_index,
        write_embedding_lsh_index,
    )

    corpus = embeddings.filter(F.col("vec_id") % 10 != 0)
    queries = embeddings.filter(F.col("vec_id") % 10 == 0)
    idx = embedding_lsh_index(corpus, "vec_id", "embedding")
    want = {
        tuple(r)
        for r in embedding_lsh_match(queries, idx, threshold=0.4).collect()
    }
    try:
        write_embedding_lsh_index(idx, "emb_idx_rt", num_buckets=4)
        idx2 = read_embedding_lsh_index(spark, "emb_idx_rt")
        got = {
            tuple(r)
            for r in embedding_lsh_match(
                queries, idx2, threshold=0.4
            ).collect()
        }
        assert got == want and want  # non-trivial match set
        # parameter mismatch must fail loud (regenerated planes would
        # silently never collide with the stored signatures)
        with pytest.raises(ValueError, match="build-time"):
            read_embedding_lsh_index(spark, "emb_idx_rt", n_planes=8)
        assert (idx2.n_bands, idx2.n_planes) == (idx.n_bands, idx.n_planes)
    finally:
        spark.sql("drop table if exists emb_idx_rt_sigs")
        spark.sql("drop table if exists emb_idx_rt_vecs")
        spark.sql("drop table if exists emb_idx_rt_meta")
        idx.unpersist()


class TestEmbeddingStats:
    def test_crafted(self, spark):
        import math

        from jaccard_join_duckdb_spark.operators.similarity import (
            embedding_stats,
        )

        df = spark.createDataFrame(
            [
                (0, [3.0, 4.0]),
                (1, [0.0, 0.0, 0.0]),
                (2, [float("nan"), 1.0]),
                (3, None),
                (4, [None, 2.0]),
            ],
            "vec_id long, embedding array<double>",
        )
        rows = {r.id: r for r in embedding_stats(df).collect()}
        assert (rows[0].dim, rows[0].sq_norm) == (2, 25.0)
        assert (rows[1].n_zero, rows[1].sq_norm) == (3, 0.0)
        assert rows[2].n_nan == 1 and math.isnan(rows[2].sq_norm)
        assert rows[3].dim == -1 and rows[3].sq_norm is None
        assert rows[4].n_null == 1


class TestSemanticDedup:
    def test_within_cluster_chain_and_survivors(self, spark):
        from jaccard_join_duckdb_spark.operators.similarity import (
            semantic_dedup,
        )

        # two tight direction-clusters + one loner; ids 1 and 2 are the
        # min_ids centroids. 1,2,3 are near-parallel (cosine ~1) and
        # land in list 0; 4,5 near-parallel in list 1; 6 alone.
        rows = [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (3, [0.999, 0.01, 0.0]),     # duplicate of 1
            (4, [0.01, 0.999, 0.0]),     # duplicate of 2
            (5, [0.0, 0.995, 0.05]),     # duplicate of 2 (chain via 4)
            (6, [0.5, 0.5, 0.7071]),     # similar to nobody at 0.95
        ]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        got = {
            r.vec_id: (r.list_id, r.kept)
            for r in semantic_dedup(
                df, "vec_id", "embedding", 0.95, n_lists=2
            ).collect()
        }
        assert len(got) == 6
        assert got[1] == (0, True)       # min id of {1,3}
        assert got[3] == (0, False)
        assert got[2] == (1, True)       # min id of {2,4,5}
        assert got[4][1] is False and got[5][1] is False
        assert got[6][1] is True         # unclustered survivor

    def test_cross_cluster_dups_missed_by_design(self, spark):
        from jaccard_join_duckdb_spark.operators.similarity import (
            semantic_dedup,
        )

        # identical vectors forced into different lists by n_lists=2
        # centroids picked from ids 1,2: id 3 == id 1's vector lands
        # with centroid 0 alongside 1 -> caught; but a pair split
        # across lists is NOT caught. Construct: 4 is identical to 2
        # (list 1), 3 identical to 1 (list 0) -> both caught; sanity
        # that per-list pairing produced no cross-list edge is implied
        # by kept flags staying per-component-min.
        rows = [
            (1, [1.0, 0.0]),
            (2, [0.0, 1.0]),
            (3, [1.0, 0.0]),
            (4, [0.0, 1.0]),
        ]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        got = {
            r.vec_id: r.kept
            for r in semantic_dedup(
                df, "vec_id", "embedding", 0.99, n_lists=2
            ).collect()
        }
        assert got == {1: True, 2: True, 3: False, 4: False}
