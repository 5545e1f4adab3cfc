"""Similarity-search tests: brute-force exactness vs numpy oracle; LSH recall."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from dlp_dataflow_deidentification_spark.operators import similarity


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def queries_df(spark, emb):
    return emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def numpy_topk(emb_rows, q_rows, k):
    ids = np.array([r.vec_id for r in emb_rows])
    M = np.array([r.embedding for r in emb_rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    out = {}
    for q in q_rows:
        v = np.array(q.embedding, dtype=np.float64)
        sims = Mn @ (v / np.linalg.norm(v))
        order = np.lexsort((ids, -sims))[:k]
        out[q.query_id] = [int(ids[i]) for i in order]
    return out


def test_brute_force_topk_matches_numpy(spark, emb, queries_df):
    got_rows = similarity.cosine_topk(emb, queries_df, k=5).collect()
    got = {}
    for r in sorted(got_rows, key=lambda r: (r.query_id, r.rank)):
        got.setdefault(r.query_id, []).append(r.vec_id)
    want = numpy_topk(emb.collect(), queries_df.collect(), 5)
    assert got == want
    # self-similarity: rank 1 is the query itself with sim ≈ 1
    by_rank1 = {r.query_id: r for r in got_rows if r.rank == 1}
    for qid, r in by_rank1.items():
        assert r.vec_id == qid and abs(r.sim - 1.0) < 1e-9


def test_cosine_topk_arrow_equals_native(spark, emb, queries_df):
    """The Arrow/BLAS matmul path returns the identical ranking (and sims to
    float tolerance) as the native higher-order-function path."""
    nat = similarity.cosine_topk(emb, queries_df, k=7).collect()
    arr = similarity.cosine_topk_arrow(emb, queries_df, k=7).collect()
    nat_m = {(r.query_id, r.rank): (r.vec_id, r.sim) for r in nat}
    arr_m = {(r.query_id, r.rank): (r.vec_id, r.sim) for r in arr}
    assert set(nat_m) == set(arr_m) and nat_m
    for key, (vid, sim) in nat_m.items():
        avid, asim = arr_m[key]
        assert avid == vid
        assert abs(asim - sim) < 1e-9


def test_lsh_topk_recall(spark, emb, queries_df):
    k = 5
    exact = similarity.cosine_topk(emb, queries_df, k=k).collect()
    approx = similarity.lsh_topk(emb, queries_df, k=k, n_planes=8).collect()
    ex = {}
    for r in exact:
        ex.setdefault(r.query_id, set()).add(r.vec_id)
    ap = {}
    for r in approx:
        ap.setdefault(r.query_id, set()).add(r.vec_id)
    # rank-1 (self) must always be found: identical vector → same bucket
    assert all(q in ap.get(q, set()) for q in ex)
    recalls = [len(ex[q] & ap.get(q, set())) / k for q in ex]
    assert sum(recalls) / len(recalls) >= 0.4, f"mean LSH recall {sum(recalls)/len(recalls)}"


def test_embedding_dedup_finds_planted_dups(spark, emb):
    dup = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding", "label"
    )
    both = emb.unionByName(dup)
    pairs = {
        (r.id_a, r.id_b): r.sim
        for r in similarity.embedding_dedup_pairs(both, threshold=0.99).collect()
    }
    planted = {
        (r.vec_id, r.vec_id + 10000) for r in emb.filter(F.col("vec_id") % 50 == 0).collect()
    }
    for p in planted:  # identical vectors share every bucket → recall 100%
        assert p in pairs and pairs[p] > 0.999999
    # no wildly-dissimilar false positives survive verification
    assert all(v >= 0.99 for v in pairs.values())


def test_embedding_dedup_recalls_perturbed_near_dups(spark, emb):
    """The multi-table Hamming-1-probed LSH must recall TRUE NEAR duplicates
    (sims ≈ 0.989-0.999, not exact copies) — the scale regime where the old
    single-table probe-less form silently lost ~11% of real near-dups.
    Ground truth = exact numpy all-pairs cosine at the threshold."""
    base = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    copies = (
        base.filter(F.col("vec_id") % 50 == 0)
        .select(
            "vec_id",
            "embedding",
            F.explode(F.array(*[F.lit(k) for k in range(1, 4)])).alias("k"),
        )
        .select(
            (F.col("vec_id") + F.lit(100000) * F.col("k")).alias("vec_id"),
            F.zip_with(
                "embedding",
                F.reverse("embedding"),
                lambda a, b: a + F.lit(0.05) * F.col("k") * b,
            ).alias("embedding"),
        )
    )
    corpus = base.unionByName(copies)
    got = {
        (r.id_a, r.id_b): r.sim
        for r in similarity.embedding_dedup_pairs(corpus, threshold=0.99).collect()
    }
    rows = corpus.collect()
    ids = np.array([r.vec_id for r in rows])
    M = np.array([r.embedding for r in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn @ Mn.T
    iu = np.triu_indices(len(ids), k=1)
    want = {
        (int(min(a, b)), int(max(a, b)))
        for a, b, s in zip(ids[iu[0]], ids[iu[1]], S[iu])
        if s >= 0.99
    }
    assert want, "fixture must plant near-dup pairs above the threshold"
    # at least one planted pair sits in the near (not exact) band
    assert any(s < 0.999 for s in got.values())
    assert set(got) == want  # 100% recall AND no sub-threshold survivors


def test_similarity_plans_native(spark, emb, queries_df):
    plan = (
        similarity.cosine_topk(emb, queries_df, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan  # query side broadcast


def test_kmeans_centroids_deterministic_and_complete(spark, sf_dir):
    from dlp_dataflow_deidentification_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = S.kmeans_centroids(emb, k=4, iters=2)
    b = S.kmeans_centroids(emb, k=4, iters=2)
    assert a == b  # deterministic seeds + deterministic updates
    assert len(a) == 4 and all(len(c) == 64 for c in a)


def test_ivf_topk_recall_and_native_plan(spark, sf_dir):
    """IVF must recover ≥90% of the exact top-10 on raw (unplanted random)
    embeddings with nprobe=3 of 8 cells, and plan without Python."""
    from pyspark.sql import functions as F

    from dlp_dataflow_deidentification_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    want = {(r.query_id, r.vec_id) for r in S.cosine_topk(emb, qs, k=10).collect()}

    def recall(npr):
        got = {
            (r.query_id, r.vec_id)
            for r in S.ivf_topk(emb, qs, k=10, n_cells=8, nprobe=npr).collect()
        }
        return len(got & want) / len(want)

    # raw uniform-random embeddings are the WORST case for ANN (true
    # neighbors sit at sim ~0.3 with no cluster structure); recall must
    # still be solid and monotone in nprobe. The planted-near-neighbor
    # driver query (ivf_topk vs the exact-ranking oracle) certifies
    # recall=1.0 in the regime ANN indexes actually serve.
    r3, r5 = recall(3), recall(5)
    assert r3 >= 0.55, r3  # observed 0.66-0.76 across SFs; floor 3/8=0.375
    assert r5 >= max(r3, 0.8), (r3, r5)
    plan = S.ivf_topk(emb, qs, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_cosine_topk_arrow_boundary_ties_keep_lowest_ids(spark):
    """25 identical corpus vectors force a mass sim tie at the k boundary:
    the k=10 result must be EXACTLY the 10-prefix of the full k=25 ranking
    (sim desc, vec_id asc). A bare argpartition keeps an arbitrary subset of
    the tied values, breaking this prefix property. (Expectations are framed
    against the operator's own full ranking because BLAS gives remainder
    rows position-dependent last-ulp sims — even identical input vectors.)"""
    v = [float(i + 1) for i in range(8)]
    corpus = spark.createDataFrame(
        [(i, v) for i in range(100, 125)], "vec_id long, embedding array<double>"
    ).coalesce(1)
    qs = spark.createDataFrame([(0, v)], "query_id long, embedding array<double>")
    full = similarity.cosine_topk_arrow(corpus, qs, k=25).collect()
    want = [r.vec_id for r in sorted(full, key=lambda r: r.rank)][:10]
    out = similarity.cosine_topk_arrow(corpus, qs, k=10).collect()
    got = [r.vec_id for r in sorted(out, key=lambda r: r.rank)]
    assert got == want
    # within an equal-sim group the ranking is by ascending vec_id
    by_sim = {}
    for r in full:
        by_sim.setdefault(r.sim, []).append((r.rank, r.vec_id))
    for rows in by_sim.values():
        ids_in_rank_order = [v for _, v in sorted(rows)]
        assert ids_in_rank_order == sorted(ids_in_rank_order)


def test_cosine_topk_arrow_zero_norm_query_defined(spark):
    """A zero-norm QUERY must score 0.0 against everything (same defined
    edge-case as zero-norm corpus vectors) — an unguarded 0/0 would make
    every sim for that query NaN with NaN-first ordering."""
    from dlp_dataflow_deidentification_spark.operators import similarity

    corpus = spark.createDataFrame(
        [(i, [float(i + 1), 1.0]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    qs = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0])], "query_id long, embedding array<double>"
    )
    rows = similarity.cosine_topk_arrow(corpus, qs, k=3).collect()
    z = [r for r in rows if r.query_id == 0]
    assert len(z) == 3
    assert all(r.sim == 0.0 for r in z)
    # all-tied sims → vec_id ascending tie-break, like the native path
    assert [r.vec_id for r in sorted(z, key=lambda r: r.rank)] == [0, 1, 2]
    assert all(r.sim > 0 for r in rows if r.query_id == 1)


def test_ivf_indexed_partition_pruning(spark, sf_dir, tmp_path):
    """The materialized IVF index (corpus written partitionBy(cell)) must
    serve probe queries through PARTITION PRUNING — the plan's scan carries
    a PartitionFilters entry on cell and reads fewer partitions than
    n_cells — with results identical to the recompute-everything ivf_topk
    on the same quantizer."""
    from pyspark.sql import functions as F

    from dlp_dataflow_deidentification_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") % 250 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    idx = str(tmp_path / "ivf_index")
    S.ivf_index_write(emb, idx, n_cells=8, iters=2)

    out = S.ivf_topk_indexed(spark, idx, qs, k=10, nprobe=2)
    got = {(r.query_id, r.vec_id, r.rank) for r in out.collect()}
    want = {
        (r.query_id, r.vec_id, r.rank)
        for r in S.ivf_topk(emb, qs, k=10, n_cells=8, nprobe=2).collect()
    }
    assert got == want and len(got) > 0

    plan = out._jdf.queryExecution().executedPlan().toString()
    m = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert m, plan  # the scan must be partition-filtered, not full
    assert "cell" in m[0] and "in" in m[0].lower(), m[0]
    # the probed-cell superset is a strict subset of the index partitions
    probed = {
        r.cell
        for r in S._probed_queries(
            qs, S._read_centroids(spark, idx), 2, "query_id", "embedding"
        ).select("cell").distinct().collect()
    }
    assert len(probed) < 8


def test_dim_mismatch_raises_instead_of_degenerating(spark, emb, queries_df):
    """zip_with pads the shorter array with nulls, so a wrong dim would
    null-poison every dot product and silently produce empty/degenerate
    results (all vectors in bucket 0, empty cell joins) — the entry points
    peek one row and raise instead."""
    with pytest.raises(ValueError, match="dim=32"):
        similarity.lsh_topk(emb, queries_df, dim=32)
    with pytest.raises(ValueError, match="dim=32"):
        similarity.embedding_dedup_pairs(emb, dim=32)
    with pytest.raises(ValueError, match="dim=128"):
        similarity.kmeans_centroids(emb, k=4, dim=128)
    with pytest.raises(ValueError, match="dim=16"):
        similarity.ivf_topk(emb, queries_df, n_cells=4, dim=16)
    # width mismatch between corpus and queries (brute-force paths)
    wide_q = queries_df.select(
        "query_id", F.concat(F.col("embedding"), F.col("embedding")).alias("embedding")
    )
    with pytest.raises(ValueError, match="wide"):
        similarity.cosine_topk(emb, wide_q)
    with pytest.raises(ValueError, match="wide"):
        similarity.cosine_topk_arrow(emb, wide_q)


def test_cosine_topk_arrow_tolerates_null_and_ragged_corpus_rows(spark):
    """A null (or wrong-width) corpus embedding must not crash the Arrow
    path (np.stack raises on None/ragged) — it is dropped from scoring,
    matching the native path where its null sim sorts last."""
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, None),
            (3, [0.9, 0.1]),
            (4, [1.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    qs = spark.createDataFrame([(10, [1.0, 0.0])], "query_id long, embedding array<double>")
    got = similarity.cosine_topk_arrow(corpus, qs, k=3).collect()
    assert [r.vec_id for r in got] == [1, 3]
