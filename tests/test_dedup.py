"""Dedup operator tests with planted duplicates (ground truth known)."""
import pytest
from pyspark.sql import functions as F

from dlp_dataflow_deidentification_spark.operators import dedup


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    """documents ∪ mutated copies: doc_id+100000 = near-dup of doc_id (one
    appended token); doc_id+200000 = exact dup. Deterministic ground truth."""
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    near = base.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" trailing marker token")).alias("text"),
    )
    exact = base.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    return base.unionByName(near).unionByName(exact).cache()


def test_exact_dedup(spark, docs):
    # ground truth from the data itself: larger SFs contain a handful of
    # naturally-duplicated base texts in addition to the planted +200000 dups
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    n_groups = docs.select(norm.alias("n")).distinct().count()
    n_multi = (
        docs.select(norm.alias("n")).groupBy("n").count().filter("count > 1").count()
    )
    out = dedup.exact_dedup(docs)
    assert out.count() == n_groups  # one winner per distinct normalized text
    dup_rows = out.filter("n_copies > 1")
    assert dup_rows.count() == n_multi
    assert dup_rows.filter("doc_id >= 100000").count() == 0  # winner is always a base id
    # every planted exact dup (+200000) collapsed onto its base
    assert out.filter("doc_id >= 200000").count() == 0


def test_minhash_lsh_finds_planted_near_dups(spark, docs):
    pairs = dedup.minhash_lsh_pairs(
        docs, num_hashes=64, bands=16, shingle_n=5, threshold=0.5
    ).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    planted = {
        (r.doc_id, r.doc_id + 100000)
        for r in docs.filter("doc_id < 100000").filter(F.col("doc_id") % 5 == 0).collect()
    }
    exact_planted = {
        (r.doc_id, r.doc_id + 200000)
        for r in docs.filter("doc_id < 100000").filter(F.col("doc_id") % 7 == 0).collect()
    }
    # exact dups: jaccard 1.0 → recall must be 100%
    assert exact_planted <= got
    # near dups (one token appended, high jaccard): ≥95% recall via 16 bands
    recall = len(planted & got) / len(planted)
    assert recall >= 0.95, f"minhash recall {recall}"
    # estimator sanity on exact pairs
    est = {(r.id_a, r.id_b): r.est_jaccard for r in pairs}
    assert all(est[p] == 1.0 for p in exact_planted)


def test_ngram_jaccard_exact_pairs(spark, docs):
    sample = docs.filter("doc_id % 25 = 0 or doc_id >= 100000")  # keep the join small
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(sample, threshold=0.5).collect()
    }
    planted_exact = {
        (r.doc_id, r.doc_id + 200000)
        for r in sample.filter("doc_id < 100000").filter(F.col("doc_id") % 7 == 0).collect()
        if (r.doc_id + 200000) in [x.doc_id for x in sample.filter("doc_id >= 200000").collect()]
    }
    for p in planted_exact:
        assert pairs.get(p) == 1.0
    # jaccard is symmetric-bounded
    assert all(0.5 <= v <= 1.0 for v in pairs.values())


def test_simhash_pairs_find_exact_dups(spark, docs):
    sample = docs.filter("(doc_id < 100000 AND doc_id % 7 = 0) OR doc_id >= 200000")
    pairs = dedup.simhash_pairs(sample, max_hamming=3).collect()
    got = {(r.id_a, r.id_b): r.hamming for r in pairs}
    planted = {
        (r.doc_id, r.doc_id + 200000)
        for r in sample.filter("doc_id < 100000").collect()
        if r.doc_id % 7 == 0
    }
    found = {p for p in planted if p in got}
    assert len(found) == len(planted)  # identical text → hamming 0
    assert all(got[p] == 0 for p in found)


def test_simhash_is_deterministic(spark, docs):
    a = docs.limit(50).select("doc_id", dedup.simhash64(F.col("text")).alias("h")).collect()
    b = docs.limit(50).select("doc_id", dedup.simhash64(F.col("text")).alias("h")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_vectorized_signatures_equal_expression_form(spark, docs):
    """The Arrow/numpy minhash-signature kernel must be bit-identical to the
    pure-expression explode+aggregate form (same modular arithmetic on the
    same hashed shingles), including empty shingle arrays."""
    sh = dedup.shingle_df(docs.limit(40)).persist()
    try:
        fast = {
            r["id"]: list(r["sig"])
            for r in dedup._signatures_from_hashed_arrays(sh, 16).collect()
        }
        ref = {
            r["id"]: list(r["sig"])
            for r in dedup._signatures_from_shingles(sh, 16).collect()
        }
        assert fast == ref
        empty = spark.createDataFrame(
            [(1, [])], "id long, sh array<long>"
        )
        rows = dedup._signatures_from_hashed_arrays(empty, 4).collect()
        assert rows[0]["sig"] == [None, None, None, None]
    finally:
        sh.unpersist()


def test_dedup_plans_have_no_python(spark, docs):
    for df in [
        dedup.exact_dedup(docs),
        dedup.minhash_lsh_pairs(docs.limit(10)),
        dedup.simhash_pairs(docs.limit(10)),
    ]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan, plan[:2000]


def test_exact_dedup_shuffles_digest_not_text(spark, docs):
    """The hash-aggregate's shuffle key must be the fixed-width md5 digest
    (computed map-side), never the normalized full text — at 100 TB a text
    grouping key makes shuffle volume ~= corpus size."""
    plan = dedup.exact_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    assert "md5" in plan
    assert "__digest" in plan
    assert "__norm" not in plan  # full-text key eliminated (round-1 finding)


def test_simhash_block_combination_recall_edge():
    """Pigeonhole edge for the combination scheme: a pair at EXACTLY
    max_hamming with its differing bits in distinct blocks agrees on
    exactly (n_blocks - d) blocks — one combination key — and must still be
    found; a pair beyond the radius must not. Runs the candidate machinery
    on synthetic fingerprints via the public pair API with doc texts chosen
    to produce controlled fingerprints is brittle, so this drives the
    layout math directly instead."""
    from dlp_dataflow_deidentification_spark.operators.dedup import _block_layout

    # layouts cover n_bits exactly, widths within 1 of each other
    for n_bits, n_blocks in [(60, 6), (64, 6), (64, 4), (60, 4), (64, 7)]:
        layout = _block_layout(n_bits, n_blocks)
        assert sum(w for _, w in layout) == n_bits
        assert layout[0][0] == 0
        widths = [w for _, w in layout]
        assert max(widths) - min(widths) <= 1
        for (s1, w1), (s2, _w2) in zip(layout, layout[1:]):
            assert s2 == s1 + w1  # contiguous, no overlap


def test_simhash_pairs_equal_under_block_schemes(spark):
    """The minimal d+1-chunk split (n_blocks=4) and the default combination
    scheme (n_blocks=6, 20 keys) are both recall-lossless, so the PAIR SET
    must be identical — only the candidate volume differs."""
    from dlp_dataflow_deidentification_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta token{i % 7} "
             f"word{i % 3} extra{i % 11} tail") for i in range(120)]
        + [(1000 + i, f"alpha beta gamma delta epsilon zeta token{i % 7} "
                      f"word{i % 3} extra{i % 11} tails") for i in range(40)],
        "doc_id long, text string",
    )
    a = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_pairs(docs, max_hamming=3, n_blocks=4).collect()
    }
    b = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_pairs(docs, max_hamming=3).collect()
    }
    assert a == b and len(a) > 0

    import pytest

    with pytest.raises(ValueError, match="n_blocks"):
        dedup.simhash_pairs(docs, max_hamming=3, n_blocks=3)


def test_simhash_pairs_match_brute_force_hamming_truth(spark):
    """Ground-truth recall: the candidate machinery (whatever the key
    scheme) must reproduce the BRUTE-FORCE all-pairs hamming<=d set computed
    driver-side from the collected fingerprints — catches common-mode
    layout/key bugs that scheme-vs-scheme equality cannot."""
    from dlp_dataflow_deidentification_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, f"w{i % 5} alpha beta gamma delta tok{i % 9} fill{i % 4} zeta")
         for i in range(150)],
        "doc_id long, text string",
    )
    fps = {r.id: r.sh for r in dedup.simhash_df(docs).collect()}
    ids = sorted(fps)
    truth = {
        (a, b, bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1") <= 3
    }
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_pairs(docs, max_hamming=3).collect()
    }
    assert got == truth and len(truth) > 0


def test_simhash_pairs_full_fingerprint_block(spark):
    """max_hamming=0 with n_blocks=1 buckets on the FULL 64-bit fingerprint
    (the exact-dup-by-fingerprint config): the all-ones mask must not
    overflow the long literal, and output = pairs with identical simhash."""
    from dlp_dataflow_deidentification_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "other text here")],
        "doc_id long, text string",
    )
    got = {(r.id_a, r.id_b) for r in dedup.simhash_pairs(
        docs, max_hamming=0, n_blocks=1).collect()}
    assert got == {(1, 2)}


def test_lsh_bands_must_divide_num_hashes(spark, docs):
    """bands > num_hashes would make rows-per-band 0: every band key becomes
    the hash of an empty slice, the hub-bucket cap drops everything, and
    zero duplicates are silently reported — validated loudly instead."""
    with pytest.raises(ValueError, match="bands=100"):
        dedup.minhash_dedup_pairs(docs, num_hashes=64, bands=100)
    with pytest.raises(ValueError, match="bands=48"):
        dedup.minhash_dedup_pairs(docs, num_hashes=64, bands=48)


def test_adhoc_shingles_match_shingle_df_on_padded_text(spark):
    """shingles() (ad-hoc column form) must agree with shingle_df on texts
    with leading/trailing whitespace: phantom empty split tokens previously
    corrupted gram text and defeated the short-doc gate."""
    df = spark.createDataFrame(
        [(1, "  alpha beta gamma delta "), (2, " single "), (3, "a b")],
        "doc_id long, text string",
    )
    adhoc = {
        r.doc_id: sorted(r.sh)
        for r in df.select("doc_id", dedup.shingles(F.col("text"), n=2).alias("sh")).collect()
    }
    viadf = {
        r.id: sorted(r.sh)
        for r in dedup.shingle_df(df, shingle_n=2, hashed=False).collect()
    }
    assert adhoc[1] == viadf[1] and adhoc[3] == viadf[3]
    # 1-word doc: no 2-grams from either form
    assert adhoc[2] == [] and 2 not in viadf


def test_exact_dedup_ignores_edge_whitespace(spark):
    """Texts differing only by leading/trailing whitespace (e.g. a trailing
    newline) dedup together, like interior-whitespace variants always did."""
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world\n"), (3, "  hello   world")],
        "doc_id long, text string",
    )
    got = dedup.exact_dedup(df).collect()
    assert len(got) == 1 and got[0].doc_id == 1 and got[0].n_copies == 3


def test_connected_components_labels_and_sizes(spark):
    # components: {1,2,3} (1-3, 2-3: node 2 is smaller in NO pair — pairwise
    # loser-dropping would wrongly keep it), path {10..13}, pair {20,21}
    pairs = spark.createDataFrame(
        [(1, 3), (2, 3), (10, 11), (11, 12), (12, 13), (20, 21)],
        "id_a long, id_b long",
    )
    out = {
        r["doc_id"]: (r["cluster_rep"], r["cluster_size"])
        for r in dedup.dedup_clusters(pairs).collect()
    }
    assert out == {
        1: (1, 3), 2: (1, 3), 3: (1, 3),
        10: (10, 4), 11: (10, 4), 12: (10, 4), 13: (10, 4),
        20: (20, 2), 21: (20, 2),
    }


def test_connected_components_long_path_converges(spark):
    # a 201-node path needs multiple large/small-star rounds (worst-case
    # diameter shape for label propagation); must land in one component
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "id_a long, id_b long"
    )
    comp = dedup.connected_components(pairs)
    reps = comp.select("cluster_rep").distinct().collect()
    assert [r["cluster_rep"] for r in reps] == [0]
    assert comp.count() == 201


def test_connected_components_empty_and_duplicate_edges(spark):
    empty = spark.createDataFrame([], "id_a long, id_b long")
    out = dedup.dedup_clusters(empty)
    assert out.count() == 0
    assert out.columns == ["doc_id", "cluster_rep", "cluster_size"]
    # duplicate + reversed edges collapse to the same component
    pairs = spark.createDataFrame(
        [(5, 6), (6, 5), (5, 6)], "id_a long, id_b long"
    )
    rows = sorted(
        tuple(r) for r in dedup.dedup_clusters(pairs).collect()
    )
    assert rows == [(5, 5, 2), (6, 5, 2)]


def test_dedup_clusters_on_planted_corpus(spark, docs):
    """Planted structure: base b (b%5==0 and b%7==0) + near-dup b+100000 +
    exact dup b+200000 must form ONE cluster with rep b."""
    pairs = dedup.minhash_dedup_pairs(docs, num_hashes=96, bands=48, threshold=0.5)
    clusters = dedup.dedup_clusters(pairs)
    both = (
        docs.filter((F.col("doc_id") % 35 == 0) & (F.col("doc_id") < 100000))
        .select("doc_id")
        .collect()
    )
    lookup = {
        r["doc_id"]: r["cluster_rep"] for r in clusters.collect()
    }
    for row in both:
        b = row["doc_id"]
        # all three planted variants present and share the base rep
        assert lookup.get(b) == b
        assert lookup.get(b + 100000) == b
        assert lookup.get(b + 200000) == b
    # survivor selection: exactly one doc per cluster has doc_id == rep
    per = (
        clusters.groupBy("cluster_rep")
        .agg(
            F.sum(F.when(F.col("doc_id") == F.col("cluster_rep"), 1).otherwise(0)).alias("n_reps"),
            F.first("cluster_size").alias("sz"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    for r in per:
        assert r["n_reps"] == 1 and r["sz"] == r["n"]
