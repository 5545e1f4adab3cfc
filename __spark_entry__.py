"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises an engine operator from SURVEY.md §2 over
the driver's parquet tables; ``oracle_sql()`` carries the DuckDB-equivalent
SQL. The transcript input (BASELINE.json input_hint) is derived from the
``events`` table via a shared common-dialect SQL recipe so Spark and the
DuckDB oracle compute identical input rows (see
dlp_dataflow_deidentification_spark/sources/transcripts.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import dlp_dataflow_deidentification_spark as dds
from dlp_dataflow_deidentification_spark.operators import sessionize as sess
from dlp_dataflow_deidentification_spark.sources.transcripts import (
    TRANSCRIPTS_FROM_EVENTS_SQL,
)

HERE = os.path.dirname(os.path.abspath(__file__))
KEY = "0123456789abcdef"

# ---------------------------------------------------------------------------
# shared input derivations (common Spark-SQL/DuckDB dialect)
# ---------------------------------------------------------------------------

CARDS_SQL = """
SELECT
  c_custkey AS id,
  c_name AS holder_name,
  LPAD(CAST(c_custkey % 10000 AS STRING), 4, '0') AS card_pin,
  LPAD(CAST(c_custkey % 900 + 100 AS STRING), 3, '0') || '-'
    || LPAD(CAST(c_custkey % 89 + 10 AS STRING), 2, '0') || '-'
    || LPAD(CAST(c_custkey % 9000 + 1000 AS STRING), 4, '0') AS ssn,
  CAST(18 + (c_custkey % 82) AS INT) AS age,
  CASE WHEN c_custkey % 5 = 0 THEN 'CIO'
       WHEN c_custkey % 5 = 1 THEN 'CEO of Acme'
       WHEN c_custkey % 5 = 2 THEN 'Software Engineer II'
       WHEN c_custkey % 5 = 3 THEN 'Product Manager'
       ELSE 'Janitor' END AS job_title,
  'reach ' || c_name || ' at client' || CAST(c_custkey AS STRING)
    || '@corp.example.org or 650-555-' || LPAD(CAST(c_custkey % 10000 AS STRING), 4, '0')
    || CASE WHEN c_custkey % 3 = 0 THEN ' iban NO36 7396 1123 641 noted' ELSE '' END
    || CASE WHEN c_custkey % 4 = 0
            THEN ' uid name:' || LPAD(CAST(c_custkey AS STRING), 16, '0')
            ELSE '' END AS notes,
  '4111 1111 1111 ' || LPAD(CAST(c_custkey % 10000 AS STRING), 4, '0') AS card_number
FROM customer
"""

TRANSCRIPT_DETECTORS = [
    "EMAIL_ADDRESS",
    "IBAN_CODE",
    "CREDIT_CARD_NUMBER",
    "US_SOCIAL_SECURITY_NUMBER",
    "PHONE_NUMBER",
    "ONLINE_USER_ID",
]
NOTES_DETECTORS = ["EMAIL_ADDRESS", "IBAN_CODE", "PHONE_NUMBER", "ONLINE_USER_ID"]

# documents ∪ planted near-dups (+100000, one appended token) ∪ exact dups
# (+200000) — deterministic dedup corpus shared by engine and oracle
DOCS_SQL = """
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + 100000 AS doc_id, text || ' trailing marker token' AS text
FROM documents WHERE doc_id % 5 = 0
UNION ALL
SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
"""


def _spread(spark: SparkSession, df: DataFrame, key: str) -> DataFrame:
    """Fan a single-file input out across the full core count (guide §2.5
    "input skew" / §6): the driver's test tables are ONE parquet file with
    one row group each, so every scan+map stage otherwise runs in a single
    task regardless of cluster size (measured: cosine_topk 42 s wall at 44
    CPU-s — one core busy). One deterministic hash exchange on the table's
    unique key (explicit partition count, so AQE cannot coalesce it back to
    one partition; hash-by-unique-key avoids keyless repartition's
    sort-before-repartition pass) makes everything downstream parallel. At
    100 TB inputs arrive as many splittable files and this exchange is
    dropped at the source layout level; partition count follows
    defaultParallelism, not a constant."""
    return df.repartition(spark.sparkContext.defaultParallelism, F.col(key))


# the transcript view's conv_id derivation (the inner SELECT of
# TRANSCRIPTS_FROM_EVENTS_SQL — that string is FROZEN because the oracle CTEs
# embed it, so the expression is duplicated here for the repartition KEY
# only; a drift would cost plan efficiency, never correctness, since the
# partitioning key does not affect results)
_CONV_KEY_SQL = (
    "CASE WHEN user_id % 13 = 0 THEN 'conv-hot'"
    " ELSE 'conv-' || LPAD(CAST(user_id % 997 AS STRING), 4, '0') END"
)


def _transcripts(spark: SparkSession, sf_dir: str, spread: "str | bool" = "rows") -> DataFrame:
    """Input fan-out policy for the single-row-group events file, decided
    PER QUERY by A/B measurement (all three modes are partitioning-only —
    results are identical by construction):

    - ``"rows"`` (default): hash-repartition on event_id right after the
      read. For queries whose plan prunes the turn_idx window (otherwise
      fully serial) and for the UDF/fold-heavy ones, where the window's
      ENSURE_REQUIREMENTS exchange is AQE-coalesced to ~4 partitions
      (64 MB advisory) and would cap the expensive stage at ~4 cores
      (A/B: text_tokenize 5.0 s unspread vs 2.0 s spread).
    - ``"conv"``: repartition on the conv_id DERIVATION expression —
      Catalyst's alias propagation recognises it as satisfying the
      ROW_NUMBER window's required distribution, so the window reuses
      this single pinned-width exchange and no coalescible
      ENSURE_REQUIREMENTS exchange is planned at all (inspect_limits A/B:
      2.5 s vs 3.1 s unspread vs 4.8 s with the extra rows exchange).
      For window-bearing queries with light post-window work.
    - ``False``: no fan-out (never measured best at sf1.0, kept for
      completeness/experiments)."""
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if spread == "conv":
        df = df.repartition(
            spark.sparkContext.defaultParallelism, F.expr(_CONV_KEY_SQL)
        )
    elif spread:
        df = _spread(spark, df, "event_id")
    df.createOrReplaceTempView("events")
    return spark.sql(TRANSCRIPTS_FROM_EVENTS_SQL)


def _cards(spark: SparkSession, sf_dir: str) -> DataFrame:
    _spread(
        spark, spark.read.parquet(f"{sf_dir}/customer.parquet"), "c_custkey"
    ).createOrReplaceTempView("customer")
    return spark.sql(CARDS_SQL)


def _duck_regex_chain(expr: str, detector_names: list[str]) -> str:
    from dlp_dataflow_deidentification_spark.functions.infotypes import resolve

    for name in detector_names:
        it = resolve(name)
        pat = it.pattern.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat}', '[{it.name}]', 'g')"
    return expr


def _transcripts_cte() -> str:
    return f"WITH transcripts AS ({TRANSCRIPTS_FROM_EVENTS_SQL})"


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_deid_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    tdf = _transcripts(spark, sf_dir, spread="conv")
    template = dds.DeidTemplate.from_file(
        os.path.join(HERE, "configs/deid_transcripts.json"), crypto_key=KEY
    )
    return dds.deidentify(tdf, template).select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        sess.epoch_seconds(F.col("ts")).alias("ts_epoch"),
    )


def q_inspect_findings(spark: SparkSession, sf_dir: str) -> DataFrame:
    tdf = _transcripts(spark, sf_dir, spread="conv")
    return dds.inspect(
        tdf, TRANSCRIPT_DETECTORS, ["text"], id_columns=["conv_id", "turn_idx"]
    ).select("conv_id", "turn_idx", "field_id", "info_type_name", "likelihood", "quote")


def q_deid_cards(spark: SparkSession, sf_dir: str) -> DataFrame:
    cards = _cards(spark, sf_dir)
    # hash_mode="sha256" EXPLICITLY: the compiler's default is now strict
    # HMAC-SHA-256 (the reference's construction, pytest-pinned bit-parity),
    # but this DuckDB oracle can only express the keyed-prefix form — its
    # sha256() is VARCHAR-only, so HMAC's raw-byte inner digest cannot flow
    # through the oracle SQL.
    template = dds.DeidTemplate.from_file(
        os.path.join(HERE, "configs/deid_cards.json"), crypto_key=KEY, hash_mode="sha256"
    )
    return dds.deidentify(cards, template).select(
        "id", "card_pin", "ssn", "age", "job_title", "notes"
    )


def q_crypto_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ECB fast-path tokenize→reidentify roundtrip (explicit opt-in cipher)."""
    cards = _cards(spark, sf_dir)
    enc = cards.withColumn(
        "holder_name", dds.transforms.crypto_deterministic(F.col("holder_name"), KEY)
    ).withColumn("card_number", dds.transforms.crypto_deterministic(F.col("card_number"), KEY))
    return dds.reidentify(enc, ["holder_name", "card_number"], KEY, mode="ecb").select(
        "id", "holder_name", "card_number"
    )


def q_crypto_roundtrip_siv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-default cipher roundtrip: AES-SIV (RFC 5297, the
    reference's cryptoDeterministicConfig cipher — deid-template.json:212-231)
    via the template compiler's default path, with the DLP surrogate
    envelope, reversed through reidentify's default mode. Arrow-batched
    pandas UDF both ways; oracle = identity."""
    from dlp_dataflow_deidentification_spark.functions import crypto
    from dlp_dataflow_deidentification_spark.plans.config import derive_siv_key

    cards = _cards(spark, sf_dir)
    k = derive_siv_key(KEY)
    enc = cards.withColumn(
        "holder_name", crypto.siv_tokenize(F.col("holder_name"), k, "NAME_TOKEN")
    ).withColumn("card_number", crypto.siv_tokenize(F.col("card_number"), k, "CC_TOKEN"))
    out = dds.reidentify(enc, ["holder_name"], KEY, surrogate_info_type="NAME_TOKEN")
    out = dds.reidentify(out, ["card_number"], KEY, surrogate_info_type="CC_TOKEN")
    return out.select("id", "holder_name", "card_number")


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sess.session_stats(_transcripts(spark, sf_dir, spread="conv"), gap_seconds=1800)


def q_agent_tool_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sess.agent_tool_correlate(_transcripts(spark, sf_dir, spread="conv"), max_lag_seconds=21600)


def q_tool_call_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the CHAINED stateful streaming plan (stream-stream join
    → tumbling-window aggregation in one query, streaming/joins.py::
    agent_tool_hourly_stats; stream≡batch equality pinned by
    tests/test_streaming.py::test_chained_join_then_window_stream_equals_batch)."""
    from dlp_dataflow_deidentification_spark.streaming import joins

    out = joins.agent_tool_hourly_stats(
        _transcripts(spark, sf_dir), max_lag_seconds=21600, window="1 hour"
    )
    return out.select(
        sess.epoch_seconds(F.col("window_start").cast("timestamp")).alias(
            "window_start_epoch"
        ),
        "tool_name",
        F.col("n_calls").cast("long").alias("n_calls"),
    )


def q_windowed_infotype_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 6: count hits via the stack/sum form (streaming/windows.py
    ``windowed_infotype_hits``, the same plan the sliding query always
    used) instead of inspect's explode-every-finding form: per (window,
    detector), COUNT(*) over exploded matches equals SUM(size(matches))
    exactly — rows with zero matches contribute nothing on both paths —
    while the per-row match structs are never materialized or exploded
    (measured 7.3 s → stack form ~1.5 s at sf1.0)."""
    from dlp_dataflow_deidentification_spark.streaming import windows

    tdf = _transcripts(spark, sf_dir)
    out = windows.windowed_infotype_hits(
        tdf, TRANSCRIPT_DETECTORS, window="1 hour", watermark="1 minute"
    )
    return out.select(
        sess.epoch_seconds(F.col("window_start").cast("timestamp")).alias(
            "window_start_epoch"
        ),
        "info_type_name",
        F.col("n_hits").cast("long").alias("n_hits"),
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread AFTER the union: the three DOCS_SQL branches scan as three
    # parallel tasks already, so one post-union exchange fans the corpus out
    # instead of three pre-union ones
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    return _spread(spark, spark.sql(DOCS_SQL), "doc_id")


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dlp_dataflow_deidentification_spark.operators import dedup

    return dedup.exact_dedup(_docs(spark, sf_dir))


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dlp_dataflow_deidentification_spark.operators import dedup

    docs = _docs(spark, sf_dir).filter("doc_id % 5 = 0 OR doc_id >= 100000")
    pairs = dedup.ngram_jaccard_pairs(docs, shingle_n=5, threshold=0.5, max_df=1000)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate generation + exact-Jaccard verification. The oracle is
    plain exact Jaccard over ALL pairs, so the driver's hash-match doubles as
    a 100%-recall proof for the LSH stage (bands=48, rows=2: per-pair miss
    probability (1-j^2)^48 ≈ 1e-6 at j=0.5, ~0 above — holds across every
    test SF; 96 hashes instead of 128 cuts the signature projection cost
    25% with no observable recall loss)."""
    from dlp_dataflow_deidentification_spark.operators import dedup

    pairs = dedup.minhash_dedup_pairs(
        _docs(spark, sf_dir), num_hashes=96, bands=48, shingle_n=5, threshold=0.5
    )
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one-per-CLUSTER dedup: connected components over the
    minhash_dedup pair graph (alternating large-star/small-star — no
    transitive closure ever materialized). The oracle closes the SAME exact
    all-pairs-Jaccard pair set transitively (recursive CTE — safe there
    because oracle clusters are tiny), so a hash-match certifies both LSH
    recall AND the component labeling."""
    from dlp_dataflow_deidentification_spark.operators import dedup

    pairs = dedup.minhash_dedup_pairs(
        _docs(spark, sf_dir), num_hashes=96, bands=48, shingle_n=5, threshold=0.5
    )
    return dedup.dedup_clusters(pairs)


def q_simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable simhash (60-bit md5-derived token hashes) so DuckDB computes
    the identical fingerprints — full value oracle for the pair set."""
    from dlp_dataflow_deidentification_spark.operators import dedup

    docs = _docs(spark, sf_dir).filter("doc_id % 5 = 0 OR doc_id >= 100000")
    pairs = dedup.simhash_pairs(docs, max_hamming=3, portable=True)
    return pairs.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k. Round 6: served through the Arrow/BLAS
    kernel (guide §4.2 — one numpy matmul per corpus batch) instead of the
    per-pair higher-order-function cosine, which interpreted 2·dim lambda
    steps for each of the |corpus|·|Q| pairs (42 s at sf1.0, one core; the
    HOF operator remains ``similarity.cosine_topk`` for per-pair verify
    stages). Same oracle as always — both kernels have been driver-proven
    value-identical against it every round — and re-verified green at
    sf0.001/0.01/0.1 after the swap."""
    from dlp_dataflow_deidentification_spark.operators import similarity

    emb = _spread(spark, spark.read.parquet(f"{sf_dir}/embeddings.parquet"), "vec_id")
    qs = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.cosine_topk_arrow(emb, qs, k=10)
    return out.select("query_id", "vec_id", "rank", F.round("sim", 6).alias("sim"))


def q_cosine_topk_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow/BLAS form of the exact brute-force baseline: one numpy matmul
    per Arrow batch + per-batch top-k inside mapInPandas (only k·|Q| rows
    per batch reach the global window). Same oracle as cosine_topk — the
    two implementations are driver-proven value-identical."""
    from dlp_dataflow_deidentification_spark.operators import similarity

    emb = _spread(spark, spark.read.parquet(f"{sf_dir}/embeddings.parquet"), "vec_id")
    qs = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.cosine_topk_arrow(emb, qs, k=10)
    return out.select("query_id", "vec_id", "rank", F.round("sim", 6).alias("sim"))


def _ann_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings ∪ 9 planted near-neighbors per query vector: copy k of
    query v is v + c_k·reverse(v) with c_k = 0.02k (sims ≈ 0.9996…0.984,
    all far above the ~0.4 max random-pair sim). Deterministic double-
    precision arithmetic reproduced bit-identically in the DuckDB oracle."""
    emb = _spread(
        spark, spark.read.parquet(f"{sf_dir}/embeddings.parquet"), "vec_id"
    ).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    qs = emb.filter(F.col("vec_id") % 100 == 0)
    # one explode branch instead of 9 unions; c = 0.02*k as a double column
    # is bit-identical to python 0.02*k (same IEEE multiply), which is what
    # the oracle injects via repr()
    copies = qs.select(
        "vec_id",
        "embedding",
        F.explode(F.array(*[F.lit(k) for k in range(1, 10)])).alias("k"),
    ).select(
        (F.col("vec_id") + F.lit(1000000) * F.col("k")).alias("vec_id"),
        F.zip_with(
            "embedding",
            F.reverse("embedding"),
            lambda a, b: a + F.lit(0.02) * F.col("k") * b,
        ).alias("embedding"),
    )
    return emb.unionByName(copies)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN over a planted near-neighbor workload: the true top-10 of each
    query are its 9 perturbed copies + itself (sim ≥ 0.98) — the regime ANN
    indexes serve. The oracle is the EXACT cosine ranking, so the driver's
    hash-match certifies recall@10 = 1.0 for the multi-table LSH."""
    from dlp_dataflow_deidentification_spark.operators import similarity

    corpus = _ann_corpus(spark, sf_dir)
    qs = corpus.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 1000000)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.lsh_topk(corpus, qs, k=10, n_planes=8, n_tables=4)
    return out.select("query_id", "vec_id", "rank", F.round("sim", 6).alias("sim"))


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN (coarse k-means quantizer trained in-engine on a 25%
    hash-sample — standard bounded IVF training; only the final cell
    assignment scans the full corpus) over the planted near-neighbor corpus.
    Oracle = the exact cosine ranking: hash-match certifies recall@10 = 1.0
    for the sample-trained IVF index."""
    from dlp_dataflow_deidentification_spark.operators import similarity

    corpus = _ann_corpus(spark, sf_dir)
    qs = corpus.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 1000000)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.ivf_topk(
        corpus, qs, k=10, n_cells=8, nprobe=3, iters=2, train_fraction=0.25
    )
    return out.select("query_id", "vec_id", "rank", F.round("sim", 6).alias("sim"))


def q_ivf_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF over a MATERIALIZED index: the corpus is written ONCE partitioned
    by cell id (the inverted lists as physical parquet partitions +
    _centroids.json header — operators/similarity.py::ivf_index_write), and
    probes are served through PARTITION PRUNING (a literal cell filter in
    the scan; skipped cells' files never open). Same quantizer/nprobe as
    ivf_topk, same EXACT-ranking oracle — hash-match certifies that the
    pruned-scan path also has recall@10 = 1.0."""
    import atexit
    import shutil
    import tempfile

    from dlp_dataflow_deidentification_spark.operators import similarity

    # persist: the index build evaluates the corpus five times (seed collect,
    # two Lloyd rounds, cell-assignment write, query projection) — cache the
    # union+explode once instead of recomputing it per pass
    corpus = _ann_corpus(spark, sf_dir).persist()
    qs = corpus.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 1000000)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # per-process path: concurrent driver/bench runs must not race on one
    # shared index directory (overwrite-while-scanning). Removed at process
    # exit (the returned DataFrame scans it LAZILY, so rmtree here would
    # pull the index out from under the caller's later collect); repeated
    # invocations in one process reuse/overwrite the same path.
    idx = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_ivf_index_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    atexit.register(shutil.rmtree, idx, ignore_errors=True)
    similarity.ivf_index_write(
        corpus, idx, n_cells=8, iters=2, train_fraction=0.25
    )
    # build done — the probe reads the MATERIALIZED index; the executor
    # cache must not outlive the query (the probe's qs side recomputes its
    # one cheap projection instead)
    corpus.unpersist()
    out = similarity.ivf_topk_indexed(spark, idx, qs, k=10, nprobe=3)
    return out.select("query_id", "vec_id", "rank", F.round("sim", 6).alias("sim"))


def q_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs over a PERTURBED-copy corpus: copy k of base v is
    v + 0.05k·reverse(v) (sims ≈ 0.9988 / 0.9950 / 0.989 — straddling the
    0.99 threshold). The oracle is exact all-pairs cosine, so the driver's
    hash-match certifies the probed multi-table LSH recalls true NEAR
    (not just exact) duplicates, and that the exact-cosine verify stage
    excludes the just-below-threshold pairs."""
    from dlp_dataflow_deidentification_spark.operators import similarity

    emb = _spread(
        spark, spark.read.parquet(f"{sf_dir}/embeddings.parquet"), "vec_id"
    ).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    # F.lit(0.05)*k as a double column is bit-identical to python 0.05*k
    # (same IEEE multiply), which the oracle injects via repr()
    copies = (
        emb.filter(F.col("vec_id") % 50 == 0)
        .select(
            "vec_id",
            "embedding",
            F.explode(F.array(*[F.lit(k) for k in range(1, 4)])).alias("k"),
        )
        .select(
            (F.col("vec_id") + F.lit(1000000) * F.col("k")).alias("vec_id"),
            F.zip_with(
                "embedding",
                F.reverse("embedding"),
                lambda a, b: a + F.lit(0.05) * F.col("k") * b,
            ).alias("embedding"),
        )
    )
    pairs = similarity.embedding_dedup_pairs(emb.unionByName(copies), threshold=0.99)
    return pairs.select("id_a", "id_b", F.round("sim", 6).alias("sim"))


def q_text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 6: metric components (token count, stopword hits, punct ratio,
    lang argmax) are materialized ONCE per row — the previous sibling-column
    composition recomputed them up to 3x each because every repeat sits in a
    CASE/least/greatest branch, which Spark's subexpression elimination
    skips. Same expressions over the same values → bit-identical output."""
    from dlp_dataflow_deidentification_spark.functions import text as T

    docs = _spread(spark, spark.read.parquet(f"{sf_dir}/documents.parquet"), "doc_id")
    m = F.col("__m")
    return docs.select(
        "doc_id", "text", T.metric_components(F.col("text")).alias("__m")
    ).select(
        "doc_id",
        m["toks"].cast("long").alias("n_tokens"),
        T.bpe_ish_token_count(F.col("text")).cast("long").alias("n_bpe_tokens"),
        F.round(m["punct"], 6).alias("punct_ratio"),
        T.quality_from(m).alias("quality"),
        T.lang_from(m).alias("lang_pred"),
        T.fingerprint(F.col("text")).alias("fingerprint"),
    )


def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dlp_dataflow_deidentification_spark.streaming import windows

    tdf = _transcripts(spark, sf_dir)
    out = windows.session_window_stats(tdf, gap="30 minutes", watermark="1 minute")
    return out.select(
        "conv_id",
        F.unix_micros(F.col("session_start").cast("timestamp")).alias("session_start_us"),
        "n_turns",
        F.col("n_agent").cast("long").alias("n_agent"),
        F.col("n_tool").cast("long").alias("n_tool"),
    )


def q_sliding_infotype_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window (2h window, 1h slide) per-window infoType-hit aggregate
    (north_rule sliding-window requirement, batch form of
    streaming/windows.py::windowed_infotype_hits with slide)."""
    from dlp_dataflow_deidentification_spark.streaming import windows

    tdf = _transcripts(spark, sf_dir)
    out = windows.windowed_infotype_hits(
        tdf, TRANSCRIPT_DETECTORS, window="2 hours", slide="1 hour", watermark="1 minute"
    )
    return out.select(
        sess.epoch_seconds(F.col("window_start").cast("timestamp")).alias(
            "window_start_epoch"
        ),
        "info_type_name",
        F.col("n_hits").cast("long").alias("n_hits"),
    )


def q_corpus_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation pass: quality/lang/token filter + exact dedup."""
    from dlp_dataflow_deidentification_spark.operators import corpus

    out = corpus.curate(
        _docs(spark, sf_dir),
        template=None,
        min_quality=0.3,
        min_tokens=8,
        languages=("en", "und"),
    )
    return out.select("doc_id", "quality", "lang_pred", "n_tokens")


def q_chatlog_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcripts → raw '[Agent]:/[Customer]:' chat-log lines → parsed back
    (ParseTextLogDoFn analogue, txt/ParseTextLogDoFn.java:41-107). The oracle
    is the expected turn set computed directly from the transcripts."""
    from dlp_dataflow_deidentification_spark.sources.chatlog import parse_chatlog

    tdf = _transcripts(spark, sf_dir).filter(F.col("role").isin("agent", "customer"))
    num_id = F.when(F.col("conv_id") == "conv-hot", F.lit("9999")).otherwise(
        F.substring("conv_id", 6, 10)
    )
    turn = F.struct("turn_idx", F.initcap("role").alias("r"), "text")
    lines = (
        tdf.groupBy(num_id.alias("cid"))
        .agg(F.array_sort(F.collect_list(turn)).alias("turns"))
        .select(
            F.concat(
                F.col("cid"),
                F.lit(" "),
                F.concat_ws(
                    " ",
                    F.transform(
                        "turns",
                        lambda t: F.concat(
                            F.lit("["), t["r"], F.lit("]: "), t["text"]
                        ),
                    ),
                ),
            ).alias("line")
        )
    )
    return parse_chatlog(lines).select("conv_id", "turn_idx", "role", "text")


# dictionary infoType over the transcript vocabulary; "expires soon" vs
# "expires" exercises the longest-phrase-first alternation rule
DICT_WORDS = ["purchase", "signup", "expires soon", "expires", "error"]


def q_inspect_dictionary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-detector inspect (DLP CustomInfoType.Dictionary, rendered
    to a word-boundary alternation — functions/infotypes.py::dictionary;
    reference plumbing beam/DLPInspectText.java:284-338). Oracle: the same
    rendered regex in DuckDB."""
    from dlp_dataflow_deidentification_spark.functions.infotypes import dictionary

    det = dictionary("TRANSACTION_TERM", DICT_WORDS, "POSSIBLE")
    tdf = _transcripts(spark, sf_dir, spread="conv")
    return dds.inspect(
        tdf, [det], ["text"], id_columns=["conv_id", "turn_idx"]
    ).select("conv_id", "turn_idx", "field_id", "info_type_name", "likelihood", "quote")


def q_inspect_limits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InspectConfig fidelity as a value-checked query: minLikelihood=LIKELY
    prunes the POSSIBLE dictionary detector at plan time, and
    maxFindingsPerItem=2 keeps only the first two findings per row in
    DOCUMENT POSITION order (start offset, detector order on ties — the DLP
    truncation rule; engine default findings_order="position"). The DuckDB
    oracle reproduces the rule with the offsets machinery + one row_number
    window (inspect-template.json:8-32,
    beam/DLPInspectText.java:269-270,306-309)."""
    from dlp_dataflow_deidentification_spark.functions.infotypes import dictionary

    dets = [dictionary("TRANSACTION_TERM", DICT_WORDS, "POSSIBLE")] + TRANSCRIPT_DETECTORS
    tdf = _transcripts(spark, sf_dir, spread="conv")
    return dds.inspect(
        tdf,
        dets,
        ["text"],
        id_columns=["conv_id", "turn_idx"],
        min_likelihood="LIKELY",
        max_findings_per_item=2,
    ).select("conv_id", "turn_idx", "field_id", "info_type_name", "likelihood", "quote")


def q_dlp_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the reference's stateful greedy byte-packer
    (beam/BatchRequestForDLP.java:44-106, test contract
    BatchRequestForDLPTest.java:59-121): per-conversation turns packed into
    ≤500-byte request batches in turn order. The DuckDB oracle reproduces
    the greedy rule with a recursive CTE, so every (key, batch_seq, n_rows,
    n_bytes) row is value-checked — upgrading the packer from pytest-only to
    driver-oracle coverage."""
    from dlp_dataflow_deidentification_spark.streaming import stateful

    tdf = _transcripts(spark, sf_dir, spread="conv")
    # n_buckets: super-key batching — pack_greedy still runs per key, but
    # one pandas dispatch per bucket instead of per conversation; output
    # identical to per-key mode (test_bucketed_batched_requests_equals_per_key)
    out = stateful.batched_requests(
        tdf,
        key_col="conv_id",
        payload_col="text",
        ts_col="ts",
        max_batch_bytes=500,
        order_col="turn_idx",
        n_buckets=64,
    )
    return out.select(
        "key",
        F.col("batch_seq").cast("long").alias("batch_seq"),
        F.col("n_rows").cast("long").alias("n_rows"),
        "n_bytes",
    )


def q_inspect_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Findings with codepoint offsets (Arrow pandas-UDF path). The DuckDB
    oracle derives match offsets from cumulative segment/match lengths of
    regexp_split + regexp_extract_all (see _inspect_offsets_oracle)."""
    tdf = _transcripts(spark, sf_dir)
    out = dds.inspect_offsets(
        tdf, TRANSCRIPT_DETECTORS, ["text"], id_columns=["conv_id", "turn_idx"]
    )
    return out.select(
        "conv_id",
        "turn_idx",
        "field_id",
        "info_type_name",
        "likelihood",
        "quote",
        F.col("location_start").cast("long").alias("location_start"),
        F.col("location_end").cast("long").alias("location_end"),
    )


def q_conv_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEID → stateful conversation assembly (batch form of the
    applyInPandasWithState session machine, streaming/stateful.py::
    conversation_assembler; stream≡batch pinned by
    test_conversation_assembler_stream_equals_batch_sessions): per-session
    turn counts, PII-marker turn counts ([INFO_TYPE] tokens minted by the
    deid stage), and first/last event-time ms. Oracle = the same gap split
    (close when gap >= 30 min) as a SQL window recursion over the
    deidentified text."""
    from dlp_dataflow_deidentification_spark.streaming import stateful

    tdf = _transcripts(spark, sf_dir)
    template = dds.DeidTemplate.from_file(
        os.path.join(HERE, "configs/deid_transcripts.json"), crypto_key=KEY
    )
    deid = dds.deidentify(tdf, template)
    # n_buckets: super-key batching — one vectorized pandas fold per bucket
    # instead of one dispatch per conversation; output identical to per-key
    # mode (tests/test_stateful.py::test_bucketed_assembler_equals_per_key_*)
    out = stateful.conversation_assembler(deid, gap_ms=1_800_000, n_buckets=64)
    return out.select(
        "conv_id",
        F.col("n_turns").cast("long").alias("n_turns"),
        F.col("n_pii_turns").cast("long").alias("n_pii_turns"),
        "first_ms",
        "last_ms",
    )


# DLP date-primitive template (reference date shapes: timePartConfig and
# dateShiftConfig with cryptoKey+context — same knobs as
# dlp-demo-deid-config.json's transformation list)
DATES_TEMPLATE = {
    "deidentifyConfig": {
        "recordTransformations": {
            "fieldTransformations": [
                {
                    "fields": [{"name": "order_year"}],
                    "primitiveTransformation": {"timePartConfig": {"partToExtract": "YEAR"}},
                },
                {
                    "fields": [{"name": "order_month"}],
                    "primitiveTransformation": {"timePartConfig": {"partToExtract": "MONTH"}},
                },
                {
                    "fields": [{"name": "shifted_ts"}],
                    "primitiveTransformation": {
                        "dateShiftConfig": {
                            "upperBoundDays": 100,
                            "lowerBoundDays": 0,
                            "context": {"name": "o_custkey"},
                        }
                    },
                },
            ]
        }
    }
}


def q_deid_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date primitives through the template compiler: timePartConfig
    generalization (YEAR / MONTH) plus dateShiftConfig — a deterministic
    forward-only per-customer shift (lowerBoundDays=0, upperBoundDays=100,
    context=o_custkey, keyed by cryptoKey) over orders.o_orderdate.
    ``date_shift_basis="md5"`` selects the portable PRF so the DuckDB oracle
    recomputes the exact shifted timestamps (full value oracle, not
    rows-only); the engine default stays xxhash64 (codegen'd, faster)."""
    orders = _spread(
        spark, spark.read.parquet(os.path.join(sf_dir, "orders.parquet")), "o_orderkey"
    )
    src = orders.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").alias("order_year"),
        F.col("o_orderdate").alias("order_month"),
        F.col("o_orderdate").alias("shifted_ts"),
    )
    template = dds.DeidTemplate.from_dict(
        DATES_TEMPLATE, crypto_key=KEY, date_shift_basis="md5"
    )
    out = dds.deidentify(src, template)
    return out.select(
        "o_orderkey",
        "order_year",
        "order_month",
        sess.epoch_seconds(F.col("shifted_ts")).alias("shifted_epoch"),
    )


# Format-preserving tokenization template (DLP cryptoReplaceFfxFpeConfig —
# NIST SP 800-38G FF1, vector-pinned in tests/test_transforms.py): the pin
# under a per-customer context tweak, the PAN digits under a surrogate
# envelope.
FPE_TEMPLATE = {
    "deidentifyConfig": {
        "recordTransformations": {
            "fieldTransformations": [
                {
                    "fields": [{"name": "card_pin"}],
                    "primitiveTransformation": {
                        "cryptoReplaceFfxFpeConfig": {
                            "commonAlphabet": "NUMERIC",
                            "context": {"name": "id"},
                        }
                    },
                },
                {
                    "fields": [{"name": "pan"}],
                    "primitiveTransformation": {
                        "cryptoReplaceFfxFpeConfig": {
                            "commonAlphabet": "NUMERIC",
                            "surrogateInfoType": {"name": "PAN_TOKEN"},
                        }
                    },
                },
            ]
        }
    }
}


def q_fpe_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format-preserving tokenization (NIST FF1 = DLP's
    cryptoReplaceFfxFpeConfig, the north-star's 'format-preserving
    tokenization' leg) through the template compiler, then reversed with
    reidentify(mode='ffx'). The ``*_fmt_ok`` columns are computed
    Spark-side from the ACTUAL intermediate tokens (regex over
    length+alphabet+envelope) while the oracle pins them literal TRUE — so
    the hash match certifies format preservation, not just invertibility.
    Arrow-batched pandas UDF both ways (~10 C-backed AES calls per cell,
    no per-byte Python)."""
    from dlp_dataflow_deidentification_spark.functions import fpe  # noqa: F401

    cards = _cards(spark, sf_dir)
    src = cards.select(
        "id",
        "card_pin",
        F.regexp_replace("card_number", "[^0-9]", "").alias("pan"),
    )
    template = dds.DeidTemplate.from_dict(FPE_TEMPLATE, crypto_key=KEY)
    tok = dds.deidentify(src, template)
    tok = tok.withColumn(
        "pin_fmt_ok", F.col("card_pin").rlike(r"^[0-9]{4}$")
    ).withColumn("pan_fmt_ok", F.col("pan").rlike(r"^PAN_TOKEN\(16\):[0-9]{16}$"))
    out = dds.reidentify(tok, ["card_pin"], KEY, mode="ffx", context="id")
    out = dds.reidentify(
        out, ["pan"], KEY, mode="ffx", surrogate_info_type="PAN_TOKEN"
    )
    return out.select("id", "card_pin", "pan", "pin_fmt_ok", "pan_fmt_ok")


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DLP risk analysis: k-anonymity histogram over customer with
    quasi-identifiers (c_nationkey, c_mktsegment) — per class SIZE, how
    many equivalence classes and records have it (KAnonymityHistogramBucket
    shape). Two hash aggregations, quasi-ids-only shuffle, O(distinct
    sizes) output."""
    from dlp_dataflow_deidentification_spark.operators import risk

    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    return risk.k_anonymity_histogram(cust, ["c_nationkey", "c_mktsegment"])


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DLP risk analysis: l-diversity per equivalence class — class size +
    exact distinct count of the sensitive value (account-balance band,
    floor(c_acctbal/1000)). A class with small l discloses the sensitive
    band regardless of its k."""
    from dlp_dataflow_deidentification_spark.operators import risk

    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    return risk.l_diversity(
        cust,
        ["c_nationkey", "c_mktsegment"],
        F.floor(F.col("c_acctbal") / F.lit(1000.0)),
    )


def q_numerical_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DLP risk analysis: NumericalStats (min / max / exact interpolated
    quantiles — F.percentile, the sort-based exact aggregate, not approx)
    over lineitem quantity per return flag. Integer-valued input keeps the
    interpolation bit-exact across engines, so the oracle value-checks the
    quantiles themselves."""
    from dlp_dataflow_deidentification_spark.operators import risk

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    src = li.select(
        "l_returnflag", F.col("l_quantity").cast("bigint").alias("qty")
    )
    return risk.numerical_stats(src, "qty", by=["l_returnflag"])


def q_pii_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-density corpus routing (the triage a training-data pipeline runs
    BEFORE deciding deid-vs-drop): per conversation, total findings across
    all six transcript detectors, whitespace token count, findings per 100
    tokens, and the quarantine flag (density > 2.0). One narrow native pass
    — size(regexp_extract_all) per detector, no explode, no Python — then
    one partial-aggregated groupBy(conv_id). Full DuckDB value oracle."""
    from dlp_dataflow_deidentification_spark.functions.infotypes import resolve

    tdf = _transcripts(spark, sf_dir)
    finds = None
    for name in TRANSCRIPT_DETECTORS:
        it = resolve(name)
        n = F.size(F.regexp_extract_all(F.col("text"), F.lit(it.pattern), F.lit(0)))
        finds = n if finds is None else finds + n
    per_turn = tdf.select(
        "conv_id",
        finds.cast("long").alias("n_findings"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
    )
    agg = per_turn.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum("n_findings").alias("n_findings"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    density = F.lit(100.0) * F.col("n_findings") / F.col("n_tokens")
    return agg.select(
        "conv_id",
        "n_turns",
        "n_findings",
        "n_tokens",
        density.alias("pii_per_100_tokens"),
        (density > F.lit(2.0)).alias("quarantine"),
    )


def q_deid_text_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-finding transforms INSIDE free text (DLP InfoTypeTransformations
    with computed primitives — functions/findings.py): every EMAIL_ADDRESS
    finding becomes its keyed sha256 surrogate in place, every PHONE_NUMBER
    finding is fully masked in place, surrounding text untouched.
    Arrow-batched pandas re.sub (a computed-per-match replacement has no
    native regexp_replace form); the DuckDB oracle rebuilds the same text
    from split segments + transformed matches (split/zip/rebuild), so the
    inline replacement semantics are value-checked byte-for-byte."""
    from dlp_dataflow_deidentification_spark.functions import findings as fnd

    tdf = _transcripts(spark, sf_dir)
    return tdf.select(
        "conv_id",
        "turn_idx",
        fnd.transform_findings(
            F.col("text"),
            ["EMAIL_ADDRESS", "PHONE_NUMBER"],
            {
                "EMAIL_ADDRESS": fnd.hash_repl(KEY, "sha256"),
                "PHONE_NUMBER": fnd.mask_repl(),
            },
        ).alias("text"),
    )


def q_text_tokenize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline surrogate tokenization round-trip (the free-text form of the
    reference's surrogate REID workflow, DLPReidentifyText.java:323-381):
    EMAIL findings are SIV-tokenized in place under an EMAIL_TOKEN(len):
    envelope, then reidentify_text scans the envelopes back out. The
    ``*_ok`` columns are computed Spark-side from the ACTUAL tokenized
    intermediate (envelope count == original email count; tokenized text
    differs whenever an email existed) while the oracle pins them literal
    TRUE and text = original — the hash match certifies both the envelope
    format and the lossless round-trip."""
    from dlp_dataflow_deidentification_spark.functions import findings as fnd
    from dlp_dataflow_deidentification_spark.functions.infotypes import resolve
    from dlp_dataflow_deidentification_spark.plans.config import derive_siv_key

    key = derive_siv_key(KEY)
    email_pat = resolve("EMAIL_ADDRESS").pattern
    tdf = _transcripts(spark, sf_dir).select("conv_id", "turn_idx", "text")
    tok = tdf.withColumn(
        "tok",
        fnd.transform_findings(
            F.col("text"), ["EMAIL_ADDRESS"], fnd.siv_repl(key, "EMAIL_TOKEN")
        ),
    )
    n_emails = F.size(F.regexp_extract_all(F.col("text"), F.lit(email_pat), F.lit(0)))
    n_envelopes = F.size(
        F.regexp_extract_all(F.col("tok"), F.lit(r"EMAIL_TOKEN\([0-9]+\):"), F.lit(0))
    )
    return tok.select(
        "conv_id",
        "turn_idx",
        fnd.reidentify_text(F.col("tok"), key, "EMAIL_TOKEN").alias("text"),
        (n_emails == n_envelopes).alias("envelope_ok"),
        ((n_emails == F.lit(0)) | (F.col("tok") != F.col("text"))).alias("tokenized_ok"),
    )


def q_inspect_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InspectConfig.ruleSet end-to-end (public InspectionRuleSet surface):
    a hotwordRule lifts PHONE_NUMBER findings to VERY_LIKELY when 'error'
    appears within 40 chars before the finding (proximity window includes
    the finding, per the proto), and an exclusionRule drops EMAIL_ADDRESS
    findings full-matching even-numbered test users. Runs on the offsets
    path (the full-fidelity rules locus — rules run per cell inside the
    Arrow-batched scan, no extra shuffle); the DuckDB oracle recomputes the
    same windows/offsets in pure SQL, so adjusted likelihoods, exclusions,
    and offsets are all value-checked."""
    cfg = dds.InspectConfig.from_dict(
        {
            "inspectConfig": {
                "infoTypes": [{"name": "PHONE_NUMBER"}, {"name": "EMAIL_ADDRESS"}],
                "ruleSet": [
                    {
                        "infoTypes": [{"name": "PHONE_NUMBER"}],
                        "rules": [
                            {
                                "hotwordRule": {
                                    "hotwordRegex": {"pattern": "(?i)error"},
                                    "proximity": {"windowBefore": 40},
                                    "likelihoodAdjustment": {
                                        "fixedLikelihood": "VERY_LIKELY"
                                    },
                                }
                            }
                        ],
                    },
                    {
                        "infoTypes": [{"name": "EMAIL_ADDRESS"}],
                        "rules": [
                            {
                                "exclusionRule": {
                                    "regex": {
                                        "pattern": r"user[0-9]*[02468]@example\.com"
                                    },
                                    "matchingType": "MATCHING_TYPE_FULL_MATCH",
                                }
                            }
                        ],
                    },
                ],
            }
        }
    )
    tdf = _transcripts(spark, sf_dir)
    out = dds.inspect_offsets(
        tdf,
        cfg.detectors,
        ["text"],
        id_columns=["conv_id", "turn_idx"],
        rule_sets=cfg.rule_sets,
    )
    return out.select(
        "conv_id",
        "turn_idx",
        "info_type_name",
        "likelihood",
        "quote",
        F.col("location_start").cast("long").alias("location_start"),
        F.col("location_end").cast("long").alias("location_end"),
    )


# Record-level controls template (public DLP RecordTransformations surface:
# recordSuppressions drop whole rows, FieldTransformation.condition gates a
# transform per-row, replaceDictionaryConfig substitutes from a word list —
# deterministic keyed-hash pick here, documented deviation from the
# service's random pick so the exactly-once sink replays stably).
COND_WORDS = ["alpha", "bravo", "charlie", "delta"]
COND_TEMPLATE = {
    "deidentifyConfig": {
        "recordTransformations": {
            "recordSuppressions": [
                {
                    "condition": {
                        "expressions": {
                            "logicalOperator": "AND",
                            "conditions": {
                                "conditions": [
                                    {
                                        "field": {"name": "o_orderstatus"},
                                        "operator": "EQUAL_TO",
                                        "value": {"stringValue": "F"},
                                    }
                                ]
                            },
                        }
                    }
                }
            ],
            "fieldTransformations": [
                {
                    "fields": [{"name": "o_custkey"}],
                    "condition": {
                        "expressions": {
                            "conditions": {
                                "conditions": [
                                    {
                                        "field": {"name": "o_totalprice"},
                                        "operator": "GREATER_THAN",
                                        "value": {"floatValue": 150000.0},
                                    }
                                ]
                            }
                        }
                    },
                    "primitiveTransformation": {
                        "replaceConfig": {"newValue": {"stringValue": "[HIGH-VALUE]"}}
                    },
                },
                {
                    "fields": [{"name": "o_orderpriority"}],
                    "primitiveTransformation": {
                        "replaceDictionaryConfig": {"wordList": {"words": COND_WORDS}}
                    },
                },
            ],
        }
    }
}


def q_deid_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-level template controls end-to-end: recordSuppressions drop
    every finalized order (o_orderstatus = 'F'), a RecordCondition gates the
    custkey replacement to high-value orders only (o_totalprice > 150000,
    evaluated on the ORIGINAL value), and replaceDictionaryConfig rewrites
    o_orderpriority to a word-list pick via the portable md5 PRF
    (date_shift_basis="md5") so the DuckDB oracle recomputes exact values.
    The whole plan stays one native filter + one narrow projection — no
    Python, no shuffle."""
    orders = _spread(
        spark, spark.read.parquet(os.path.join(sf_dir, "orders.parquet")), "o_orderkey"
    )
    src = orders.select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_custkey", "o_orderpriority"
    )
    template = dds.DeidTemplate.from_dict(
        COND_TEMPLATE, crypto_key=KEY, date_shift_basis="md5"
    )
    out = dds.deidentify(src, template)
    return out.select(
        "o_orderkey",
        F.col("o_custkey").alias("cust"),
        F.col("o_orderpriority").alias("priority"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full transcript de-identification at sf0.001."""
    return q_deid_transcripts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "deid_transcripts": q_deid_transcripts,
        "inspect_findings": q_inspect_findings,
        "inspect_dictionary": q_inspect_dictionary,
        "inspect_limits": q_inspect_limits,
        "dlp_batches": q_dlp_batches,
        "deid_cards": q_deid_cards,
        "crypto_roundtrip": q_crypto_roundtrip,
        "crypto_roundtrip_siv": q_crypto_roundtrip_siv,
        "fpe_roundtrip": q_fpe_roundtrip,
        "sessionize": q_sessionize,
        "agent_tool_join": q_agent_tool_join,
        "tool_call_hourly": q_tool_call_hourly,
        "windowed_infotype_hits": q_windowed_infotype_hits,
        "exact_dedup": q_exact_dedup,
        "ngram_jaccard": q_ngram_jaccard,
        "minhash_dedup": q_minhash_dedup,
        "dedup_clusters": q_dedup_clusters,
        "simhash_dedup": q_simhash_dedup,
        "cosine_topk": q_cosine_topk,
        "cosine_topk_arrow": q_cosine_topk_arrow,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ivf_topk": q_ivf_topk,
        "ivf_topk_indexed": q_ivf_topk_indexed,
        "embedding_dedup": q_embedding_dedup,
        "text_metrics": q_text_metrics,
        "session_windows": q_session_windows,
        "conv_sessions": q_conv_sessions,
        "chatlog_roundtrip": q_chatlog_roundtrip,
        "inspect_offsets": q_inspect_offsets,
        "corpus_curate": q_corpus_curate,
        "sliding_infotype_hits": q_sliding_infotype_hits,
        "deid_dates": q_deid_dates,
        "deid_conditional": q_deid_conditional,
        "inspect_rules": q_inspect_rules,
        "k_anonymity": q_k_anonymity,
        "l_diversity": q_l_diversity,
        "numerical_stats": q_numerical_stats,
        "pii_density": q_pii_density,
        "deid_text_inline": q_deid_text_inline,
        "text_tokenize_roundtrip": q_text_tokenize_roundtrip,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect)
# ---------------------------------------------------------------------------


def oracle_sql() -> dict[str, str]:
    t = _transcripts_cte()
    deid_text = _duck_regex_chain("text", TRANSCRIPT_DETECTORS)
    deid_notes = _duck_regex_chain("notes", NOTES_DETECTORS)

    inspect_parts = []
    from dlp_dataflow_deidentification_spark.functions.infotypes import resolve

    for name in TRANSCRIPT_DETECTORS:
        it = resolve(name)
        pat = it.pattern.replace("'", "''")
        inspect_parts.append(
            f"SELECT conv_id, turn_idx, 'text' AS field_id, '{it.name}' AS info_type_name,"
            f" 'LIKELY' AS likelihood,"
            f" unnest(regexp_extract_all(text, '{pat}')) AS quote FROM transcripts"
        )
    inspect_union = " UNION ALL ".join(inspect_parts)

    age_case = (
        "CASE WHEN age >= 18 AND age < 30 THEN '20' WHEN age >= 30 AND age < 40 THEN '30' "
        "WHEN age >= 40 AND age < 50 THEN '40' WHEN age >= 50 AND age < 60 THEN '50' "
        "WHEN age >= 60 AND age < 99 THEN '60' ELSE CAST(age AS STRING) END"
    )
    job_case = (
        "CASE WHEN job_title >= 'CIO' AND job_title < 'CIOz' THEN 'Executive' "
        "WHEN job_title >= 'CEO' AND job_title < 'CEOz' THEN 'Executive' "
        "WHEN job_title >= 'Vice President' AND job_title < 'Vice Presidentz' THEN 'Executive' "
        "WHEN job_title >= 'Software Engineer' AND job_title < 'Software Engineerz' THEN 'Engineer' "
        "WHEN job_title >= 'Product Manager' AND job_title < 'Product Managerz' THEN 'Manager' "
        "ELSE job_title END"
    )

    return {
        "deid_transcripts": (
            f"{t} SELECT conv_id, turn_idx, role, {deid_text} AS text, tool,"
            f" CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch FROM transcripts"
        ),
        "inspect_findings": f"{t} {inspect_union}",
        "inspect_dictionary": _inspect_dictionary_oracle(),
        "inspect_limits": _inspect_limits_oracle(max_per_item=2),
        "dlp_batches": _dlp_batches_oracle(max_batch_bytes=500),
        "inspect_offsets": _inspect_offsets_oracle(),
        "inspect_rules": _inspect_rules_oracle(),
        # risk analysis: every count CAST to BIGINT (HUGEINT sums float
        # through pandas and fail the stringified value hash)
        "k_anonymity": (
            "WITH classes AS (SELECT c_nationkey, c_mktsegment,"
            " CAST(count(*) AS BIGINT) AS class_size FROM customer GROUP BY 1, 2)"
            " SELECT class_size, CAST(count(*) AS BIGINT) AS n_classes,"
            " CAST(sum(class_size) AS BIGINT) AS n_records"
            " FROM classes GROUP BY class_size"
        ),
        "l_diversity": (
            "SELECT c_nationkey, c_mktsegment,"
            " CAST(count(*) AS BIGINT) AS class_size,"
            " CAST(count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT))"
            "  AS BIGINT) AS l_distinct_sensitive"
            " FROM customer GROUP BY c_nationkey, c_mktsegment"
        ),
        "numerical_stats": (
            "SELECT l_returnflag,"
            " min(CAST(l_quantity AS BIGINT)) AS min_value,"
            " max(CAST(l_quantity AS BIGINT)) AS max_value,"
            " CAST(count(*) AS BIGINT) AS n_records,"
            " quantile_cont(CAST(l_quantity AS BIGINT), 0.25) AS p25,"
            " quantile_cont(CAST(l_quantity AS BIGINT), 0.50) AS p50,"
            " quantile_cont(CAST(l_quantity AS BIGINT), 0.75) AS p75"
            " FROM lineitem GROUP BY l_returnflag"
        ),
        "pii_density": _pii_density_oracle(),
        "deid_text_inline": _deid_text_inline_oracle(),
        # identity + pinned-TRUE flags: the Spark side computes the flags
        # from the real tokenized intermediate, so the hash match certifies
        # envelope format + lossless inline round-trip
        "text_tokenize_roundtrip": (
            f"{_transcripts_cte()}"
            " SELECT conv_id, turn_idx, text,"
            " TRUE AS envelope_ok, TRUE AS tokenized_ok FROM transcripts"
        ),
        "deid_cards": (
            f"WITH cards AS ({CARDS_SQL}) SELECT id,"
            f" sha256('{KEY}' || card_pin) AS card_pin,"
            f" '***-**-' || substr(ssn, 8) AS ssn,"
            f" {age_case} AS age,"
            f" {job_case} AS job_title,"
            f" {deid_notes} AS notes"
            f" FROM cards"
        ),
        "crypto_roundtrip": (
            f"WITH cards AS ({CARDS_SQL}) SELECT id, holder_name, card_number FROM cards"
        ),
        "crypto_roundtrip_siv": (
            f"WITH cards AS ({CARDS_SQL}) SELECT id, holder_name, card_number FROM cards"
        ),
        # identity after FF1 tokenize→reidentify; the fmt_ok literals are
        # asserted Spark-side from the actual tokens (format preservation)
        "fpe_roundtrip": (
            f"WITH cards AS ({CARDS_SQL}) SELECT id, card_pin,"
            f" regexp_replace(card_number, '[^0-9]', '', 'g') AS pan,"
            f" TRUE AS pin_fmt_ok, TRUE AS pan_fmt_ok FROM cards"
        ),
        "sessionize": (
            f"{t}, e AS (SELECT conv_id, role, turn_idx, ts,"
            f" CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s FROM transcripts),"
            f" l AS (SELECT *, lag(epoch_s) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx) AS prev_s FROM e),"
            f" s AS (SELECT *, CASE WHEN prev_s IS NULL OR epoch_s - prev_s <= 1800 THEN 0 ELSE 1 END AS new_s FROM l),"
            f" r AS (SELECT *, CAST(SUM(new_s) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx"
            f" ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS session_id FROM s)"
            f" SELECT conv_id, session_id, COUNT(*) AS n_turns,"
            f" CAST(SUM(CASE WHEN role = 'agent' THEN 1 ELSE 0 END) AS BIGINT) AS n_agent,"
            f" CAST(SUM(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS BIGINT) AS n_tool,"
            f" MIN(epoch_s) AS start_epoch, MAX(epoch_s) AS end_epoch"
            f" FROM r GROUP BY conv_id, session_id"
        ),
        "agent_tool_join": (
            f"{t} SELECT a.conv_id AS conv_id, a.turn_idx AS agent_turn_idx,"
            f" b.turn_idx AS tool_turn_idx, b.tool AS tool_name,"
            f" CAST(floor(epoch(b.ts)) AS BIGINT) - CAST(floor(epoch(a.ts)) AS BIGINT) AS lag_seconds"
            f" FROM transcripts a JOIN transcripts b"
            f" ON a.conv_id = b.conv_id AND a.role = 'agent' AND b.role = 'tool'"
            f" AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 21600 SECOND"
        ),
        "tool_call_hourly": (
            f"{t} SELECT CAST(floor(epoch(b.ts) / 3600) * 3600 AS BIGINT) AS window_start_epoch,"
            f" b.tool AS tool_name, COUNT(*) AS n_calls"
            f" FROM transcripts a JOIN transcripts b"
            f" ON a.conv_id = b.conv_id AND a.role = 'agent' AND b.role = 'tool'"
            f" AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 21600 SECOND"
            f" GROUP BY 1, 2"
        ),
        "windowed_infotype_hits": (
            f"{t}, f AS ({inspect_union.replace('conv_id, turn_idx,', 'ts,')})"
            f" SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start_epoch,"
            f" info_type_name, COUNT(*) AS n_hits FROM f GROUP BY 1, 2"
        ),
        "exact_dedup": (
            f"WITH docs AS ({DOCS_SQL})"
            f" SELECT min(doc_id) AS doc_id, count(*) AS n_copies"
            f" FROM (SELECT doc_id, md5(trim(lower(regexp_replace(text, '\\s+', ' ', 'g')))) AS digest FROM docs)"
            f" GROUP BY digest"
        ),
        "ngram_jaccard": _ngram_jaccard_oracle(
            "SELECT * FROM docs WHERE doc_id % 5 = 0 OR doc_id >= 100000", max_df=1000
        ),
        # minhash_dedup's oracle is plain exact Jaccard over ALL pairs (no df
        # cap, no LSH): equality certifies both the exact-verify stage and
        # 100% LSH recall at the threshold on this corpus.
        "minhash_dedup": _ngram_jaccard_oracle("SELECT * FROM docs", max_df=None),
        # transitive closure of the same exact pair set (recursive CTE is
        # safe on the oracle side: dup components are tiny); the engine runs
        # large-star/small-star instead, which never materializes a closure
        "dedup_clusters": (
            "WITH RECURSIVE"
            f" pairs AS (SELECT id_a, id_b FROM ({_ngram_jaccard_oracle('SELECT * FROM docs', max_df=None)}) t),"
            " edges AS (SELECT id_a AS u, id_b AS v FROM pairs"
            "           UNION SELECT id_b, id_a FROM pairs),"
            " reach(node, root) AS ("
            "   SELECT u, u FROM (SELECT DISTINCT u FROM edges) n"
            "   UNION"
            "   SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.node),"
            " comp AS (SELECT node AS doc_id, min(root) AS cluster_rep"
            "          FROM reach GROUP BY node),"
            " sizes AS (SELECT cluster_rep, count(*) AS cluster_size"
            "           FROM comp GROUP BY cluster_rep)"
            " SELECT c.doc_id, c.cluster_rep, s.cluster_size"
            " FROM comp c JOIN sizes s USING (cluster_rep)"
        ),
        "simhash_dedup": _simhash_oracle(
            "SELECT * FROM docs WHERE doc_id % 5 = 0 OR doc_id >= 100000", max_hamming=3
        ),
        "cosine_topk": _COSINE_TOPK_ORACLE,
        # the Arrow/BLAS implementation must produce the identical ranking
        "cosine_topk_arrow": _COSINE_TOPK_ORACLE,
        # ann_lsh_topk's oracle is the EXACT cosine ranking over the planted
        # near-neighbor corpus: equality certifies recall@10 = 1.0 for the
        # multi-table Hamming-1-probe LSH (ranks/sims of true top-10 members
        # are identical by construction once every member is a candidate).
        "ann_lsh_topk": _ann_lsh_oracle(),
        # ivf_topk scans only nprobe k-means cells; its oracle is the same
        # exact ranking — equality certifies IVF recall@10 = 1.0 here too
        "ivf_topk": _ann_lsh_oracle(),
        # ...and the materialized-index form (partition-pruned scan) must
        # reproduce the identical exact ranking
        "ivf_topk_indexed": _ann_lsh_oracle(),
        "embedding_dedup": _embedding_dedup_oracle(),
        "text_metrics": _text_metrics_oracle(),
        "corpus_curate": _corpus_curate_oracle(),
        "sliding_infotype_hits": _sliding_hits_oracle(),
        # portable 60-bit md5 PRF (same construction as the simhash oracle):
        # DuckDB recomputes the exact per-customer day shift, so the shifted
        # timestamps are value-checked, not rows-only
        # record-level controls: suppression = WHERE NOT(match); gated
        # transform = CASE on the ORIGINAL value; dictionary pick = the same
        # portable 60-bit md5 PRF, 1-based into the word list
        "deid_conditional": (
            "SELECT o_orderkey,"
            " CASE WHEN CAST(o_totalprice AS DOUBLE) > 150000.0"
            "   THEN '[HIGH-VALUE]' ELSE CAST(o_custkey AS VARCHAR) END AS cust,"
            " list_extract("
            + "["
            + ", ".join(f"'{w}'" for w in COND_WORDS)
            + "],"
            " CAST(1 + CAST(CAST('0x' || substr(md5('"
            + KEY
            + "' || o_orderpriority), 1, 15) AS UBIGINT) AS BIGINT)"
            f" % {len(COND_WORDS)} AS INTEGER)) AS priority"
            " FROM orders WHERE NOT (o_orderstatus = 'F')"
        ),
        "deid_dates": (
            "SELECT o_orderkey,"
            " CAST(year(o_orderdate) AS VARCHAR) AS order_year,"
            " CAST(month(o_orderdate) AS VARCHAR) AS order_month,"
            " CAST(floor(epoch(o_orderdate + to_days(CAST("
            f" CAST(CAST('0x' || substr(md5('{KEY}' || CAST(o_custkey AS VARCHAR)), 1, 15)"
            " AS UBIGINT) AS BIGINT) % 101"
            " AS INTEGER)))) AS BIGINT) AS shifted_epoch"
            " FROM orders"
        ),
        "chatlog_roundtrip": (
            f"{t} SELECT CASE WHEN conv_id = 'conv-hot' THEN '9999'"
            f" ELSE substr(conv_id, 6, 10) END AS conv_id,"
            f" CAST(ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1 AS INT) AS turn_idx,"
            f" role, text FROM transcripts WHERE role IN ('agent', 'customer')"
        ),
        "conv_sessions": (
            f"{t},"
            f" d AS (SELECT conv_id, turn_idx, ts, {deid_text} AS text FROM transcripts),"
            f" e AS (SELECT conv_id, text, ts, epoch_ms(ts) AS ms FROM d),"
            f" l AS (SELECT *, lag(ms) OVER (PARTITION BY conv_id ORDER BY ts) AS pms FROM e),"
            f" s AS (SELECT *, CASE WHEN pms IS NULL OR ms - pms < 1800000 THEN 0 ELSE 1 END AS new_s FROM l),"
            f" r AS (SELECT *, SUM(new_s) OVER (PARTITION BY conv_id ORDER BY ts"
            f"   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM s)"
            f" SELECT conv_id, count(*) AS n_turns,"
            f" CAST(SUM(CASE WHEN regexp_matches(text, '\\[[A-Z_]+\\]') THEN 1 ELSE 0 END) AS BIGINT) AS n_pii_turns,"
            f" min(ms) AS first_ms, max(ms) AS last_ms"
            f" FROM r GROUP BY conv_id, sid"
        ),
        "session_windows": (
            f"{t}, e AS (SELECT conv_id, role, turn_idx, ts, epoch_us(ts) AS us FROM transcripts),"
            f" l AS (SELECT *, lag(us) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx) AS pus FROM e),"
            f" s AS (SELECT *, CASE WHEN pus IS NULL OR us - pus < 1800000000 THEN 0 ELSE 1 END AS new_s FROM l),"
            f" r AS (SELECT *, SUM(new_s) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx"
            f"   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM s)"
            f" SELECT conv_id, min(us) AS session_start_us, count(*) AS n_turns,"
            f" CAST(SUM(CASE WHEN role = 'agent' THEN 1 ELSE 0 END) AS BIGINT) AS n_agent,"
            f" CAST(SUM(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS BIGINT) AS n_tool"
            f" FROM r GROUP BY conv_id, sid"
        ),
    }


_COSINE_TOPK_ORACLE = (
    " WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv"
    "            FROM embeddings WHERE vec_id % 100 = 0),"
    " scored AS (SELECT q.query_id, e.vec_id,"
    "   list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS sim"
    "   FROM embeddings e, q),"
    " ranked AS (SELECT *, row_number() OVER"
    "   (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank FROM scored)"
    " SELECT query_id, vec_id, rank, round(sim, 6) AS sim FROM ranked WHERE rank <= 10"
)


def _metric_sql_exprs() -> dict:
    """DuckDB expressions mirroring functions/text.py, shared by the
    text_metrics and corpus_curate oracles."""
    from dlp_dataflow_deidentification_spark.functions.text import LANG_STOPWORDS

    def sw(words):
        return (
            "len(regexp_extract_all(lower(text), '\\b(?:" + "|".join(words) + ")\\b'))"
        )

    hits = {lang: sw(ws) for lang, ws in LANG_STOPWORDS.items()}
    n_tokens = (
        "CASE WHEN trim(text) = '' THEN 0"
        " ELSE len(string_split_regex(trim(text), '\\s+')) END"
    )
    punct = (
        "CASE WHEN length(text) > 0 THEN"
        " (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))"
        " / CAST(length(text) AS DOUBLE) ELSE 0.0 END"
    )
    toks_d = f"CAST({n_tokens} AS DOUBLE)"
    quality = (
        f"round(least({toks_d} / 64.0, 1.0) * 0.4"
        f" + least({hits['en']} / greatest({toks_d}, 1.0) * 4.0, 1.0) * 0.3"
        f" + (1.0 - least(({punct}) * 5.0, 1.0)) * 0.3, 6)"
    )
    # argmax over (hits, lang) with the same lexicographic tie rule as the
    # engine's array_max over struct(hits, lang): the winner dominates every
    # other (hits, lang) tuple (unique since lang codes are distinct)
    langs = sorted(LANG_STOPWORDS)
    lang_case = "CASE "
    for l in langs:
        cond = " AND ".join(
            f"({hits[l]}, '{l}') >= ({hits[o]}, '{o}')" for o in langs if o != l
        )
        lang_case += f"WHEN {cond} THEN CASE WHEN {hits[l]} > 0 THEN '{l}' ELSE 'und' END "
    lang_case += "ELSE 'und' END"
    return {"n_tokens": n_tokens, "punct": punct, "quality": quality, "lang": lang_case}


def _text_metrics_oracle() -> str:
    m = _metric_sql_exprs()
    return (
        "SELECT doc_id,"
        f" CAST({m['n_tokens']} AS BIGINT) AS n_tokens,"
        " CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,"
        f" round({m['punct']}, 6) AS punct_ratio,"
        f" {m['quality']} AS quality,"
        f" {m['lang']} AS lang_pred,"
        " md5(trim(lower(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint"
        " FROM documents"
    )


def _sliding_hits_oracle() -> str:
    """2h/1h sliding windows: each PII-bearing event lands in exactly two
    hour-aligned windows (epoch-aligned, same as Spark's window())."""
    from dlp_dataflow_deidentification_spark.functions.infotypes import resolve

    arms = []
    for name in TRANSCRIPT_DETECTORS:
        it = resolve(name)
        pat = it.pattern.replace("'", "''")
        arms.append(
            f"SELECT ts, '{it.name}' AS info_type_name,"
            f" len(regexp_extract_all(text, '{pat}')) AS n FROM transcripts"
        )
    hits_union = " UNION ALL ".join(arms)
    return (
        f"{_transcripts_cte()},"
        f" h AS ({hits_union}),"
        f" f AS (SELECT * FROM h WHERE n > 0),"
        f" w AS ("
        f"  SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start_epoch,"
        f"   info_type_name, n FROM f"
        f"  UNION ALL"
        f"  SELECT CAST(floor(epoch(ts) / 3600) * 3600 - 3600 AS BIGINT),"
        f"   info_type_name, n FROM f)"
        f" SELECT window_start_epoch, info_type_name,"
        f" CAST(SUM(n) AS BIGINT) AS n_hits FROM w GROUP BY 1, 2"
    )


def _ann_lsh_oracle() -> str:
    """Exact cosine top-10 over the planted near-neighbor corpus (mirrors
    _ann_corpus: copy k of query v is v + c_k*reverse(v)). The c_k literals
    are injected via repr() so DuckDB parses the exact same double that
    Spark's F.lit(0.02*k) produces."""
    copy_arms = []
    for k in range(1, 10):
        c = repr(0.02 * k)
        copy_arms.append(
            f"SELECT query_id + {1000000 * k} AS vec_id,"
            f" list_transform(generate_series(1, len(qv)),"
            f"   i -> qv[i] + CAST({c} AS DOUBLE) * qv[len(qv) + 1 - i]) AS v"
            f" FROM q"
        )
    copies = " UNION ALL ".join(copy_arms)
    return (
        " WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),"
        " q AS (SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id % 100 = 0),"
        f" corpus AS (SELECT vec_id, v FROM base UNION ALL {copies}),"
        " scored AS (SELECT q.query_id, c.vec_id,"
        "   list_cosine_similarity(q.qv, c.v) AS sim FROM corpus c, q),"
        " ranked AS (SELECT *, row_number() OVER"
        "   (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank FROM scored)"
        " SELECT query_id, vec_id, rank, round(sim, 6) AS sim FROM ranked WHERE rank <= 10"
    )


def _inspect_dictionary_oracle() -> str:
    """Dictionary findings: the identical rendered alternation regex run by
    DuckDB's RE2 (word list → longest-first \\b(?:...)\\b, same rule as
    functions/infotypes.py::dictionary)."""
    from dlp_dataflow_deidentification_spark.functions.infotypes import dictionary

    det = dictionary("TRANSACTION_TERM", DICT_WORDS, "POSSIBLE")
    pat = det.pattern.replace("'", "''")
    return (
        f"{_transcripts_cte()}"
        f" SELECT conv_id, turn_idx, 'text' AS field_id,"
        f" '{det.name}' AS info_type_name, '{det.likelihood}' AS likelihood,"
        f" unnest(regexp_extract_all(text, '{pat}')) AS quote FROM transcripts"
    )


def _inspect_limits_oracle(max_per_item: int) -> str:
    """Position-ordered maxFindingsPerItem (the DLP rule): per row, the
    first ``max_per_item`` findings in (start_offset, detector_idx) order —
    a detector cannot match twice at one offset, so that pair is a total
    order. Offsets come from the same cumulative segment/match-length
    derivation as the inspect_offsets oracle; the cap is one row_number
    window per row. minLikelihood=LIKELY already pruned the POSSIBLE
    dictionary detector, so only TRANSCRIPT_DETECTORS appear (det_idx =
    their config order)."""
    from dlp_dataflow_deidentification_spark.functions.infotypes import resolve

    arms = []
    for di, name in enumerate(TRANSCRIPT_DETECTORS):
        it = resolve(name)
        pat = it.pattern.replace("'", "''")
        arms.append(
            f"SELECT conv_id, turn_idx, {di} AS det_idx,"
            f" CAST(coalesce(list_sum(list_transform(s[1:i], x -> length(x))), 0)"
            f"  + coalesce(list_sum(list_transform(m[1:i-1], x -> length(x))), 0) AS BIGINT)"
            f"  AS pos,"
            f" 'text' AS field_id, '{it.name}' AS info_type_name,"
            f" '{it.likelihood}' AS likelihood, m[i] AS quote"
            f" FROM (SELECT conv_id, turn_idx,"
            f"   regexp_extract_all(text, '{pat}') AS m,"
            f"   string_split_regex(text, '{pat}') AS s FROM transcripts),"
            f" UNNEST(generate_series(1, len(m))) AS t(i)"
        )
    union = " UNION ALL ".join(arms)
    return (
        f"{_transcripts_cte()},"
        f" u AS ({union}),"
        f" r AS (SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx"
        f"   ORDER BY pos, det_idx) AS rn FROM u)"
        f" SELECT conv_id, turn_idx, field_id, info_type_name, likelihood, quote"
        f" FROM r WHERE rn <= {max_per_item}"
    )


def _dlp_batches_oracle(max_batch_bytes: int) -> str:
    """Greedy byte-packing as a recursive CTE: scan each conversation's turns
    in turn order; start a new batch when adding the next turn would exceed
    the budget (an oversized single turn forms its own batch) — exactly
    streaming/stateful.py::pack_greedy. strlen() counts UTF-8 BYTES in
    DuckDB, matching the engine's ``str.encode('utf-8').str.len`` sizing
    (the reference budgets proto-serialized bytes,
    beam/BatchRequestForDLP.java:62-66)."""
    b = max_batch_bytes
    return (
        f"WITH RECURSIVE transcripts AS ({TRANSCRIPTS_FROM_EVENTS_SQL}),"
        f" t AS (SELECT conv_id,"
        f"   row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn,"
        f"   strlen(text) AS len FROM transcripts),"
        f" rec AS ("
        f"   SELECT conv_id, rn, len, len AS buf, 0 AS seq FROM t WHERE rn = 1"
        f"   UNION ALL"
        f"   SELECT t.conv_id, t.rn, t.len,"
        f"     CASE WHEN rec.buf + t.len > {b} THEN t.len ELSE rec.buf + t.len END,"
        f"     CASE WHEN rec.buf + t.len > {b} THEN rec.seq + 1 ELSE rec.seq END"
        f"   FROM rec JOIN t ON t.conv_id = rec.conv_id AND t.rn = rec.rn + 1)"
        f" SELECT conv_id AS key, CAST(seq AS BIGINT) AS batch_seq,"
        f" count(*) AS n_rows, CAST(sum(len) AS BIGINT) AS n_bytes"
        f" FROM rec GROUP BY conv_id, seq"
    )


def _embedding_dedup_oracle() -> str:
    """Exact all-pairs cosine ≥ 0.99 over the perturbed-copy corpus (mirrors
    q_embedding_dedup: copy k of base v is v + 0.05k·reverse(v)). Equality
    with the engine's probed multi-table LSH output certifies near-dup
    recall at the threshold, not just exact-copy recall."""
    copy_arms = []
    for k in range(1, 4):
        c = repr(0.05 * k)
        copy_arms.append(
            f"SELECT vec_id + {1000000 * k} AS vec_id,"
            f" list_transform(generate_series(1, len(v)),"
            f"   i -> v[i] + CAST({c} AS DOUBLE) * v[len(v) + 1 - i]) AS v"
            f" FROM base WHERE vec_id % 50 = 0"
        )
    copies = " UNION ALL ".join(copy_arms)
    return (
        " WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),"
        f" ecorpus AS (SELECT vec_id, v FROM base UNION ALL {copies})"
        " SELECT a.vec_id AS id_a, b.vec_id AS id_b,"
        "   round(list_cosine_similarity(a.v, b.v), 6) AS sim"
        " FROM ecorpus a JOIN ecorpus b ON a.vec_id < b.vec_id"
        " WHERE list_cosine_similarity(a.v, b.v) >= 0.99"
    )


def _ngram_jaccard_oracle(filt_sql: str, max_df: "int | None") -> str:
    """Exact word-5-gram Jaccard pairs over the docs corpus. ``max_df`` caps
    the inverted index used for candidate generation (mirrors
    dedup.ngram_jaccard_pairs); Jaccard itself is always computed on the full
    distinct-shingle sets. ``max_df=None`` = all shared-shingle pairs (the
    plain exact truth, used as the minhash_dedup recall-proof oracle)."""
    if max_df is None:
        cand = (
            " cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b"
            "          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id),"
        )
    else:
        cand = (
            f" keepg AS (SELECT g FROM sh GROUP BY g HAVING count(*) <= {max_df}),"
            f" idx AS (SELECT doc_id, g FROM sh JOIN keepg USING (g)),"
            f" cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b"
            f"          FROM idx a JOIN idx b ON a.g = b.g AND a.doc_id < b.doc_id),"
        )
    return (
        f"WITH docs AS ({DOCS_SQL}),"
        f" filt AS ({filt_sql}),"
        f" words AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),"
        f"           x -> x <> '') AS w FROM filt),"
        f" sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS g"
        f"        FROM words, UNNEST(generate_series(1, len(w) - 4)) AS t(i)"
        f"        WHERE len(w) >= 5),"
        f" sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),"
        f"{cand}"
        f" pairs AS (SELECT c.id_a, c.id_b, count(*) AS common"
        f"           FROM cand c JOIN sh a ON a.doc_id = c.id_a"
        f"           JOIN sh b ON b.doc_id = c.id_b AND b.g = a.g"
        f"           GROUP BY 1, 2)"
        f" SELECT id_a, id_b, round(common / (sa.n + sb.n - common), 6) AS jaccard"
        f" FROM pairs JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id"
        f" WHERE common / (sa.n + sb.n - common) >= 0.5"
    )


def _simhash_oracle(filt_sql: str, max_hamming: int) -> str:
    """60-bit portable simhash pairs: token hash = low 60 bits of md5
    (identical to Spark's conv(substr(md5(w),1,15),16,10)), per-bit +1/-1
    majority over token OCCURRENCES (not distinct), pairs with
    bit_count(xor) <= max_hamming. Zero-token docs are excluded on both
    sides (their simhash would be the constant 0)."""
    return (
        f"WITH docs AS ({DOCS_SQL}),"
        f" filt AS ({filt_sql}),"
        f" tok AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'),"
        f"         w -> w <> '')) AS w FROM filt),"
        f" h AS (SELECT doc_id, CAST(CAST(('0x' || substr(md5(w), 1, 15)) AS UBIGINT) AS BIGINT) AS h FROM tok),"
        f" bits AS (SELECT doc_id, b,"
        f"          SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s"
        f"          FROM h, UNNEST(generate_series(0, 59)) AS t(b) GROUP BY doc_id, b),"
        f" sh AS (SELECT doc_id, CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b)"
        f"        ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS sh FROM bits GROUP BY doc_id)"
        f" SELECT a.doc_id AS id_a, b.doc_id AS id_b,"
        f" CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming"
        f" FROM sh a JOIN sh b ON a.doc_id < b.doc_id"
        f" WHERE bit_count(xor(a.sh, b.sh)) <= {max_hamming}"
    )


def _inspect_offsets_oracle() -> str:
    """Findings with codepoint offsets. For the i-th match of a pattern,
    location_start = sum(len(segments[1..i])) + sum(len(matches[1..i-1]))
    where segments = regexp_split_to_array(text, pat) — pure SQL, no
    position functions needed, and exactly Python re.finditer's m.start()."""
    from dlp_dataflow_deidentification_spark.functions.infotypes import resolve

    arms = []
    for name in TRANSCRIPT_DETECTORS:
        it = resolve(name)
        pat = it.pattern.replace("'", "''")
        arms.append(
            f"SELECT conv_id, turn_idx, 'text' AS field_id,"
            f" '{it.name}' AS info_type_name, '{it.likelihood}' AS likelihood,"
            f" m[i] AS quote,"
            f" CAST(coalesce(list_sum(list_transform(s[1:i], x -> length(x))), 0)"
            f"  + coalesce(list_sum(list_transform(m[1:i-1], x -> length(x))), 0) AS BIGINT)"
            f"  AS location_start,"
            f" CAST(coalesce(list_sum(list_transform(s[1:i], x -> length(x))), 0)"
            f"  + coalesce(list_sum(list_transform(m[1:i-1], x -> length(x))), 0)"
            f"  + length(m[i]) AS BIGINT) AS location_end"
            f" FROM (SELECT conv_id, turn_idx,"
            f"   regexp_extract_all(text, '{pat}') AS m,"
            f"   string_split_regex(text, '{pat}') AS s FROM transcripts),"
            f" UNNEST(generate_series(1, len(m))) AS t(i)"
        )
    return f"{_transcripts_cte()} " + " UNION ALL ".join(arms)


def _rebuild_sql(expr: str, pat: str, repl_lambda: str) -> str:
    """DuckDB inline-replacement rebuild: split the text by the detector
    pattern, transform each match with ``repl_lambda`` (a DuckDB lambda
    string), and stitch segments+matches back together. list_zip pads the
    shorter matches list with NULL so the trailing segment passes through."""
    return (
        "array_to_string(list_transform(list_zip("
        f"string_split_regex({expr}, '{pat}'),"
        f" list_append(list_transform(regexp_extract_all({expr}, '{pat}'),"
        f" {repl_lambda}), NULL)),"
        " z -> coalesce(z[1], '') || coalesce(z[2], '')), '')"
    )


def _pii_density_oracle() -> str:
    from dlp_dataflow_deidentification_spark.functions.infotypes import resolve

    terms = " + ".join(
        f"len(regexp_extract_all(text, '{resolve(n).pattern.replace(chr(39), chr(39)*2)}'))"
        for n in TRANSCRIPT_DETECTORS
    )
    return (
        f"{_transcripts_cte()},"
        f" per_turn AS (SELECT conv_id,"
        f"   CAST({terms} AS BIGINT) AS n_findings,"
        f"   CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens"
        f"  FROM transcripts),"
        # sum(BIGINT) is HUGEINT in DuckDB (floats through pandas) — CAST
        # back to BIGINT so stringified values match Spark's longs
        f" agg AS (SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,"
        f"   CAST(sum(n_findings) AS BIGINT) AS n_findings,"
        f"   CAST(sum(n_tokens) AS BIGINT) AS n_tokens"
        f"  FROM per_turn GROUP BY conv_id)"
        f" SELECT conv_id, n_turns, n_findings, n_tokens,"
        # CAST: a bare 100.0 literal is DECIMAL in DuckDB and the division
        # would come back as DECIMAL — numerically equal but stringified
        # differently than Spark's double, failing the value hash
        f" CAST(100.0 AS DOUBLE) * n_findings / n_tokens AS pii_per_100_tokens,"
        f" (CAST(100.0 AS DOUBLE) * n_findings / n_tokens) > 2.0 AS quarantine FROM agg"
    )


def _deid_text_inline_oracle() -> str:
    from dlp_dataflow_deidentification_spark.functions.infotypes import resolve

    email = resolve("EMAIL_ADDRESS").pattern.replace("'", "''")
    phone = resolve("PHONE_NUMBER").pattern.replace("'", "''")
    # engine chains detectors: EMAIL rebuild first, PHONE rebuild over it
    stage1 = _rebuild_sql("text", email, f"x -> sha256('{KEY}' || x)")
    stage2 = _rebuild_sql("t1", phone, "x -> repeat('*', length(x))")
    return (
        f"{_transcripts_cte()},"
        f" s1 AS (SELECT conv_id, turn_idx, {stage1} AS t1 FROM transcripts)"
        f" SELECT conv_id, turn_idx, {stage2} AS text FROM s1"
    )


def _inspect_rules_oracle() -> str:
    """q_inspect_rules in pure SQL: the offsets derivation of
    _inspect_offsets_oracle (text carried through), then the hotword CASE
    over the proximity window substring (window = [start-40, end), includes
    the finding) and the exclusion as WHERE NOT full-match."""
    from dlp_dataflow_deidentification_spark.functions.infotypes import resolve

    arms = []
    for name in ("PHONE_NUMBER", "EMAIL_ADDRESS"):
        it = resolve(name)
        pat = it.pattern.replace("'", "''")
        arms.append(
            f"SELECT conv_id, turn_idx, text,"
            f" '{it.name}' AS info_type_name, '{it.likelihood}' AS lk0,"
            f" m[i] AS quote,"
            f" CAST(coalesce(list_sum(list_transform(s[1:i], x -> length(x))), 0)"
            f"  + coalesce(list_sum(list_transform(m[1:i-1], x -> length(x))), 0) AS BIGINT)"
            f"  AS location_start,"
            f" CAST(coalesce(list_sum(list_transform(s[1:i], x -> length(x))), 0)"
            f"  + coalesce(list_sum(list_transform(m[1:i-1], x -> length(x))), 0)"
            f"  + length(m[i]) AS BIGINT) AS location_end"
            f" FROM (SELECT conv_id, turn_idx, text,"
            f"   regexp_extract_all(text, '{pat}') AS m,"
            f"   string_split_regex(text, '{pat}') AS s FROM transcripts),"
            f" UNNEST(generate_series(1, len(m))) AS t(i)"
        )
    f = " UNION ALL ".join(arms)
    return (
        f"{_transcripts_cte()}, f AS ({f})"
        " SELECT conv_id, turn_idx, info_type_name,"
        " CASE WHEN info_type_name = 'PHONE_NUMBER' AND regexp_matches("
        "   substr(text, CAST(greatest(location_start - 40, 0) + 1 AS BIGINT),"
        "          CAST(location_end - greatest(location_start - 40, 0) AS BIGINT)),"
        "   '(?i)error') THEN 'VERY_LIKELY' ELSE lk0 END AS likelihood,"
        " quote, location_start, location_end"
        " FROM f"
        " WHERE NOT (info_type_name = 'EMAIL_ADDRESS'"
        "   AND regexp_full_match(quote, 'user[0-9]*[02468]@example\\.com'))"
    )


def _corpus_curate_oracle() -> str:
    m = _metric_sql_exprs()
    return (
        f"WITH docs AS ({DOCS_SQL}),"
        f" metrics AS (SELECT doc_id, text, {m['quality']} AS quality,"
        f"   {m['lang']} AS lang_pred, CAST({m['n_tokens']} AS BIGINT) AS n_tokens FROM docs),"
        f" kept AS (SELECT * FROM metrics WHERE quality >= 0.3 AND n_tokens >= 8"
        f"   AND lang_pred IN ('en', 'und')),"
        f" winners AS (SELECT min(doc_id) AS doc_id FROM"
        f"   (SELECT doc_id, md5(trim(lower(regexp_replace(text, '\\s+', ' ', 'g')))) AS digest FROM kept)"
        f"   GROUP BY digest)"
        f" SELECT k.doc_id, k.quality, k.lang_pred, k.n_tokens"
        f" FROM kept k JOIN winners w ON k.doc_id = w.doc_id"
    )
