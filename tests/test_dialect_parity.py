"""Cross-engine guardrail: the shared transcript-derivation SQL and the
regex-based transforms must produce value-identical results in Spark and
DuckDB (the driver's oracle engine). This test pins the common-dialect
assumptions everything else builds on."""
import duckdb
import pandas as pd
import pytest

from dlp_dataflow_deidentification_spark.sources.transcripts import (
    TRANSCRIPTS_FROM_EVENTS_SQL,
    load_transcripts,
)
from dlp_dataflow_deidentification_spark.functions import infotypes, transforms
from pyspark.sql import functions as F


def duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def test_transcript_derivation_matches_duckdb(spark, sf_dir):
    got = normalize(load_transcripts(spark, sf_dir).toPandas())
    want = normalize(duck(sf_dir).execute(TRANSCRIPTS_FROM_EVENTS_SQL).df())
    # timestamps: compare as naive UTC
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0
    assert (got["turn_idx"] >= 0).all()


def test_replace_with_infotype_matches_duckdb_regex(spark, sf_dir):
    dets = [infotypes.resolve(n) for n in infotypes.DEFAULT_DETECTOR_ORDER]
    tdf = load_transcripts(spark, sf_dir)
    got = normalize(
        tdf.select(
            "conv_id",
            "turn_idx",
            transforms.replace_with_infotype(F.col("text"), dets).alias("text"),
        ).toPandas()
    )
    con = duck(sf_dir)
    inner = "SELECT conv_id, turn_idx, text FROM (" + TRANSCRIPTS_FROM_EVENTS_SQL + ")"
    expr = "text"
    for it in dets:
        expr = f"regexp_replace({expr}, '{it.pattern}', '[{it.name}]', 'g')"
    want = normalize(
        con.execute(
            f"SELECT conv_id, turn_idx, {expr} AS text FROM ({inner})"
        ).df()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # sanity: PII actually present and replaced
    joined = " ".join(got["text"].head(500))
    assert "[EMAIL_ADDRESS]" in joined and "[PHONE_NUMBER]" in joined
    assert "@example.com" not in joined


def test_utf8_byte_length_dialect_parity():
    """The dlp_batches oracle sizes payloads with DuckDB strlen() (BYTES)
    and the engine with pandas .str.encode('utf-8').str.len — pin that both
    count UTF-8 bytes identically (length() in DuckDB counts codepoints and
    must NOT be used there)."""
    import duckdb
    import pandas as pd

    samples = ["plain ascii", "héllo wörld", "😀😀", "", "mixed é 😀 x"]
    con = duckdb.connect()
    for s in samples:
        duck_bytes = con.execute("SELECT strlen(?)", [s]).fetchone()[0]
        duck_cp = con.execute("SELECT length(?)", [s]).fetchone()[0]
        pd_bytes = int(pd.Series([s]).str.encode("utf-8").str.len().iloc[0])
        assert duck_bytes == pd_bytes == len(s.encode("utf-8"))
        assert duck_cp == len(s)  # codepoints — the WRONG unit for budgets
