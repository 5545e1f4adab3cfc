"""Per-file dynamic schema discovery in ONE streaming pipeline (reference
flagship: ExtractColumnNamesTransform header side-input + keep-one merge +
per-key dynamic destinations)."""
import os

import pytest

from dlp_dataflow_deidentification_spark.sources.dynamic import DynamicSchemaCsvStream


@pytest.fixture()
def dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("in", "out", "ckpt")}
    os.makedirs(d["in"])
    return d


def _write(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_two_shapes_one_stream(spark, dirs):
    """Two differently-shaped CSVs land in two correctly-shaped per-key
    outputs from a single streaming query."""
    _write(os.path.join(dirs["in"], "alpha.csv"), ["a,b", "1,x", "2,y"])
    _write(os.path.join(dirs["in"], "beta.csv"), ["p,q,r", "7,m,true", "8,n,false"])

    job = DynamicSchemaCsvStream(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    job.run_to_completion()

    alpha = job.read_table("alpha")
    beta = job.read_table("beta")
    assert set(alpha.columns) == {"a", "b", "source_key"}
    assert set(beta.columns) == {"p", "q", "r", "source_key"}
    assert sorted((r.a, r.b) for r in alpha.collect()) == [("1", "x"), ("2", "y")]
    assert sorted((r.p, r.q, r.r) for r in beta.collect()) == [
        ("7", "m", "true"),
        ("8", "n", "false"),
    ]


def test_keep_one_schema_merge_across_batches(spark, dirs):
    """A later file for an existing key with a DIFFERENT (reordered) header
    parses under the key's FIRST schema (ResolveDuplicatesCombineFn
    keep-one), including across a stream RESTART: the per-key schema ledger
    is durable, so a fresh pipeline instance resolves identically."""
    _write(os.path.join(dirs["in"], "gamma.csv"), ["a,b", "1,x"])
    j1 = DynamicSchemaCsvStream(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    j1.run_to_completion()

    # same sanitized key 'gamma' via a subdirectory, conflicting header b,a
    os.makedirs(os.path.join(dirs["in"], "later"))
    _write(os.path.join(dirs["in"], "later", "gamma.csv"), ["b,a", "YY,99"])
    j2 = DynamicSchemaCsvStream(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    assert not j2._schemas  # fresh driver memory: durable keep-one only
    j2.run_to_completion()

    gamma = j2.read_table("gamma")
    assert set(gamma.columns) == {"a", "b", "source_key"}
    rows = sorted((r.a, r.b) for r in gamma.collect())
    # the later file's header row is skipped and its cells land POSITIONALLY
    # under the first-seen column names (keep-one: first header wins)
    assert rows == [("1", "x"), ("YY", "99")]
