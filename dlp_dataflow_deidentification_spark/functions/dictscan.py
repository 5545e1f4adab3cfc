"""Large-dictionary detector path (round-5 verdict ask #2).

``infotypes.dictionary`` renders a CustomInfoType.Dictionary to ONE
word-boundary alternation regex (longest word first). That is exact and
fast for small word lists, but the regex engine tries alternatives
per position, so matching cost grows ~linearly with the dictionary size at
EVERY text position — a 10k-term denylist degrades quadratically-ish in
practice (compile cost per task on top). This module adds the scalable
twin: a trie scanner (Aho-Corasick-style set matching specialised to the
rendered regex's exact semantics) whose per-position cost is bounded by
the longest dictionary term, independent of the term COUNT.

Semantics replicated exactly (pinned by tests against both Python ``re``
and Spark's JVM ``regexp_extract_all`` on the rendered pattern):

- word boundary ``\\b`` at match start and end, with the ASCII word-char
  class ``[A-Za-z0-9_]`` — the common Java/RE2 subset the whole detector
  registry is written in (module docstring of ``infotypes``);
- at each position the LONGEST term wins (the renderer sorts the
  alternation longest-first), and when the longest candidate fails its
  trailing boundary the next-longest is tried (regex backtracking);
- matches are non-overlapping, scanning resumes at match end;
- case-sensitive, raw terms (the renderer escapes regex metacharacters,
  so the regex matches the literal term text — exactly what the trie
  stores).

``dictionary_findings`` picks the path by dictionary size: at or below
``DICTIONARY_SCAN_CROSSOVER`` distinct terms it defers to the rendered-
regex ``inspect`` path (native JVM, zero Python — the right choice for
template-sized lists, and the one the declared driver queries use); above
it, the trie scanner runs as an Arrow-batched pandas UDF.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from .infotypes import dictionary

# measured crossover band: the JVM alternation is faster below a few
# hundred terms (codegen'd regex, no Python boundary); the trie scanner
# wins above it and is the only sub-quadratic option at 10k+ terms
DICTIONARY_SCAN_CROSSOVER = 512

_WORD = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_"
)
_TERM = ""  # terminal marker key inside trie nodes (no term contains "")


def _build_trie(words) -> dict:
    root: dict = {}
    for w in sorted(set(words)):
        if not w:
            raise ValueError("dictionary terms must be non-empty")
        node = root
        for ch in w:
            node = node.setdefault(ch, {})
        node[_TERM] = len(w)
    return root


def scan_text(text: str, trie: dict) -> list:
    """All dictionary matches of ``text`` under the rendered-regex
    semantics (leftmost, longest-per-position with trailing-boundary
    backtracking, non-overlapping, \\b-delimited)."""
    out = []
    n = len(text)
    i = 0
    prev_w = False  # is_word(text[i-1]); False out of range
    while i < n:
        cur_w = text[i] in _WORD
        if prev_w == cur_w:
            # no \b between i-1 and i: no match can start here
            prev_w = cur_w
            i += 1
            continue
        node = trie
        lengths = []
        j = i
        while j < n:
            nxt = node.get(text[j])
            if nxt is None:
                break
            node = nxt
            j += 1
            if _TERM in node:
                lengths.append(j - i)
        matched = False
        for L in reversed(lengths):  # longest candidate first
            end = i + L
            end_left = text[end - 1] in _WORD
            end_right = end < n and text[end] in _WORD
            if end_left != end_right:
                out.append(text[i:end])
                i = end
                prev_w = end_left
                matched = True
                break
        if not matched:
            prev_w = cur_w
            i += 1
    return out


def scan_matches(col: Column, words) -> Column:
    """array<string> of dictionary matches — drop-in for
    ``regexp_extract_all(col, dictionary(...).pattern, 0)`` at large
    dictionary sizes. NULL text → NULL (regexp_extract_all parity is the
    caller's coalesce, same as the inspect plan)."""
    trie = _build_trie(words)

    @F.pandas_udf(ArrayType(StringType()))
    def _scan(s: pd.Series) -> pd.Series:
        return s.map(lambda t: None if t is None else scan_text(t, trie))

    return _scan(col)


def dictionary_findings(
    df: DataFrame,
    name: str,
    words,
    text_columns,
    id_columns=(),
    likelihood: str = "LIKELY",
    crossover: int = DICTIONARY_SCAN_CROSSOVER,
) -> DataFrame:
    """Findings table for ONE dictionary detector — identical schema and
    rows to ``inspect(df, [dictionary(name, words, likelihood)], ...)`` —
    with the implementation chosen by dictionary size (see module doc)."""
    if len(set(words)) <= crossover:
        from ..operators.inspect import inspect

        return inspect(
            df,
            [dictionary(name, words, likelihood)],
            text_columns,
            id_columns=id_columns,
        )
    def _tag(colname: str):
        # single-arg lambda (PySpark HOFs dispatch on arity: a 2-arg lambda
        # would receive the element INDEX as its second argument)
        return lambda q: F.struct(
            F.lit(colname).alias("field_id"),
            F.lit(name).alias("info_type_name"),
            F.lit(likelihood).alias("likelihood"),
            q.alias("quote"),
        )

    per = []
    for colname in text_columns:
        matches = scan_matches(F.coalesce(F.col(colname), F.lit("")), words)
        per.append(F.transform(matches, _tag(colname)))
    findings = F.flatten(F.array(*per))
    return df.select(
        *[F.col(c) for c in id_columns], F.explode(findings).alias("f")
    ).select(*id_columns, "f.*")
