"""Python user-defined table functions (Spark 4 UDTF surface).

Completes the package's Python-extension coverage (SURVEY.md §2.7): the
catalog already exercises pandas_udf / mapInPandas (Arrow scalar + map
passes), applyInPandasWithState (stateful streaming), the Python
DataSource API (batch + streaming sources), and applyInArrow (grouped
Arrow passes, plans/pyext.py) — UDTFs are the remaining sanctioned hatch:
one input row → many output rows, with Python generator semantics, usable
from SQL via ``LATERAL``.

Policy unchanged from §2.7: native-first. Row expansion that a built-in
expresses (explode/posexplode/sequence) stays JVM-side; a UDTF is the
tool when per-row expansion logic is genuinely imperative. The catalog
query (plans/pyext.py:udtf_ngram_topk) deliberately picks an expansion
the repo ALSO implements natively (operators/dedup.py:word_shingles) so
the UDTF path is pinned row-for-row against the native path in
tests/test_pyext.py — API-surface coverage with a built-in referee.

All handlers are declared with ``useArrow=True``: the executor streams
Arrow batches, not pickled rows (the plan shows ArrowEvalPythonUDTF, the
UDTF analog of the sanctioned ArrowEvalPython stages).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, ngram string", useArrow=True)
class WordNGrams:
    """Word n-gram expander: one row per n consecutive space-separated
    tokens.

    ``eval`` is a generator — each yielded tuple becomes an output row,
    executed per Arrow batch on the executor holding the input partition
    (no shuffle introduced by the UDTF itself). Tokenization is a
    SINGLE-SPACE split (``text.split(" ")``) to match the native path
    ``operators/dedup.py:word_shingles`` (``F.split(text, " ")``)
    exactly: on runs of whitespace/tabs both paths emit empty tokens, so
    the row-for-row parity pinned in tests/test_pyext.py holds for any
    text, not just single-spaced corpora. (Java's split with the default
    limit=-1 keeps trailing empty strings, as does Python's
    ``split(" ")`` — the two agree on edge whitespace too.)
    """

    def eval(self, text: str, n: int):  # noqa: D102 — contract above
        if text is None or n is None or n <= 0:
            return
        toks = text.split(" ")
        for i in range(len(toks) - n + 1):
            yield i, " ".join(toks[i : i + n])


def register_udtfs(spark) -> None:
    """Idempotently register the package's UDTFs for SQL use."""
    spark.udtf.register("word_ngrams", WordNGrams)
