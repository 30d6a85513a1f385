"""Tokenizer expressions — the engine's contract for "a word".

The reference tokenizes with ``re.compile(r"[A-Za-z']+")`` then lowercases
(reference worker/worker.py:7,18): ASCII letters + apostrophe; digits,
underscores and accented letters are separators; the pattern cannot span a
newline, so line-at-a-time (reference) and whole-text (here) tokenization are
equivalent.  Lowercasing after the ASCII-only match means Python ``str.lower``,
Spark ``lower`` and DuckDB ``lower`` all agree (SURVEY.md OP-6).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Exactly the reference's pattern (worker/worker.py:7).
WORD_REGEX = r"[A-Za-z']+"
WORD_PATTERN = re.compile(WORD_REGEX)


def tokenize_column(text: Column | str) -> Column:
    """Array-of-lowercase-words column (JVM-side, codegen'd — no Python UDF).

    ``regexp_extract_all`` runs inside whole-stage codegen; `lower` on the
    string before extraction is safe because the pattern is case-insensitive
    over letters.
    """
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(col), F.lit(WORD_REGEX), 0)


def tokenize_line(line: str) -> list[str]:
    """Driver/RDD-side tokenizer — identical semantics to the reference's map
    body (worker/worker.py:17-18)."""
    return [w.lower() for w in WORD_PATTERN.findall(line)]
