"""String canonicalization functions F1-F5 (SURVEY §2.8).

All are composed native Catalyst expressions — no UDFs — so the whole
canonicalization chain stays inside one whole-stage-codegen span
(SURVEY §2.10): at 100 TB these run JVM-side at scan speed with zero
Python serde.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def regexp_strip_prefixes(col: Column | str, prefixes: list[str]) -> Column:
    """F1 — strip each pattern in ``prefixes`` wherever it occurs.

    Reference: ``replace(regex=['Market ','Limit ','Stop '], value='')``
    (trading212.py:115). Pandas applies the pattern list sequentially,
    so ``'Stop Limit sell'`` → ``'sell'``; a single alternation
    reproduces that because the patterns are non-overlapping literals.
    """
    pattern = "|".join(prefixes)
    return F.regexp_replace(F.col(col) if isinstance(col, str) else col, pattern, "")


def replace_exact(col: Column | str, old: str, new: str) -> Column:
    """F2 — whole-cell value replacement (NOT substring replace).

    Reference: ``replace('Dividend (Ordinary)','Div')``
    (trading212.py:116) matches the entire cell only; substring
    occurrences stay untouched (verified in SURVEY §2.8).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == old, F.lit(new)).otherwise(c)


def strict_trim(col: Column | str) -> Column:
    """F3 — trim ALL leading/trailing whitespace classes.

    Pandas ``.str.strip()`` (trading212.py:117) strips spaces, tabs and
    newlines; Spark's ``F.trim`` strips spaces only, so exact parity
    needs the regex form (SURVEY §2.8 F3).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def capitalize(col: Column | str) -> Column:
    """F4 — uppercase first char, LOWERCASE the whole rest.

    Pandas ``.str.capitalize()`` (trading212.py:117): ``'mARKET BUY'``
    → ``'Market buy'`` — the tail is lowercased, not title-cased, so
    this is NOT ``F.initcap`` (which would give ``'Market Buy'``); see
    SURVEY §2.8 F4.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.upper(F.substring(c, 1, 1)), F.lower(F.substring(c, 2, 2147483646)))
