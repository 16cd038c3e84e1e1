"""F9 report-layer markup sanitize/escape (the last unimplemented §2
row): column re-expressions of the reference's display-path string
munging (/root/reference/log_parser.py:78-82 sanitize_text,
:109-110 escape_tree_text, :112-118 escape_markup — exact replace
chains, order preserved, since escape_markup's un-escape-then-escape
sequence is order-sensitive).

All JVM-side (translate/replace) — no UDFs."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _chain(col: Column, *pairs: tuple[str, str]) -> Column:
    for search, repl in pairs:
        col = F.replace(col, F.lit(search), F.lit(repl))
    return col


def sanitize_text(col: Column) -> Column:
    """Strip ``[`` and ``]`` (log_parser.py:78-82)."""
    return F.translate(col, "[]", "")


def escape_tree_text(col: Column) -> Column:
    """``<`` → ``&lt;``, ``>`` → ``&gt;`` (log_parser.py:109-110)."""
    return _chain(col, ("<", "&lt;"), (">", "&gt;"))


def escape_markup(col: Column) -> Column:
    """Un-escape HTML entities then escape square brackets for markup
    rendering — order-sensitive chain (log_parser.py:112-118)."""
    return _chain(
        col,
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&amp;", "&"),
        ("[", "&#91;"),
        ("]", "&#93;"),
    )
