"""Scalar string/cast functions (SURVEY.md §2.8, X1-X17) as native Columns.

Every helper returns a Column expression (JVM-side, codegen-friendly); none
is a Python UDF. Reference citations per function below.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def slugify(col: Column | str) -> Column:
    """X1 — lowercase + ALL spaces→dashes.

    Reference ``src/from-ground-up.js:201-203`` uses JS ``String.replace``
    which only replaces the first space; the bug ledger (SURVEY.md §7) pins
    replace-all as the intended semantics (only 'Rescue Cache' has a space in
    the reference data, so results agree there).
    """
    return F.regexp_replace(F.lower(F.col(col) if isinstance(col, str) else col), " ", "-")


def reverse_str(col: Column | str) -> Column:
    """X2 — character reversal; KML colors are ``aabbggrr``, styles are
    authored ``rrggbbaa`` (reference ``src/from-ground-up.js:688-695``)."""
    return F.reverse(F.col(col) if isinstance(col, str) else col)


def split_coords(col: Column | str) -> Column:
    """X3 — ``'lon, lat' -> array`` (reference ``src/from-ground-up.js:225``)."""
    return F.split(F.col(col) if isinstance(col, str) else col, ", ")


def join_coords(col: Column | str) -> Column:
    """X4 — coordinate array → ``'lon, lat'`` key string
    (reference ``src/from-ground-up.js:228-230``)."""
    return F.array_join(F.col(col) if isinstance(col, str) else col, ", ")


def to_double(col: Column | str) -> Column:
    """X5 — string→double (reference ``Number.parseFloat``,
    ``src/from-ground-up.js:271``)."""
    return (F.col(col) if isinstance(col, str) else col).cast("double")


def to_int(col: Column | str) -> Column:
    """X6 — string→int (reference ``parseInt(.., 10)``,
    ``src/make-recipe.js:9-10``)."""
    return (F.col(col) if isinstance(col, str) else col).cast("int")


def unescape_quotes(col: Column | str) -> Column:
    """X11 — un-escape ``\\'`` in warning text before rendering
    (reference ``src/from-ground-up.js:510-514``)."""
    return F.regexp_replace(F.col(col) if isinstance(col, str) else col, r"\\'", "'")


#: email-ish pattern kept deliberately simple and anchored on word chars so
#: the Spark (Java regex) and DuckDB (RE2) engines agree byte-for-byte.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONG_NUM_RE = r"[0-9]{7,}"


def redact(col: Column | str) -> Column:
    """Training-data scrubbing: replace email addresses with ``[EMAIL]`` and
    7+-digit runs (phone/account numbers) with ``[NUM]``. Pure expression —
    runs inside codegen, no Python in the hot path."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.regexp_replace(c, EMAIL_RE, "[EMAIL]"), LONG_NUM_RE, "[NUM]")


def filename_stem(col: Column | str) -> Column:
    """X16 — ``file.split('.')[0]`` (reference ``src/make-recipe.js:37``)."""
    return F.split(F.col(col) if isinstance(col, str) else col, r"\.").getItem(0)


def not_blank(col: Column | str) -> Column:
    """F5 — non-blank predicate (reference ``src/make-recipe.js:4-6``)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & (F.trim(c) != "")


def validate_in(col: Column | str, allowed: list, default) -> Column:
    """F4 — membership validation with default: ``returnIfIn(v, xs) || d``
    (reference ``src/from-ground-up.js:934``, ``:962-964``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isin(allowed), c).otherwise(F.lit(default))


def coalesce_fallback(*cols: Column) -> Column:
    """X15 — ``a || b`` fallback chains (reference
    ``src/from-ground-up.js:858``, ``:66``)."""
    return F.coalesce(*cols)


def json_quote(col: Column | str) -> Column:
    """Wrap a string value in JSON quotes with minimal escaping (backslash,
    double-quote, newline) — used when documents are assembled with string
    concatenation so Spark and the DuckDB oracle produce identical bytes."""
    c = F.col(col) if isinstance(col, str) else col
    escaped = F.regexp_replace(c, r"\\", r"\\\\")
    escaped = F.regexp_replace(escaped, '"', '\\\\"')
    escaped = F.regexp_replace(escaped, "\n", "\\\\n")
    return F.concat(F.lit('"'), escaped, F.lit('"'))
