"""Line-parsing column expressions for the plaintext reading format
``"{unix_ts} {metric_name} {value}"``.

The reference parses this format in TWO deliberately different places
(SURVEY.md §2.9) and bronze stores the *raw line*, so both semantics run
on real data:

1. **Ingest gate** (API path, reference src/api/routes/data.py:71-87):
   split on any whitespace run, exactly 3 tokens, ``int(ts) >= 0``,
   ``name[0].isalpha()``, ``float(value)`` accepts sci-notation /
   leading-dot / inf / nan.
2. **Silver transform** (SQL path, reference
   dbt/models/staging/stg_readings.sql:48-99): ``SPLIT_PART`` on a
   single space, regex validation ``^\\d+$`` / ``^[A-Za-z]`` /
   ``^-?\\d+\\.?\\d*$`` — stricter on numerics, looser on nothing.

Both are pure column expressions — no Python UDFs — so they stay inside
whole-stage codegen at 100 TB scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- Silver (SQL-path) semantics: P1 tokenize + P14 regex validation ---

#: Postgres `~ '^\d+$'` (stg_readings.sql:67) — all-digits timestamp.
TS_REGEX = r"^\d+$"
#: Postgres `~ '^[A-Za-z]'` (stg_readings.sql:69) — ASCII-letter first char.
NAME_REGEX = r"^[A-Za-z]"
#: Postgres `~ '^-?\d+\.?\d*$'` (stg_readings.sql:72) — no sci-notation,
#: no leading dot; trailing dot allowed.
VALUE_REGEX = r"^-?\d+\.?\d*$"


def split_token(line: Column, k: int) -> Column:
    """``SPLIT_PART(raw_line, ' ', k)`` — single-space split, 1-based k
    (reference stg_readings.sql:48-50). A double space yields an empty
    token, which then fails validation — intentional parity."""
    return F.split_part(line, F.lit(" "), F.lit(k))


def silver_tokens(line: Column) -> tuple[Column, Column, Column]:
    """(timestamp_str, metric_name, value_str) under SQL-path semantics."""
    return split_token(line, 1), split_token(line, 2), split_token(line, 3)


def silver_valid(ts_str: Column, name: Column, value_str: Column) -> Column:
    """Conjunction of the three P14 validity predicates
    (stg_readings.sql:66-72,96-99). Invalid rows are silently dropped."""
    return ts_str.rlike(TS_REGEX) & name.rlike(NAME_REGEX) & value_str.rlike(VALUE_REGEX)


def nonempty_line(line: Column) -> Column:
    """F1 guard: ``raw_line IS NOT NULL AND LENGTH(TRIM(raw_line)) > 0``
    (stg_readings.sql:52-55)."""
    return line.isNotNull() & (F.length(F.trim(line)) > 0)


# --- Ingest-gate (API-path) semantics: P2 tokenize + Python-float rules ---

#: Matches what Python ``float()`` accepts, case-insensitively:
#: decimal/scientific notation, leading/trailing dot, inf/infinity/nan,
#: with optional sign. (reference data.py:80 accepts all of these.)
PYFLOAT_REGEX = r"(?i)^[+-]?((\d+\.?\d*|\.\d+)(e[+-]?\d+)?|inf(inity)?|nan)$"
#: Python ``int()`` accepts an optional sign; the gate then requires >= 0,
#: so "+123" passes but "-1" and "1.5" fail (data.py:78,82).
PYINT_NONNEG_REGEX = r"^\+?\d+$"


def gate_tokens(line: Column) -> Column:
    """API-path tokenize: ``line.strip().split()`` — any whitespace run
    (reference data.py:73). Returns an array column.

    Python ``strip()`` removes ALL whitespace (tabs included) while
    Spark/Postgres ``trim`` removes only spaces — so the strip is a
    regex, not ``F.trim``."""
    stripped = F.regexp_replace(line, r"^\s+|\s+$", "")
    return F.split(stripped, r"\s+")


def gate_valid(line: Column) -> Column:
    """Whole-line validity under ingest-gate semantics
    (parse_line, reference data.py:71-87): exactly 3 whitespace-separated
    tokens, non-negative integer ts, name starting with a letter (the
    reference uses Unicode ``str.isalpha``; we canonicalize to the
    ASCII-letter check and pin the divergence in tests per SURVEY.md
    §2.9.3), value parseable as a Python float."""
    toks = gate_tokens(line)
    return (
        (F.size(toks) == 3)
        & toks[0].rlike(PYINT_NONNEG_REGEX)
        & toks[1].rlike(NAME_REGEX)
        & toks[2].rlike(PYFLOAT_REGEX)
    )


def is_blank(line: Column) -> Column:
    """Blank/whitespace-only lines inside a POST body are skipped, not
    errors (reference data.py:54-55). Python-``strip()`` semantics: any
    whitespace counts, hence ``\\s*`` and not ``trim``."""
    return line.isNull() | line.rlike(r"^\s*$")
