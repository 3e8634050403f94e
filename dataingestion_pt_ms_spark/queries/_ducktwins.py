"""Shared DuckDB twin expressions for the text operators.

These strings mirror ``functions.textfns`` (``tokens`` / ``shingles``)
exactly; every oracle that tokenizes or shingles must use THESE so a
Spark-side tokenizer change forces exactly one matching edit here —
duplicated copies were flagged as an oracle-drift hazard (ADVICE r01).
"""

from __future__ import annotations

# DuckDB twin of functions.textfns.tokens (lower + trim + \s+ split)
DTOKS = "string_split_regex(lower(trim(text)), '\\s+')"

# DuckDB twin of functions.textfns.shingles (k=3, distinct, 1-based index)
DSHINGLES = (
    "list_distinct(CASE WHEN len(TOKS) >= 3 THEN "
    "list_transform(generate_series(1, len(TOKS) - 2), "
    "i -> concat_ws(' ', TOKS[i], TOKS[i+1], TOKS[i+2])) "
    "ELSE [] END)".replace("TOKS", DTOKS)
)
