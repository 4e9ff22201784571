"""Stopword profiles for the n-gram/stopword language-ID heuristic.

Pure data (no ray / pandas imports) so both the engine operator
(pipelines/textops.detect_lang) and the driver's DuckDB oracle twin
(__ray_entry__.oracle_sql) can build from the SAME word lists — the SQL
CASE chain must mirror the Python argmax precedence bit-for-bit.

Profile order matters: ties resolve to the FIRST profile in PROFILE_ORDER
(Python max() keeps the first maximum; the SQL CASE chain checks in the
same order).
"""

from __future__ import annotations

PROFILE_ORDER = ("en", "es", "de", "fr")

PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the a an and or of to in is it for on with as by at from that this "
        "be are was".split()
    ),
    "es": frozenset(
        "el la los las de en y que un una es por con para no se del al lo "
        "como mas pero sus le ya".split()
    ),
    "de": frozenset(
        "der die das und ist von mit den im nicht ein eine als auch es an "
        "werden aus er hat dass sie nach wird bei".split()
    ),
    "fr": frozenset(
        "le la les des et un une est en que pour dans qui au du sur ne pas "
        "ce une par plus avec tout".split()
    ),
}

# decision thresholds (shared by engine and oracle)
ASCII_MIN = 0.97     # below this the doc is not a latin-script candidate
SCORE_MIN = 0.03     # a profile must clear this stopword-hit ratio
CJK_MIN = 0.05       # CJK codepoint ratio that flags 'zh'
SHORT_DOC_WORDS = 5  # short ascii docs default to 'en'
