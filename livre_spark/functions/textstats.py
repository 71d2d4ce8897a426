"""Text-analysis columns for the training-data pipeline.

Every builder returns a JVM-side ``Column`` (whole-stage codegen, no
Python) and has an exact ANSI-SQL twin used by the DuckDB oracle in
``__spark_entry__.py`` - see ``oracle_sql()`` there.  Keeping both sides
mechanically parallel is what makes these oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small per-language stopword probes for the n-gram language heuristic
LANG_PROBES: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "fr": [" le ", " et ", " les "],
    "de": [" der ", " und ", " die "],
}

PUNCT_CLASS = r"[.,!?;:]"


def token_count(text: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+")))


def occurrences(text: Column, probe: str) -> Column:
    """Occurrence count of a literal substring (portable replace trick)."""
    return ((F.length(text) - F.length(F.replace(text, F.lit(probe))))
            / F.lit(len(probe))).cast("long")


def punct_count(text: Column) -> Column:
    return (F.length(text)
            - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))).cast("long")


def quality_score(text: Column) -> Column:
    """Toy quality heuristic: longer docs with moderate punctuation and a
    healthy mean word length score higher.  Deterministic arithmetic only
    (no UDF) so the oracle can reproduce it bit-for-bit after rounding."""
    n_chars = F.length(text).cast("double")
    n_tokens = token_count(text).cast("double")
    n_punct = punct_count(text).cast("double")
    mean_word = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    return F.round(
        F.least(n_chars / F.lit(1000.0), F.lit(1.0)) * F.lit(0.5)
        + F.least(mean_word / F.lit(10.0), F.lit(1.0)) * F.lit(0.3)
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))) * F.lit(0.2),
        6)


def lang_guess(text: Column) -> Column:
    """Argmax of stopword-probe hits; deterministic tie-break en > fr > de."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    scores = {lang: sum_cols([occurrences(padded, p) for p in probes])
              for lang, probes in LANG_PROBES.items()}
    en, fr, de = scores["en"], scores["fr"], scores["de"]
    return (F.when((en >= fr) & (en >= de), F.lit("en"))
            .when(fr >= de, F.lit("fr"))
            .otherwise(F.lit("de")))


def sum_cols(cols: list[Column]) -> Column:
    acc = cols[0]
    for c in cols[1:]:
        acc = acc + c
    return acc


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 hex (portable to every SQL engine)."""
    return F.md5(text)


# BPE-ish pre-tokenizer regex (GPT-2 style, reduced to the Java/RE2
# common subset: no lookahead): optional leading space + letter run /
# digit run / punct run, else whitespace run
BPE_PATTERN = r" ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+"


def bpe_token_count(text: Column) -> Column:
    """Token count under the BPE-ish pre-tokenizer regex - a closer
    proxy for LLM token budgets than whitespace splitting (digits and
    punctuation tokenize separately).  DuckDB twin:
    ``len(regexp_extract_all(text, BPE_PATTERN))``."""
    return F.regexp_count(text, F.lit(BPE_PATTERN)).cast("long")


ROLL_BASE = 131
ROLL_MOD = (1 << 31) - 1


def rolling_fingerprint(text: Column) -> Column:
    """Polynomial rolling hash (Rabin-Karp) over the document's
    characters: h = fold((acc * B + codepoint) % M).  Unlike md5 this is
    incrementally updatable over windows - the primitive under winnowing
    /shingle fingerprint schemes.  Integer-only (B*acc < 2^39, safe under
    ANSI overflow checks); DuckDB twin via list_reduce over
    ``string_split(text, '')`` codepoints."""
    return F.aggregate(
        F.split(text, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: F.pmod(acc * F.lit(ROLL_BASE) + F.ascii(ch),
                               F.lit(ROLL_MOD)))


def md5_long(col: Column, salt: str = "") -> Column:
    """First 15 hex digits of md5 as a non-negative bigint.

    The portable 60-bit hash used by minhash/simhash - DuckDB twin:
    ``('0x' || substr(md5(salt || s), 1, 15))::BIGINT``.
    """
    target = F.concat(F.lit(salt), col) if salt else col
    return F.conv(F.substring(F.md5(target), 1, 15), 16, 10).cast("long")
