"""HTML main-content extraction - boilerplate strip + DOM heuristics.

The north rule's pipeline covers "HTML boilerplate strip, PDF/layout
parse, DOM heuristics"; the reference handles only the PDF axis, so this
module is engine-native.  Two levels:

- ``strip_tags``: plain tag strip (script/style/noscript + comments
  removed, tags dropped, common entities decoded, whitespace collapsed).
- ``main_content``: readability-lite block heuristic.  The document is
  split at block-level closing tags; a block is *content* when its
  non-anchor text is long enough AND anchor text does not dominate
  (integer cross-multiplication, no float ratios).  Kept blocks join
  with newlines.  This is the classic text-density/link-density family
  (Readability, boilerpipe) reduced to a deterministic expression.

Everything is built from ``regexp_replace`` / ``split`` / higher-order
array functions - pure JVM Column expressions, whole-stage codegen, no
Python in the hot path - and every regex is RE2-compatible (inline
``(?is)`` flags, no backreferences) so the DuckDB oracle can run the
byte-identical pipeline.  The pattern constants below are shared by the
Spark expressions and the generated oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# RE2-compatible (Spark uses java.util.regex, DuckDB uses RE2 - these
# patterns stay in the common subset: no backreferences, inline flags)
DROP_BLOCKS = [
    r"(?is)<script\b.*?</script\s*>",
    r"(?is)<style\b.*?</style\s*>",
    r"(?is)<noscript\b.*?</noscript\s*>",
    r"(?s)<!--.*?-->",
]
BLOCK_SPLIT = (r"(?is)</(?:p|div|li|h1|h2|h3|h4|h5|h6|td|tr|ul|ol|table|"
               r"article|section|blockquote)\s*>")
ANCHOR = r"(?is)<a\b.*?</a\s*>"
TAG = r"<[^>]*>"
WS = r"\s+"
ENTITIES = [("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
            ("&quot;", "\""), ("&#39;", "'"), ("&apos;", "'")]

MIN_CHARS = 25          # non-anchor text below this is boilerplate
# anchor_chars * ANCHOR_DEN <= total_chars * ANCHOR_NUM  (ratio <= 1/2)
ANCHOR_NUM, ANCHOR_DEN = 1, 2


def _preclean(html: Column) -> Column:
    out = html
    for pat in DROP_BLOCKS:
        out = F.regexp_replace(out, pat, " ")
    return out


def _block_text(block: Column) -> Column:
    """Tags -> spaces, entities decoded, whitespace collapsed, trimmed."""
    out = F.regexp_replace(block, TAG, " ")
    for src, dst in ENTITIES:
        out = F.replace(out, F.lit(src), F.lit(dst))
    return F.trim(F.regexp_replace(out, WS, " "))


def strip_tags(html: Column) -> Column:
    """Whole-document text: everything except script/style/comments."""
    return _block_text(_preclean(html))


def main_content(html: Column) -> Column:
    """Readability-lite main content (see module docstring).

    Each block's cleaned text is computed ONCE into a struct that both
    the keep rule and the final join consume; the previous shape ran
    ``_block_text`` (a 9-regex/replace chain) twice per block in the
    filter and a third time per kept block in the output transform.
    The keep rule reads the same lengths off the struct, so results are
    byte-identical.
    """
    blocks = F.split(_preclean(html), BLOCK_SPLIT)
    scored = F.transform(
        blocks,
        lambda b: F.struct(
            _block_text(b).alias("t"),
            F.length(_block_text(F.regexp_replace(b, ANCHOR, " ")))
            .alias("noa")))

    def keep(s: Column) -> Column:
        n_all = F.length(s["t"])
        anchor_chars = n_all - s["noa"]
        return (s["noa"] >= F.lit(MIN_CHARS)) & \
               (anchor_chars * F.lit(ANCHOR_DEN)
                <= n_all * F.lit(ANCHOR_NUM))

    kept = F.filter(scored, keep)
    return F.array_join(F.transform(kept, lambda s: s["t"]), "\n")


def looks_like_html(html_col: str = "html") -> Column:
    """Cheap JVM predicate for routing non-PDF crawl rows: the decoded
    prefix contains an HTML opening within the first 256 bytes."""
    head = F.lower(F.decode(
        F.expr(f"substring({html_col}, 1, 256)"), "ISO-8859-1"))
    return head.contains("<html") | head.contains("<!doctype html")


# --- DuckDB oracle twins (generated from the same constants) ---------------


def _sql_preclean(expr: str) -> str:
    out = expr
    for pat in DROP_BLOCKS:
        out = f"regexp_replace({out}, '{pat}', ' ', 'g')"
    return out


def _sql_block_text(expr: str) -> str:
    out = f"regexp_replace({expr}, '{TAG}', ' ', 'g')"
    for src, dst in ENTITIES:
        d = dst.replace("'", "''")
        out = f"replace({out}, '{src}', '{d}')"
    return f"trim(regexp_replace({out}, '{WS}', ' ', 'g'))"


def sql_strip_tags(expr: str) -> str:
    return f"coalesce({_sql_block_text(_sql_preclean(expr))}, '')"


def sql_main_content(expr: str) -> str:
    blocks = f"string_split_regex({_sql_preclean(expr)}, '{BLOCK_SPLIT}')"
    n_all = f"length({_sql_block_text('b')})"
    n_noa = ("length(" + _sql_block_text(
        f"regexp_replace(b, '{ANCHOR}', ' ', 'g')") + ")")
    keep = (f"({n_noa}) >= {MIN_CHARS} AND "
            f"(({n_all}) - ({n_noa})) * {ANCHOR_DEN}"
            f" <= ({n_all}) * {ANCHOR_NUM}")
    return (f"coalesce(array_to_string(list_transform(list_filter({blocks}, "
            f"b -> {keep}), b -> {_sql_block_text('b')}), chr(10)), '')")
