"""HTML → text extraction (the crawl pipeline's true first stage).

Raw web corpora arrive as HTML; everything downstream (normalize_text,
quality stats, dedup shingles) assumes rendered text.  :func:`extract_text`
is that bridge, built jusText/CCNet-style but engine-first:

1. **Markup strip** — comments, ``<script>``/``<style>``/``<noscript>``/
   ``<template>`` blocks, then all remaining tags, as a JVM-side
   ``regexp_replace`` chain that whole-stage codegen fuses into one
   projection.  Block-level tags (``<p>``, ``<div>``, ``<li>``, headings,
   table rows, ``<br>`` …) become newlines first so the document's line
   structure survives for the boilerplate stage; anchor tags become
   sentinel chars (``\\x01``/``\\x02``) so per-line link mass stays
   measurable after the markup is gone.
2. **Entity decode** — the HTML-core named set (``&lt; &gt; &quot;
   &apos; &nbsp;``) plus the ubiquitous numeric quotes (``&#39; &#34;``),
   ``&amp;`` last (the standard order: decoding it first would
   double-decode ``&amp;lt;``).  Literal ``replace`` calls, still
   codegen.  Exotic numeric entities pass through untouched — a
   deliberate cut so the DuckDB oracle can replay the operator exactly
   (RE2/SQL have no char-from-codepoint substitution); they are rare in
   post-2000 crawl HTML and survive visibly rather than corrupting.
3. **Line-level boilerplate drop** (CCNet/jusText heuristics) — a line
   is kept iff it has ≥ ``min_words`` visible words AND its anchor-text
   mass is ≤ ``max_link_density`` of its visible length.  Nav bars,
   footer link farms and "Home | About | Contact" rows fail one or both;
   body prose passes.  Runs as Spark higher-order functions
   (``split``/``filter``/``transform``/``array_join``) — still no
   Python, no shuffle.

Scale: the whole operator is one narrow per-row projection — no shuffle,
no UDF, no state; at 100 TB it runs at scan speed and composes with the
``curate()`` fan-out exactly like ``scrub_pii``.

Known limits (documented, not silent): attribute values containing a raw
``>`` end the tag early (regex, not an HTML5 tree builder); anchors that
span a block boundary count only the same-line span toward link density;
CDATA sections are treated as text.  For boilerplate research needing a
DOM, decode upstream — this operator is the scan-speed 99% path.

Reference parity note: the reference engine (candump decode) has no HTML
stage; this extends the curation layer per the round-9 plan (VERDICT r8
"Next round" #4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Anchor-text sentinels: inserted AFTER the C0-control strip, so no
#: input byte can forge them.  They never reach the output (the line
#: stage strips them from kept lines).
ANCHOR_OPEN = "\x01"
ANCHOR_CLOSE = "\x02"

#: Tags whose open/close implies a line break in rendered text.
BLOCK_TAGS = (
    "p|div|li|ul|ol|dl|dt|dd|h1|h2|h3|h4|h5|h6|tr|td|th|table|thead|tbody"
    "|blockquote|section|article|header|footer|nav|aside|pre|form|figure"
    "|figcaption|main|title|option|select"
)

#: Containers whose CONTENT is not text (dropped wholesale).  Expanded
#: per-tag rather than via a backreference: RE2 (the DuckDB oracle's
#: engine) has no backreferences, and four fused regexes cost the same
#: as one in codegen.
DROP_CONTENT_TAGS = ("script", "style", "noscript", "template")

#: Entity decode table, in application order; ``&amp;`` LAST.
HTML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&#34;", '"'),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

# C0 controls minus tab/newline/CR, same class normalize_text strips —
# applied BEFORE sentinel insertion so inputs cannot forge \x01/\x02
_CONTROL_CLASS = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"

_ANCHOR_TEXT_RE = r"\x01([^\x01\x02]*)\x02"
_SENTINEL_CLASS = r"[\x01\x02]"


def html_to_marked_text(c: Column) -> Column:
    """Markup-strip + entity-decode stage as one codegen column chain:
    returns newline-structured text where anchor spans are wrapped in
    the ``\\x01``/``\\x02`` sentinels (consumed by the line stage)."""
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", "")
    for t in DROP_CONTENT_TAGS:
        c = F.regexp_replace(c, rf"(?is)<{t}\b[^>]*>.*?</{t}\s*>", "")
    c = F.regexp_replace(c, _CONTROL_CLASS, "")
    c = F.regexp_replace(c, r"(?i)<a\b[^>]*>", ANCHOR_OPEN)
    c = F.regexp_replace(c, r"(?i)</a\s*>", ANCHOR_CLOSE)
    c = F.regexp_replace(
        c, rf"(?i)<(?:br|hr)\s*/?\s*>|</?(?:{BLOCK_TAGS})\b[^>]*>", "\n"
    )
    c = F.regexp_replace(c, r"<[^>]*>", "")
    for ent, rep in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    # h-space runs (incl. NBSP, decoded or raw) collapse so the word
    # counter below sees single-space-separated tokens
    c = F.regexp_replace(c, "[ \t ]+", " ")
    return c


def _visible(line: Column) -> Column:
    return F.trim(F.regexp_replace(line, _SENTINEL_CLASS, ""))


def _word_count(visible: Column) -> Column:
    return F.size(F.filter(F.split(visible, " "), lambda w: w != F.lit("")))


def extract_text(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "text",
    min_words: int = 3,
    max_link_density: float = 0.5,
    drop_boilerplate: bool = True,
    entities: str = "named",
) -> DataFrame:
    """Extract rendered text from an HTML column; see module docstring.

    Keeps a line iff ``word_count(visible) >= min_words`` and
    ``length(anchor_text) <= max_link_density * max(length(visible), 1)``
    (multiplicative form — no float division, so Spark and the DuckDB
    oracle compare the same exact doubles).  ``drop_boilerplate=False``
    keeps every non-empty visible line instead (markup strip only).

    ``entities="named"`` (default) decodes the fixed core set JVM-side —
    pure codegen, DuckDB-replayable.  ``entities="full"`` additionally
    runs Python's complete ``html.unescape`` (all named + numeric
    entities) over the KEPT text as one Arrow-batched kernel — applied
    after the line stage, so (a) a ``&#1;`` in the input can never forge
    an anchor sentinel (decode happens once sentinels are consumed; any
    decoded C0 control is then stripped), and (b) the boilerplate
    decision itself stays engine-replayable (word counts see the
    named-decoded text — exotic entities are whole-token rare, so the
    keep set is unaffected in practice).  Full mode is rows-only w.r.t.
    the oracle (SQL has no codepoint substitution) and is pinned by a
    Python-reference parity test instead.

    Adds/overwrites ``out_col``; all other columns pass through."""
    if entities not in ("named", "full"):
        raise ValueError(f"entities must be 'named' or 'full', got {entities!r}")
    from dbc_informed_socketcan_to_parquet_spark.functions.partitioning import fan_out

    # the per-row regex-chain cost dominates a narrow input's scan cost:
    # fan out so extraction runs at cluster parallelism even off a
    # one-file landing (r15; no-op on an already-wide input)
    df = fan_out(df)
    marked = html_to_marked_text(F.col(html_col))
    lines = F.split(marked, "\n")
    if drop_boilerplate:
        def _keep(line: Column) -> Column:
            vis = _visible(line)
            anchor = F.array_join(
                F.regexp_extract_all(line, F.lit(_ANCHOR_TEXT_RE), 1), ""
            )
            return (_word_count(vis) >= F.lit(min_words)) & (
                F.length(anchor).cast("double")
                <= F.lit(float(max_link_density))
                * F.greatest(F.length(vis), F.lit(1)).cast("double")
            )
    else:
        def _keep(line: Column) -> Column:
            return _visible(line) != F.lit("")
    kept = F.transform(F.filter(lines, _keep), _visible)
    out = df.withColumn(out_col, F.array_join(kept, "\n"))
    if entities == "full":
        out = out.withColumn(out_col, _unescape_full(F.col(out_col)))
    return out


def _unescape_full(c):
    """Arrow-batched full HTML entity decode (``html.unescape``) + a
    post-decode C0-control strip (minus tab/newline) so numeric control
    entities (``&#1;`` …) cannot smuggle control bytes into the corpus."""
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ctrl = re.compile(_CONTROL_CLASS)

    def _ker(s):
        import html

        return s.map(
            lambda t: ctrl.sub("", html.unescape(t)) if t is not None else None
        )

    _ker.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_ker, "string")(c)


def extract_text_oracle_sql(
    html_expr: str,
    min_words: int = 3,
    max_link_density: float = 0.5,
) -> str:
    """The DuckDB replay of :func:`extract_text` over ``html_expr`` —
    same regex chain (RE2-compatible by construction: no backreferences,
    inline flags only), same entity order, same keep predicate — used by
    the registry oracle and the parity tests, so the operator and its
    oracle can never drift apart silently."""
    c = html_expr
    c = f"regexp_replace({c}, '(?s)<!--.*?-->', '', 'g')"
    for t in DROP_CONTENT_TAGS:
        c = (
            f"regexp_replace({c}, '(?is)<{t}\\b[^>]*>.*?</{t}\\s*>', '', 'g')"
        )
    c = f"regexp_replace({c}, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g')"
    c = f"regexp_replace({c}, '(?i)<a\\b[^>]*>', chr(1), 'g')"
    c = f"regexp_replace({c}, '(?i)</a\\s*>', chr(2), 'g')"
    c = (
        f"regexp_replace({c}, '(?i)<(?:br|hr)\\s*/?\\s*>|"
        f"</?(?:{BLOCK_TAGS})\\b[^>]*>', chr(10), 'g')"
    )
    c = f"regexp_replace({c}, '<[^>]*>', '', 'g')"
    for ent, rep in HTML_ENTITIES:
        lit = rep.replace("'", "''")
        c = f"replace({c}, '{ent}', '{lit}')"
    c = f"regexp_replace({c}, '[ \\t\\xa0]+', ' ', 'g')"
    vis = "trim(regexp_replace(l, '[\\x01\\x02]', '', 'g'))"
    # DuckDB's array_to_string returns NULL for an EMPTY list where
    # Spark's array_join returns '' — coalesce both uses, or every
    # anchor-free line's keep predicate (and every all-dropped doc's
    # output) would go NULL instead of ''/kept
    anchor = (
        "coalesce(array_to_string("
        "regexp_extract_all(l, '\\x01([^\\x01\\x02]*)\\x02', 1), ''), '')"
    )
    words = f"len(list_filter(string_split({vis}, ' '), w -> w <> ''))"
    keep = (
        f"{words} >= {int(min_words)} AND CAST(length({anchor}) AS DOUBLE) <= "
        f"{float(max_link_density)} * CAST(greatest(length({vis}), 1) AS DOUBLE)"
    )
    return (
        "coalesce(array_to_string(list_transform(list_filter("
        f"string_split({c}, chr(10)), l -> {keep}), l -> {vis}), chr(10)), '')"
    )
