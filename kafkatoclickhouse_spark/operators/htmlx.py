"""HTML / boilerplate text extraction ([EXT] — VERDICT r13 #4;
no reference counterpart, SURVEY §2.2).

Every real crawl corpus starts from HTML; the curation chain needs
a main-content extractor before any quality scoring sees the text.
This module follows the codec playbook (operators/multimodal.py):
synthesize a deterministic HTML page around each document's real
text IN-PLAN (pure JVM expressions — the fixture rule is the
contract), extract with a dependency-free parser, and let the
oracle recompute the EXPECTED extraction closed-form from the raw
text — it never sees the HTML, so tag stripping, script/style
dropping, head removal, entity decoding, block segmentation, and
the boilerplate rules are all load-bearing: any extractor bug is a
hash mismatch.

The extractor (``html_main_text``) is the scale path itself, not a
test double: 100% ``pyspark.sql.functions`` / higher-order
expressions (regexp_replace, split, filter, transform) — zero
Python, zero shuffle, runs at parquet-scan speed on any corpus and
drops into the streaming curation topology as a stateless map
(tests/test_streaming.py). Pipeline, in order:

 1. drop ``<script>``/``<style>`` blocks wholesale (their bodies
    legally contain ``<``, ``>``, ``{``, even fake closing tags —
    stripping tags first would leak code into text);
 2. drop ``<head>…</head>`` (title/meta are not main content);
 3. segment at block-level open tags (nav, footer, aside, header,
    div, p, h1-h6) via a sentinel insert + split;
 4. drop boilerplate segments: by CONTAINER NAME (nav/footer/
    aside/header) and by LINK DENSITY (≥2 anchors with <60 chars
    of visible text — the jusText/Boilerpipe-style density rule
    reduced to a deterministic decision both engines can state
    closed-form);
 5. strip remaining tags, normalize whitespace, join segments;
 6. decode HTML entities (&lt; &gt; &quot; &#39; then &amp; LAST —
    the inverse of escape order, so escaped source text round-trips
    exactly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkatoclickhouse_spark.registry import query
from kafkatoclickhouse_spark.tables import fan_out, load_table

_SENT = "\x02"

# fixture layout: 7 segments/doc once <head> is gone —
# [pre-body shell, nav, ad-div, h1, p(text), p(entities), footer]
N_SEGMENTS = 7
N_BOILER_NAME = 2  # nav + footer
N_LINK_DROPPED = 1  # the 2-anchor ad div
_ENTITY_SAMPLE = "A & B <tag> \"q\" 's'"

LINK_DENSITY_MIN_ANCHORS = 2
LINK_DENSITY_MAX_CHARS = 60


def synthesize_html(docs: DataFrame) -> DataFrame:
    """(doc_id, html): a deterministic page wrapping the document's
    escaped text — title in head, style+script whose bodies contain
    tag-soup traps (``<``, ``>``, a fake ``</div>`` inside a JS
    string), nav + high-link-density ad boilerplate, an ``<h1>``,
    the escaped document text in a ``<p>``, a planted entity sample,
    and a footer. Pure string expressions; no UDF."""
    esc = (
        "replace(replace(replace(text,"
        " '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
    )
    return docs.select(
        "doc_id",
        F.expr(
            "concat("
            "'<html><head><title>Doc ', CAST(doc_id AS STRING),"
            " '</title>',"
            "'<style>body { color: #fff; } .x>p { margin: 0 }</style>',"
            "'<script>if (a < ', CAST(doc_id AS STRING),"
            " ' && b > 2) { run(\"</div>\") }</script>',"
            "'</head><body>',"
            "'<nav><a href=\"/\">home</a> <a href=\"/x\">links</a></nav>',"
            "'<div><a href=\"#\">buy</a> <a href=\"#\">now</a></div>',"
            "'<h1>Heading ', CAST(doc_id AS STRING), '</h1>',"
            f"'<p>', {esc}, '</p>',"
            "'<p>A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;</p>',"
            "'<footer>(c) 2026 example corp</footer>',"
            "'</body></html>')"
        ).alias("html"),
    )


def _visible(s: Column) -> Column:
    """Segment's visible text: tags stripped, whitespace
    normalized."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(s, "<[^>]*>", " "), r"\s+", " "
        )
    )


def _is_boiler_name(s: Column) -> Column:
    return s.rlike(r"(?is)^<(nav|footer|aside|header)\b")


def _is_link_dense(s: Column) -> Column:
    n_links = F.size(F.split(s, r"(?i)<a\b")) - F.lit(1)
    return (n_links >= F.lit(LINK_DENSITY_MIN_ANCHORS)) & (
        F.length(_visible(s)) < F.lit(LINK_DENSITY_MAX_CHARS)
    )


def _unescape(c: Column) -> Column:
    for pat, rep in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),  # LAST — inverse of escape order
    ):
        c = F.replace(c, F.lit(pat), F.lit(rep))
    return c


def _segments(html: Column) -> Column:
    x = F.regexp_replace(
        html, r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>", " "
    )
    x = F.regexp_replace(x, r"(?is)<head\b.*?</head\s*>", " ")
    x = F.regexp_replace(
        x,
        r"(?i)<(?=(?:nav|footer|aside|header|div|p|h[1-6])\b)",
        _SENT + "<",
    )
    return F.split(x, _SENT)


def html_main_text(html: Column) -> Column:
    """Main-content extraction as ONE Column expression — the
    curation-stage hook (batch and streaming alike apply it as a
    stateless projection)."""
    segs = _segments(html)
    kept = F.filter(
        segs, lambda s: ~(_is_boiler_name(s) | _is_link_dense(s))
    )
    texts = F.filter(
        F.transform(kept, _visible), lambda t: t != ""
    )
    return _unescape(F.concat_ws(" ", texts))


# the oracle's closed-form expectation: head/title, nav, ad, footer
# all vanish; what remains is the h1, the round-tripped document
# text, and the decoded entity sample, space-joined with empties
# skipped (concat_ws semantics match Spark's)
_SQL_EXPECTED = """
    concat_ws(' ',
      'Heading ' || CAST(doc_id AS VARCHAR),
      NULLIF(regexp_replace(trim(text), '\\s+', ' ', 'g'), ''),
      'A & B <tag> "q" ''s''')
"""


@query(
    "text_html_extract",
    oracle=f"""
    SELECT doc_id, {_SQL_EXPECTED} AS text
    FROM documents
    """,
)
def text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap every document in the deterministic HTML fixture, then
    recover the main content with the dependency-free extractor.
    The oracle states the expected output closed-form from raw
    text — extraction must round-trip the escaped document text
    exactly (entities included) while every boilerplate class
    (head, script/style, nav, link-dense ad, footer) vanishes."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return synthesize_html(docs).select(
        "doc_id", html_main_text(F.col("html")).alias("text")
    )


@query(
    "text_html_extract_stats",
    oracle=f"""
    SELECT doc_id,
           {N_SEGMENTS} AS n_segments,
           {N_BOILER_NAME} AS n_boiler_name,
           {N_LINK_DROPPED} AS n_link_dropped,
           CAST(LENGTH({_SQL_EXPECTED}) AS BIGINT) AS extracted_chars
    FROM documents
    """,
)
def text_html_extract_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-document extraction diagnostics — segment count and how
    many blocks each boilerplate rule dropped (the numbers a
    curation dashboard watches to catch an extractor regression or
    a template shift in the crawl). The fixture makes every count
    closed-form; the char count ties the stats query to the exact
    extraction output."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    h = synthesize_html(docs)
    segs = _segments(F.col("html"))
    return h.select(
        "doc_id",
        F.size(segs).alias("n_segments"),
        F.size(F.filter(segs, _is_boiler_name)).alias("n_boiler_name"),
        F.size(
            F.filter(
                segs,
                lambda s: ~_is_boiler_name(s) & _is_link_dense(s),
            )
        ).alias("n_link_dropped"),
        F.length(html_main_text(F.col("html")))
        .cast("long")
        .alias("extracted_chars"),
    )
