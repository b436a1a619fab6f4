"""HTML extraction pins (VERDICT r13 #4) — beyond the oracle hash
gate: tricky planted content round-trips, and the extractor drops
into a stream as a stateless projection."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkatoclickhouse_spark.operators import htmlx


def _extract(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = htmlx.synthesize_html(docs).select(
        "doc_id", htmlx.html_main_text(F.col("html")).alias("text")
    )
    return {r["doc_id"]: r["text"] for r in out.collect()}


def test_wrapped_text_round_trips_exactly(spark):
    """The pin the brief names: the extracted text of a wrapped
    fixture doc equals the original (whitespace-normalized), even
    when the original contains HTML metacharacters, entity-looking
    strings, and whitespace runs — escape/unescape and whitespace
    normalization must compose exactly."""
    cases = {
        1: "plain words only",
        2: "angle <div> brackets & ampersands > here",
        3: "already &amp; escaped &lt;looking&gt; text",
        4: "runs   of\t whitespace\n\n and  more",
        5: "quotes \"double\" and 'single' survive",
    }
    got = _extract(spark, list(cases.items()))
    import re

    for doc_id, text in cases.items():
        norm = re.sub(r"\s+", " ", text.strip())
        expected = f"Heading {doc_id} {norm} A & B <tag> \"q\" 's'"
        assert got[doc_id] == expected, (doc_id, got[doc_id])


def test_empty_and_whitespace_docs(spark):
    """Empty/whitespace-only text contributes nothing — no double
    spaces, no dangling separators (concat_ws skip semantics)."""
    got = _extract(spark, [(7, ""), (8, "   \t\n  ")])
    for doc_id in (7, 8):
        assert got[doc_id] == (
            f"Heading {doc_id} A & B <tag> \"q\" 's'"
        )


def test_boilerplate_classes_all_vanish(spark):
    """No fragment of head/title, style, script (including its fake
    </div> string), nav, ad anchors, or footer may leak into the
    extraction."""
    got = _extract(spark, [(42, "the actual content")])
    text = got[42]
    for leaked in (
        "Doc 42",  # title
        "color",  # style body
        "run(",  # script body
        "home",  # nav link text
        "buy",  # ad link text
        "example corp",  # footer
        "<div>",  # the fake closing tag inside the JS string
    ):
        assert leaked not in text, (leaked, text)


def test_extractor_is_a_stateless_stream_stage(spark, sf_dir, tmp_path):
    """The curation hook: html_main_text applies to a readStream as
    a plain projection (append mode, no state, no shuffle) and
    agrees row-for-row with the batch extraction."""
    from kafkatoclickhouse_spark import registry
    from kafkatoclickhouse_spark.tables import load_table

    batch = {
        r["doc_id"]: r["text"]
        for r in registry.QUERIES["text_html_extract"](
            spark, sf_dir
        ).collect()
    }

    docs = load_table(spark, sf_dir, "documents")
    feed = tmp_path / "html_feed"
    htmlx.synthesize_html(docs).write.parquet(str(feed))
    stream = spark.readStream.schema("doc_id long, html string").parquet(
        str(feed)
    )
    out = stream.select(
        "doc_id", htmlx.html_main_text(F.col("html")).alias("text")
    )
    q = (
        out.writeStream.format("memory")
        .queryName("html_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "html_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r["doc_id"]: r["text"]
        for r in spark.table("html_stream").collect()
    }
    assert got == batch
