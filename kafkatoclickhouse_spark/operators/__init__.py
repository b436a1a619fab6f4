"""Batch operators.

    ingest      reference-parity JSON ingestion: parse → metadata
                enrichment → required-field validation → derivations
                → sink projection
    relational  joins / aggregations / window functions / set ops /
                scalar-array-JSON functions ([EXT] surface)
    tpch/tpch2  the full 22-query TPC-H decision-support sweep,
                adapted to the fixture schema
    asof        as-of and range joins
    dedup       exact + MinHash-LSH + SimHash + n-gram Jaccard +
                embedding near-duplicate detection
    similarity  embedding cosine top-k (brute force + LSH-bucketed)
    text        language-ID, quality scoring, token counts,
                fingerprinting
    multimodal  binary-column plumbing with stubbed decoders
"""
