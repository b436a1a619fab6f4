"""Hybrid retrieval — BM25 + embedding cosine fused by Reciprocal
Rank Fusion (Cormack/Clarke/Büttcher SIGIR 2009). [EXT] LLM-pipeline
surface (SURVEY.md §2.2).

The serving pattern every RAG stack runs: a lexical ranking (BM25
over postings) and a semantic ranking (ANN over embeddings) answer
the same query independently, and the fused list

    rrf(d) = Σ_lists 1 / (K + rank_list(d)),   K = 60

out-ranks either list alone. RRF is the production default because
it needs NO score calibration — only ranks — which also makes it
exactly oracle-replayable: ranks are integers with total tie-break
order, each reciprocal is a single double division of integers
(bit-identical in any IEEE engine), and the fused score is a
fixed-order two-term sum.

Corpus: documents that HAVE an embedding (doc_id = vec_id — the
indexed slice of the corpus; at sf0.1 that is 2000 of 5000 docs,
which also pins the join). Lexical query: the corpus's top-df tokens
(the deterministic rule ``text_bm25_topk`` uses, recomputed over the
joined slice). Semantic query: the embedding of the smallest indexed
vec_id — the same deterministic stand-in the ANN tier's QUERY_MOD
rule plays.

Shuffle shape at 100 TB: BM25 side = the postings exchanges the BM25
query already pays (built once at ingest in the index lifecycle);
semantic side = one broadcast-query map scan + TakeOrdered; fusion =
a full outer join of two ≤N_LIST-row rank lists — driver-trivial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from kafkatoclickhouse_spark.functions.vector import cosine_with_norms, norm
from kafkatoclickhouse_spark.registry import query
from kafkatoclickhouse_spark.tables import load_table

RRF_K = 60       # the SIGIR-2009 constant
N_LIST = 50      # depth of each input ranking
HY_TOP = 10      # fused results returned
HY_QK = 5        # lexical query = top-HY_QK df tokens of the slice
BM25_K1 = 1.2
BM25_B = 0.75

_SQL_COSINE = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


@query(
    "retrieval_hybrid_rrf",
    oracle=f"""
    WITH corpus AS (
      SELECT d.doc_id, d.text, CAST(e.embedding AS DOUBLE[]) AS v
      FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    ),
    toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM corpus
    ),
    tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE token <> '' GROUP BY doc_id, token
    ),
    dlen AS (
      SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dlen
    ),
    dfreq AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token
    ),
    qterms AS (
      SELECT token, df, CAST(rk AS INTEGER) AS trank
      FROM (SELECT token, df, ROW_NUMBER() OVER (
              ORDER BY df DESC, token) AS rk
            FROM dfreq)
      WHERE rk <= {HY_QK}
    ),
    wts AS (
      SELECT t.doc_id, q.trank,
             ln(1.0 + (s.n_docs - q.df + 0.5) / (q.df + 0.5))
               * (t.tf * ({BM25_K1} + 1.0))
               / (t.tf + {BM25_K1} * (1.0 - {BM25_B}
                  + {BM25_B} * d.dl / s.avgdl)) AS w
      FROM tf t
      JOIN qterms q USING (token)
      JOIN dlen d USING (doc_id)
      CROSS JOIN stats s
    ),
    lexsc AS (
      SELECT doc_id,
             {" + ".join(
                 f"COALESCE(MAX(CASE WHEN trank = {k} THEN w END), 0.0)"
                 for k in range(1, HY_QK + 1)
             )} AS score
      FROM wts GROUP BY doc_id
    ),
    lex AS (
      SELECT doc_id, CAST(rk AS INTEGER) AS lex_rank
      FROM (SELECT doc_id, ROW_NUMBER() OVER (
              ORDER BY score DESC, doc_id) AS rk FROM lexsc)
      WHERE rk <= {N_LIST}
    ),
    qv AS (SELECT v FROM corpus ORDER BY doc_id LIMIT 1),
    sem AS (
      SELECT doc_id, CAST(rk AS INTEGER) AS sem_rank
      FROM (SELECT c.doc_id, ROW_NUMBER() OVER (
              ORDER BY {_SQL_COSINE.format(a="c.v", b="qv.v")} DESC,
                       c.doc_id) AS rk
            FROM corpus c, qv)
      WHERE rk <= {N_LIST}
    ),
    fused AS (
      SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
             lex.lex_rank, sem.sem_rank,
             COALESCE(1.0 / ({RRF_K} + lex.lex_rank), 0.0)
               + COALESCE(1.0 / ({RRF_K} + sem.sem_rank), 0.0) AS rrf
      FROM lex FULL OUTER JOIN sem USING (doc_id)
    )
    SELECT doc_id, lex_rank, sem_rank, ROUND(rrf, 9) AS rrf_score,
           CAST(rk AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (
            ORDER BY rrf DESC, doc_id) AS rk FROM fused)
    WHERE rk <= {HY_TOP}
    """,
)
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid top-{HY_TOP}: BM25 (top-df lexical query over the
    indexed slice) and cosine-to-query-embedding rankings, each to
    depth {N_LIST}, fused by RRF with K={RRF_K}. NULL rank columns
    mark docs reached by only one modality — the diagnostic a hybrid
    deployment watches (a modality that never contributes uniquely
    is dead weight). Lexical-query selection and the query embedding
    are the two bounded driver barriers (the BM25/kmeans pattern)."""
    from kafkatoclickhouse_spark.tables import fan_out

    docs = load_table(spark, sf_dir, "documents")
    em = load_table(spark, sf_dir, "embeddings")
    # r14: the joined corpus feeds FOUR separate executions (lexical
    # qterm collect, query-embedding first(), the scoring job's two
    # modalities) — localCheckpoint materializes the join once per
    # invocation instead of re-running it per execution; fan_out
    # spreads the tokenize/cosine maps off the single-split scans
    corpus = fan_out(
        docs.join(em, docs["doc_id"] == em["vec_id"]).select(
            "doc_id", "text", "embedding"
        )
    ).localCheckpoint()

    toks = corpus.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    # same second-execution argument as text_bm25_topk's checkpoint
    tf = (
        toks.groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint()
    )
    dlen = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dlen.agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    qrows = dfreq.orderBy(F.desc("df"), "token").limit(HY_QK).collect()
    qterms = spark.createDataFrame(
        [(r["token"], int(r["df"]), i + 1) for i, r in enumerate(qrows)],
        schema="token string, df long, trank int",
    )
    wts = (
        tf.join(F.broadcast(qterms), "token")
        .join(dlen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "trank",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * F.lit(BM25_K1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(BM25_K1)
                    * (
                        F.lit(1.0 - BM25_B)
                        + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("w"),
        )
    )
    parts = [
        F.coalesce(
            F.max(F.when(F.col("trank") == k, F.col("w"))), F.lit(0.0)
        )
        for k in range(1, HY_QK + 1)
    ]
    score = parts[0]
    for p in parts[1:]:
        score = score + p
    lexsc = wts.groupBy("doc_id").agg(score.alias("score"))
    lw = W.orderBy(F.desc("score"), "doc_id")
    lex = (
        lexsc.orderBy(F.desc("score"), "doc_id")
        .limit(N_LIST)
        .withColumn("lex_rank", F.row_number().over(lw).cast("int"))
        .select("doc_id", "lex_rank")
    )

    qrow = corpus.orderBy("doc_id").limit(1).select("embedding").first()
    qv = F.lit(qrow["embedding"]).cast("array<float>")
    semsc = corpus.select(
        "doc_id",
        cosine_with_norms(
            qv.cast("array<double>"),
            F.col("embedding").cast("array<double>"),
            norm(qv.cast("array<double>")),
            norm(F.col("embedding").cast("array<double>")),
        ).alias("s"),
    )
    sw = W.orderBy(F.desc("s"), "doc_id")
    sem = (
        semsc.orderBy(F.desc("s"), "doc_id")
        .limit(N_LIST)
        .withColumn("sem_rank", F.row_number().over(sw).cast("int"))
        .select("doc_id", "sem_rank")
    )

    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "sem_rank",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(RRF_K) + F.col("sem_rank")), F.lit(0.0)
            )
        ).alias("rrf"),
    )
    rw = W.orderBy(F.desc("rrf"), "doc_id")
    return (
        fused.orderBy(F.desc("rrf"), "doc_id")
        .limit(HY_TOP)
        .withColumn("rank", F.row_number().over(rw).cast("int"))
        .select(
            "doc_id",
            "lex_rank",
            "sem_rank",
            F.round("rrf", 9).alias("rrf_score"),
            "rank",
        )
    )
