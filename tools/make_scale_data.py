"""Synthesize a larger scale factor from the sf0.1 fixtures by
concatenating id-shifted copies — the scale-curve harness's data
source (the driver only ships sf0.001/0.01/0.1).

Usage: python tools/make_scale_data.py [copies] [out_dir]
       (defaults: 10 copies → .scaledata/sf1.0)

Each copy k shifts every 64-bit key by k * 10^10 so joins stay
consistent within a copy and never collide across copies; the
dimension tables (region, nation) are written once, like TPC-H's
fixed-size dims. Two transforms keep the scaled data's DISTRIBUTION
faithful instead of pathological:

- documents.text: every token in copy k > 0 gets the suffix ``k``,
  making shingle spaces copy-disjoint — each copy is an independent
  corpus, so dedup work grows linearly with data. Plain duplication
  would multiply every shingle's document frequency by the copy
  count and inflate the shingle join quadratically — a
  data-construction artifact that would masquerade as an engine
  scaling bug.
- embeddings.embedding: copy k circularly rotates the vector by k
  dims — norms and in-copy pairwise cosines are exactly preserved,
  cross-copy similarities become incidental, so ANN/dedup workloads
  scale like a genuinely larger corpus instead of an all-pairs
  duplicate blowup.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from kafkatoclickhouse_spark.session import get_spark  # noqa: E402
from kafkatoclickhouse_spark.tables import load_table  # noqa: E402

SRC = "/root/testdata/sf0.1"
SHIFT = 10_000_000_000  # per-copy key offset, >> any fixture key

# int64 key columns to shift per table (int32 nation/region keys are
# dimension references and stay fixed).
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ("region", "nation")


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scaledata",
            f"sf{copies / 10:.1f}",
        )
    )
    spark = get_spark("make_scale_data")
    for t in DIMS:
        load_table(spark, SRC, t).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet")
        )
    for t, keys in KEY_COLS.items():
        base = load_table(spark, SRC, t)
        parts = []
        for k in range(copies):
            df = base
            for c in keys:
                df = df.withColumn(c, F.col(c) + F.lit(k * SHIFT))
            if t == "documents" and k:
                suffixed = F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.concat(w, F.lit(str(k))),
                    ),
                    " ",
                )
                df = df.withColumn("text", suffixed).withColumn(
                    "n_chars", F.length("text")
                )
            if t == "embeddings" and k:
                r = k % 63 + 1  # 1..63, never 0 (dim = 64)
                df = df.withColumn(
                    "embedding",
                    F.expr(
                        f"concat(slice(embedding, {r + 1},"
                        f" size(embedding) - {r}),"
                        f" slice(embedding, 1, {r}))"
                    ),
                )
            parts.append(df)
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.unionByName(p)
        merged.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet")
        )
        print(f"{t}: {copies}x written", file=sys.stderr)
    print(out_dir)


if __name__ == "__main__":
    main()
