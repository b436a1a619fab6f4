"""Train the frozen BPE merge table (VERDICT r9 #5).

Deterministic byte-pair-encoding training over the whitespace words
of a fixture's ``documents`` table: symbols start as single
characters; each round merges the most frequent adjacent symbol
pair across the weighted word list (ties break to the
lexicographically smallest pair), until N_MERGES merges exist.
Determinism: pure integer frequencies, total tie order — retraining
on the same fixture reproduces the table byte-for-byte.

The output is the Python literal frozen into
``kafkatoclickhouse_spark/functions/bpe.py`` (integer ranks = list
position). Training is OFFLINE tooling — runtime only applies the
frozen table, exactly like a production tokenizer ships a fixed
``merges.txt`` (GPT-2's tokenizer distribution model).

Usage: python tools/train_bpe.py [sf_dir] [n_merges]
"""

from __future__ import annotations

import sys
from collections import Counter

import duckdb


def word_freqs(sf_dir: str) -> Counter:
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT w, COUNT(*) FROM (
          SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
          FROM read_parquet('{sf_dir}/documents.parquet')
          WHERE length(trim(text)) > 0)
        GROUP BY w
        """
    ).fetchall()
    return Counter(dict(rows))


def train(freqs: Counter, n_merges: int) -> list[tuple[str, str]]:
    words: dict[tuple[str, ...], int] = Counter()
    for w, c in freqs.items():
        words[tuple(w)] += c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # max count, tie -> lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        nxt: Counter = Counter()
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[tuple(out)] += c
        words = nxt
    return merges


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    merges = train(word_freqs(sf_dir), n)
    print("MERGES: tuple[tuple[str, str], ...] = (")
    for a, b in merges:
        print(f"    ({a!r}, {b!r}),")
    print(")")


if __name__ == "__main__":
    main()
