"""Scale the sf0.1 fixture tables ×N for large-SF bench points.

The driver ships sf{0.001,0.01,0.1}; the scaling study (does any headline
query go superlinear?) needs a bigger point.  This script fabricates
``sf1``-equivalent parquet from sf0.1 by unioning N key-shifted copies —
for THROUGHPUT measurement only, never for correctness oracles:

* ``lineitem``/``orders`` — orderkeys shifted per copy (join-consistent);
  customers/suppliers/parts are reused, so per-key fan-in grows ×N
  (realistic: dimensions grow slower than facts).
* ``events`` — event_id shifted, ``ts`` shifted by one span per copy so
  event density per bucket stays constant (the timeline extends, which
  is how real telemetry grows).
* ``documents`` — doc_id shifted AND the text passed through a per-copy
  letter-rotation cipher: word lengths, whitespace, and repetition
  structure are preserved (same compute shape for text_stats etc.), but
  every letter-containing CHARACTER shingle differs across copies, so
  cross-copy Jaccard ≈ 0 and the corpus grows by new content —
  preserving the per-copy near-dup cluster structure instead of
  multiplying cluster SIZE ×N.  (Word-level salting is not enough: the
  minhash shingles are char 5-grams, which survive inside salted words,
  so whole near-dup cliques still collide across copies and the LSH
  band join goes quadratic in N.)
* ``embeddings`` — vec_id shifted, vector rotated by copy index:
  decorrelates copies so top-k/ANN candidate structure stays realistic.
* ``region nation customer supplier part`` — copied as-is.

Usage: python scripts/make_scaled_sf.py [N] [SRC] [DST]
Defaults: N=10, SRC=/root/testdata/sf0.1, DST=<repo>/.benchdata/sf1
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
KEY_OFFSET = 100_000_000


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else os.path.join(REPO, ".benchdata", "sf1")
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def copy_as_is(table: str) -> None:
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{src}/{table}.parquet')) "
            f"TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )

    for t in ("region", "nation", "customer", "supplier", "part"):
        copy_as_is(t)

    union = lambda body: " UNION ALL ".join(body(i) for i in range(n))  # noqa: E731

    con.sql(f"CREATE VIEW li AS SELECT * FROM read_parquet('{src}/lineitem.parquet')")
    con.sql(f"CREATE VIEW od AS SELECT * FROM read_parquet('{src}/orders.parquet')")
    con.sql(
        "COPY ("
        + union(lambda i: f"SELECT * REPLACE (l_orderkey + {i * KEY_OFFSET} AS l_orderkey) FROM li")
        + f") TO '{dst}/lineitem.parquet' (FORMAT PARQUET)"
    )
    con.sql(
        "COPY ("
        + union(lambda i: f"SELECT * REPLACE (o_orderkey + {i * KEY_OFFSET} AS o_orderkey) FROM od")
        + f") TO '{dst}/orders.parquet' (FORMAT PARQUET)"
    )

    con.sql(f"CREATE VIEW ev AS SELECT * FROM read_parquet('{src}/events.parquet')")
    span_us = con.sql(
        "SELECT epoch_us(max(ts)) - epoch_us(min(ts)) + 3600000000 FROM ev"
    ).fetchone()[0]
    con.sql(
        "COPY ("
        + union(
            lambda i: f"SELECT * REPLACE (event_id + {i * KEY_OFFSET} AS event_id, "
            f"ts + INTERVAL ({i * span_us}) MICROSECOND AS ts) FROM ev"
        )
        + f") TO '{dst}/events.parquet' (FORMAT PARQUET)"
    )

    # documents: per-copy AFFINE substitution cipher (see module docstring).
    # A plain rotation repeats every 26 copies (copies 0/26/52/78 would share
    # a cipher, re-merging near-dup cliques across copies and driving the LSH
    # band join quadratic at N=100), so the letter map is k -> (a*k + b) mod 26
    # with a coprime to 26: 12*26 = 312 distinct permutations, all distinct for
    # N <= 312.  i < 26 keeps a=1 (pure rotation), so sf1 fixtures built by the
    # earlier rotation version are byte-identical and need no rebuild.
    con.sql(f"CREATE VIEW docs AS SELECT * FROM read_parquet('{src}/documents.parquet')")
    lower = "abcdefghijklmnopqrstuvwxyz"
    upper = lower.upper()
    digits = "0123456789"
    AFF26 = (1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
    AFF10 = (1, 3, 7, 9)

    def _affine(alphabet: str, a: int, b: int) -> str:
        m = len(alphabet)
        return "".join(alphabet[(a * k + b) % m] for k in range(m))

    def salted(i: int) -> str:
        if not i:
            return "SELECT * FROM docs"
        # substitute digits too: digit-heavy shingles otherwise survive the
        # letter cipher identically in every copy, and minhash minima
        # landing on them re-merge cliques across copies.  The digit map has
        # only 40 distinct affine forms, so PURE-digit shingles can collide
        # across copies 40 apart — mixed shingles (any letter present)
        # always differ; acceptable, and documented here (no silent caps).
        rl = _affine(lower, AFF26[(i // 26) % 12], i % 26)
        ru = _affine(upper, AFF26[(i // 26) % 12], i % 26)
        rd = _affine(digits, AFF10[(i // 10) % 4], i % 10)
        return (
            "SELECT * REPLACE ("
            f"doc_id + {i * KEY_OFFSET} AS doc_id, "
            f"translate(text, '{lower}{upper}{digits}', '{rl}{ru}{rd}') AS text) FROM docs"
        )
    con.sql("COPY (" + union(salted) + f") TO '{dst}/documents.parquet' (FORMAT PARQUET)")

    # embeddings: rotate the vector by copy index; past one full cycle of
    # rotations (i >= dim) also reverse the vector, so rotation×reversal
    # gives 2*dim distinct permutations and copies i and i+dim don't carry
    # IDENTICAL vectors (which would merge near-dup cliques across copies)
    con.sql(f"CREATE VIEW emb AS SELECT * FROM read_parquet('{src}/embeddings.parquet')")
    dim = con.sql("SELECT len(embedding) FROM emb LIMIT 1").fetchone()[0]

    def rotated(i: int) -> str:
        r = i % dim
        e = f"embedding[{r + 1}:] || embedding[:{r}]" if r else "embedding"
        if (i // dim) % 2:
            e = f"list_reverse({e})"
        if e == "embedding":
            return f"SELECT * REPLACE (vec_id + {i * KEY_OFFSET} AS vec_id) FROM emb"
        return (
            "SELECT * REPLACE ("
            f"vec_id + {i * KEY_OFFSET} AS vec_id, {e} AS embedding) FROM emb"
        )
    con.sql("COPY (" + union(rotated) + f") TO '{dst}/embeddings.parquet' (FORMAT PARQUET)")

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        rows = con.sql(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {rows} rows")


if __name__ == "__main__":
    main()
