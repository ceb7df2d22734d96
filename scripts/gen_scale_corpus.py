#!/usr/bin/env python3
"""Generate a K-times replicated documents/embeddings corpus for the
crossover demonstration (NOT part of the testdata contract — local
scale experiments only).

Each replica r keeps every doc's lang/source/n_chars (so block keys
and populations scale by K) but suffixes every word with _r<r>, giving
replicas pairwise-disjoint vocabularies: within-block PAIR work grows
K^2 while the true near-dup pairs (and the prefix query's postings
co-occurrence) grow only K. That is exactly the regime that separates
an all-pairs-in-block plan from a prefix-filtered one.

Embeddings replicate with a cosine-preserving scale (timing-only
corpus; pair count grows K^2 for both the brute and blocked variants).

Usage: gen_scale_corpus.py <src_sf_dir> <out_dir> <K>
"""
import sys
import duckdb

src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
import os
os.makedirs(out, exist_ok=True)

con = duckdb.connect()
reps = " UNION ALL ".join(
    f"""SELECT doc_id + {r * 10_000_000} AS doc_id,
          {'text' if r == 0 else
           f"array_to_string(list_transform(string_split(text, ' '), x -> x || '_r{r}'), ' ')"}
            AS text,
          lang, source, n_chars
        FROM src"""
    for r in range(k))
con.execute(f"CREATE VIEW src AS SELECT * FROM '{src}/documents.parquet'")
con.execute(f"COPY ({reps}) TO '{out}/documents.parquet' (FORMAT PARQUET)")

ereps = " UNION ALL ".join(
    f"""SELECT vec_id + {r * 10_000_000} AS vec_id,
          list_transform(embedding, x -> CAST(x * {1.0 + r * 0.001} AS FLOAT)) AS embedding,
          label
        FROM esrc"""
    for r in range(k))
con.execute(f"CREATE VIEW esrc AS SELECT * FROM '{src}/embeddings.parquet'")
con.execute(f"COPY ({ereps}) TO '{out}/embeddings.parquet' (FORMAT PARQUET)")

for t in ("documents", "embeddings"):
    n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")
