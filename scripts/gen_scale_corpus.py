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

events and lineitem replicate too (r11, for the event-window /
percent-rank scale probes): replicas shift event ids, user ids and
timestamps (+6h per replica) so window and session KEYS multiply
rather than deepen, and shift order keys while perturbing
l_extendedprice per replica so the rank probe's distinct-value count
grows with the rows. events.ts is exported as BIGINT nanoseconds —
the real testdata's physical TIMESTAMP(NANOS) arrives as a long under
nanosAsLong=true, and graft.Tables reproduces that contract; a DuckDB
TIMESTAMP column would not.

Usage: gen_scale_corpus.py <src_sf_dir> <out_dir> <K>
"""
import sys
import duckdb

src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
# --graph-partkey (r12): shift l_partkey per replica too, so the
# co-occurrence GRAPH grows — with partkeys shared, replicated orders
# reproduce the SAME part pairs and the distinct edge set (and hence
# triangle/pagerank graph size) would not grow at all; with shifted
# partkeys the replicas are disjoint subgraphs: nodes x K, edges x K,
# wedges x K — the honest scaling regime for the graph capstones.
graph_partkey = "--graph-partkey" in sys.argv
import os
os.makedirs(out, exist_ok=True)

# Never COPY through a symlink: out dirs written by the pre-r12 script
# symlinked ride-along tables to the SOURCE testdata, so regenerating
# into such a dir would truncate and overwrite the pristine src
# part.parquet (the corpus golden hashes and correctness oracles are
# derived from it). Unlink any symlinked destination first so the COPY
# creates a fresh local file instead.
for _t in ("documents", "embeddings", "events", "lineitem", "part"):
    _dst = f"{out}/{_t}.parquet"
    if os.path.islink(_dst):
        os.unlink(_dst)

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

evreps = " UNION ALL ".join(
    f"""SELECT event_id + {r * 10_000_000} AS event_id,
          epoch_ns(ts) + {r} * 21600000000000 AS ts,
          user_id + {r * 10_000_000} AS user_id,
          event_type, value, props
        FROM evsrc"""
    for r in range(k))
con.execute(f"CREATE VIEW evsrc AS SELECT * FROM '{src}/events.parquet'")
con.execute(f"COPY ({evreps}) TO '{out}/events.parquet' (FORMAT PARQUET)")

lireps = " UNION ALL ".join(
    f"""SELECT l_orderkey + {r * 10_000_000} AS l_orderkey,
          l_partkey{f' + {r * 10_000_000}' if graph_partkey else ''} AS l_partkey,
          l_suppkey, l_linenumber, l_quantity,
          l_extendedprice + {r} * 0.01 AS l_extendedprice,
          l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM lisrc"""
    for r in range(k))
con.execute(f"CREATE VIEW lisrc AS SELECT * FROM '{src}/lineitem.parquet'")
con.execute(f"COPY ({lireps}) TO '{out}/lineitem.parquet' (FORMAT PARQUET)")

# part replicates with a per-replica NOUN suffix (r12, for the
# blocked-JW linkage probe): block keys (brand, noun_r) multiply by K
# while block SIZES stay constant — the honest record-linkage regime
# (a shared-noun replication would grow within-block pair work K^2,
# which measures the blocking key's selectivity, not the engine).
preps = " UNION ALL ".join(
    f"""SELECT p_partkey + {r * 10_000_000} AS p_partkey,
          {'p_name' if r == 0 else f"p_name || 'r{r}'"} AS p_name,
          p_brand, p_type, p_size, p_retailprice
        FROM psrc"""
    for r in range(k))
con.execute(f"CREATE VIEW psrc AS SELECT * FROM '{src}/part.parquet'")
con.execute(f"COPY ({preps}) TO '{out}/part.parquet' (FORMAT PARQUET)")

for t in ("documents", "embeddings", "events", "lineitem", "part"):
    n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")

# remaining tables ride along at 1x (symlinked) so the full catalog runs
for t in ("region", "nation", "customer", "supplier", "orders"):
    dst = f"{out}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{src}/{t}.parquet", dst)
