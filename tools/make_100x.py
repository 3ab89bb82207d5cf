#!/usr/bin/env python3
"""Build the 100x scale-slope corpus for SCALE.md's heavy-hitter decade
table: sf0.1 documents/embeddings duplicated x100 with shifted ids (the
same exact-duplication regime as make_10x.py — near-dup families and
vector clusters repeat at 100x the multiplicity). Only the two tables
the expensive [EXT] queries read are built; the full relational set at
100x is not needed for the slope measurement and would not change it.

Usage: python3 tools/make_100x.py [src_sfdir] [out_dir]
Then:  sbt "runMain graft.RunOne x51_kmeans <out_dir> 2"
"""
import duckdb, os, sys

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1x100"
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

def cnt(t):
    return con.execute(f"select count(*) from '{src}/{t}.parquet'").fetchone()[0]

n_doc, n_emb = cnt("documents"), cnt("embeddings")

con.execute(f"""COPY (SELECT doc_id + i*{n_doc} AS doc_id, text, lang, source, n_chars
  FROM '{src}/documents.parquet', range(0,100) r(i))
  TO '{out}/documents.parquet' (FORMAT PARQUET)""")
con.execute(f"""COPY (SELECT vec_id + i*{n_emb} AS vec_id, embedding, label
  FROM '{src}/embeddings.parquet', range(0,100) r(i))
  TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
print("built", sorted(os.listdir(out)))
