#!/usr/bin/env python3
"""Synthesize a k× scale-up of the driver testdata for scale-exponent
measurement (ARCHITECTURE.md scale table). Replicates documents /
embeddings / customer with deterministic per-replica perturbation that
PRESERVES the duplicate structure (two equal base texts mutate
identically, so exact/near-dup rates survive the scale-up and cross-
replica near-dups are added — the harder regime for dedup), and copies
the remaining tables unchanged.

Usage: python3 tools/gen_scale.py [baseDir] [outDir] [factor]
Default: /root/testdata/sf0.1 /tmp/graft_sf1 10

Read-only on the base dir; writes only under outDir.
"""
import hashlib
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

ARGS = [a for a in sys.argv[1:] if a != "--disjoint"]
# --disjoint: every token in replica r>0 carries a replica tag, so
# replicas are gram-DISJOINT from each other while each replica keeps
# the base corpus's internal duplicate structure exactly. This is the
# distribution-preserving scale-up for measuring ALGORITHMIC task-sec
# exponents; the default (mutating) mode instead multiplies duplicate
# mass (every doc gains k-1 cross-replica near-dups) — the harder,
# dedup-stress regime.
DISJOINT = "--disjoint" in sys.argv
BASE = ARGS[0] if len(ARGS) > 0 else "/root/testdata/sf0.1"
OUT = ARGS[1] if len(ARGS) > 1 else "/tmp/graft_sf1"
K = int(ARGS[2]) if len(ARGS) > 2 else 10

os.makedirs(OUT, exist_ok=True)


def h64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def gen_documents():
    t = pq.read_table(f"{BASE}/documents.parquet")
    n = t.num_rows
    doc_id = t.column("doc_id").to_pylist()
    text = t.column("text").to_pylist()
    lang = t.column("lang").to_pylist()
    source = t.column("source").to_pylist()
    vocab = sorted({w for s in text[:500] for w in s.split()})
    out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for rep in range(K):
        for i in range(n):
            s = text[i]
            if rep > 0 and DISJOINT:
                s = " ".join(f"{w}x{rep}" for w in s.split())
            elif rep > 0:
                # seed on (text, rep): equal base texts stay equal
                seed = h64(f"{s[:64]}:{len(s)}:{rep}")
                toks = s.split()
                # mutate ~10% of tokens deterministically
                for j in range(len(toks)):
                    r = (seed * 6364136223846793005 + j * 1442695040888963407) % (1 << 63)
                    if r % 10 == 0:
                        toks[j] = vocab[r % len(vocab)]
                s = " ".join(toks)
            out["doc_id"].append(rep * n + doc_id[i])
            out["text"].append(s)
            out["lang"].append(lang[i])
            out["source"].append(source[i])
            out["n_chars"].append(len(s))
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                        ("lang", pa.string()), ("source", pa.string()),
                        ("n_chars", pa.int64())])
    pq.write_table(pa.table(out, schema=schema), f"{OUT}/documents.parquet")
    print(f"documents: {n} -> {n * K}")


def gen_embeddings():
    t = pq.read_table(f"{BASE}/embeddings.parquet")
    n = t.num_rows
    vec_id = t.column("vec_id").to_pylist()
    emb = t.column("embedding").to_pylist()
    label = t.column("label").to_pylist()
    out = {"vec_id": [], "embedding": [], "label": []}
    for rep in range(K):
        for i in range(n):
            v = emb[i]
            if rep > 0:
                seed = h64(f"e:{vec_id[i]}:{rep}")
                # small deterministic jitter, cluster structure preserved
                v = [x + (((seed >> (j % 56)) & 0xFF) - 127.5) / 2550.0
                     for j, x in enumerate(v)]
            out["vec_id"].append(rep * n + vec_id[i])
            out["embedding"].append(v)
            out["label"].append(label[i])
    schema = pa.schema([("vec_id", pa.int64()),
                        ("embedding", pa.list_(pa.float32())),
                        ("label", pa.int32())])
    pq.write_table(pa.table(out, schema=schema), f"{OUT}/embeddings.parquet")
    print(f"embeddings: {n} -> {n * K}")


def gen_customer():
    t = pq.read_table(f"{BASE}/customer.parquet")
    n = t.num_rows
    cols = {c: t.column(c).to_pylist() for c in t.column_names}
    out = {c: [] for c in t.column_names}
    for rep in range(K):
        for i in range(n):
            key = rep * n + cols["c_custkey"][i]
            out["c_custkey"].append(key)
            if DISJOINT:
                # Replica tag with PAIRWISE levenshtein >= 3 (edit
                # threshold is 1), valid for any K: two repeated-letter
                # triples from rep's base-26 digits. Two distinct reps
                # differ in at least one digit, i.e. in a full triple =
                # 3 substitutions. The old single-triple form
                # (chr(65 + rep % 26) * 3) silently WRAPPED past K=26:
                # replica groups 26 apart carried identical names, so a
                # K=100 "disjoint" corpus had 4-way exact-duplicate
                # customer replicas — superlinear candidate mass that
                # was generator artifact, not data or operator.
                d1, d2 = divmod(rep, 26)
                tag = chr(65 + d1) * 3 + chr(65 + d2) * 3
                out["c_name"].append(
                    f"Customer#{tag}{cols['c_custkey'][i]:09d}")
            else:
                out["c_name"].append(f"Customer#{key:09d}")
            out["c_nationkey"].append(cols["c_nationkey"][i])
            out["c_acctbal"].append(cols["c_acctbal"][i])
            out["c_mktsegment"].append(cols["c_mktsegment"][i])
    schema = pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                        ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
                        ("c_mktsegment", pa.string())])
    pq.write_table(pa.table(out, schema=schema), f"{OUT}/customer.parquet")
    print(f"customer: {n} -> {n * K}")


def gen_events():
    # K x events with per-replica user/event id offsets: per-user activity
    # shape (and so per-user join fan-out, funnel depth, lookback volume)
    # is preserved exactly while users and events scale by K — the
    # distribution-preserving regime for the event-analytics family.
    # Column arithmetic stays in pyarrow compute so the ts column (and its
    # TIMESTAMP(NANOS) physical type, which Tables.load conforms) is
    # carried through byte-identical.
    import pyarrow.compute as pc
    t = pq.read_table(f"{BASE}/events.parquet")
    uid_off = pc.max(t.column("user_id")).as_py() + 1
    eid_off = pc.max(t.column("event_id")).as_py() + 1
    reps = []
    for rep in range(K):
        tt = t
        if rep > 0:
            tt = tt.set_column(tt.schema.get_field_index("event_id"),
                               tt.schema.field("event_id"),
                               pc.add(tt.column("event_id"), rep * eid_off))
            tt = tt.set_column(tt.schema.get_field_index("user_id"),
                               tt.schema.field("user_id"),
                               pc.add(tt.column("user_id"), rep * uid_off))
        reps.append(tt)
    pq.write_table(pa.concat_tables(reps), f"{OUT}/events.parquet")
    print(f"events: {t.num_rows} -> {t.num_rows * K}")


gen_documents()
gen_embeddings()
gen_customer()
gen_events()
for tbl in ["region", "nation", "supplier", "part", "orders", "lineitem"]:
    src = f"{BASE}/{tbl}.parquet"
    if os.path.exists(src):
        shutil.copyfile(src, f"{OUT}/{tbl}.parquet")
        print(f"{tbl}: copied")
