#!/usr/bin/env python
"""Organically-GROWN sf1-class fixture (r11 verdict task 2).

The replica protocol (tests/make_replicas.py) grows volume by copying
sf0.1 with offset keys: cardinalities grow but every VALUE distribution
is a verbatim copy — vocabulary stays 31 tokens, the embedding corpus
repeats the same 2 000 vectors (cross-replica cosine exactly 1.0), LSH
bucket occupancy and posting-list lengths replicate instead of growing.
This generator builds a ~10x sf0.1 fixture whose KEY DOMAINS grow the
way real data grows:

- customer/part/supplier/orders/lineitem: 10x rows over 10x-wide key
  domains (new customers place the new orders; new parts/suppliers
  serve the new lineitems), same enums/price/date distributions.
- events: 10x rows from a 10x user domain over the same 30-day window
  (density grows — the organic shape for an event stream).
- documents: 10x docs drawn from a GROWN vocabulary (Heaps-style:
  the 31-token sf0.1 core stays uniform-hot, ~90 new tokens arrive on
  a Zipf tail), with the sf0.1 exact-dup rate (~0.3%) and a mix of
  high/mid-Jaccard near-dups created by end-append / mid-edit
  perturbation — near-dup DENSITY stays constant so candidate growth
  under LSH/banding is measured against organically new content.
- embeddings: 10x fresh 64-d unit vectors from 10 fresh cluster
  centers (cluster structure preserved, every vector NEW), with the
  make_replicas guard-band assertion (no pair's cosine within 1e-9 of
  the 0.35 threshold) enforced at build time.

Deterministic (numpy PCG64 seed 1234). Fact tables are written as
directories of N_FILES parquet part-files so scans arrive pre-split —
the organic layout at scale (the single-file sf0.1 tables are the
r12-documented under-parallel edge case). Schemas are asserted equal
to sf0.1's, column for column, after the write.

Usage: python tools/make_grown_fixture.py [OUT_DIR] [MULT]
       (default /tmp/mdis_grown_sf1, 10)
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
GUARD_THRESHOLD = 0.35
GUARD = 1e-9

SEGMENTS = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["P", "O", "F"]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]
LANGS = (["en"] * 41 + ["zh"] * 15 + ["es"] * 15 + ["fr"] * 15 + ["de"] * 14)
ADJS = ["large", "hot", "small", "cold", "dim", "fast", "slow", "new",
        "old", "dark", "light", "deep"]
NOUNS = ["ring", "bolt", "case", "gear", "disk", "lace", "wire", "tube",
         "clip", "rod"]

#: the sf0.1 uniform-hot core vocabulary (31 tokens, measured)
CORE_VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "batch", "part", "line", "order", "sort",
    "fast", "scan", "hash", "slow", "group", "agg", "filter", "query",
    "big", "key", "a", "join", "shuffle", "cache", "plan", "index",
]
#: Heaps-style growth: new tokens arriving with the 10x corpus, ranked
#: on a Zipf tail (the organic vocabulary shape replicas cannot give)
TAIL_VOCAB = [f"tok{i:03d}" for i in range(90)]

EPOCH = np.datetime64("1970-01-01T00:00:00", "us")


def _us(date_str: str) -> int:
    return int((np.datetime64(date_str, "us") - EPOCH)
               / np.timedelta64(1, "us"))


def _ts_col(vals_us: np.ndarray) -> pa.Array:
    return pa.array(vals_us.astype("int64"), type=pa.int64()).cast(
        pa.timestamp("us"))


def _write(out_dir: str, name: str, table: pa.Table, n_files: int) -> None:
    if n_files <= 1:
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
        return
    d = os.path.join(out_dir, f"{name}.parquet")
    os.makedirs(d, exist_ok=True)
    n = table.num_rows
    step = (n + n_files - 1) // n_files
    for i in range(n_files):
        lo = i * step
        if lo >= n:
            break
        pq.write_table(table.slice(lo, min(step, n - lo)),
                       os.path.join(d, f"part-{i:04d}.parquet"),
                       row_group_size=step // 2 + 1)


def build(out_dir: str, mult: int = 10) -> None:
    rng = np.random.default_rng(1234)
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        print(f"{out_dir}: already built, skipping "
              f"(rm {marker} to rebuild)", file=sys.stderr)
        return

    n_cust = 15_000 * mult
    n_supp = 1_000 * mult
    n_part = 20_000 * mult
    n_ord = 150_000 * mult
    n_li_per = rng.choice(np.arange(1, 11), size=n_ord,
                          p=np.array([11016, 21814, 29500, 29097, 23631,
                                      15625, 8941, 4407, 1959, 818 + 192],
                                     dtype="float64") / 147_000)
    n_ev = 100_000 * mult
    n_users = 1_500 * mult
    n_doc = 5_000 * mult
    n_vec = 2_000 * mult

    # dims: copied verbatim (facts grow, dims don't — the 100 TB shape)
    for dim in ("region", "nation"):
        pq.write_table(pq.read_table(f"{SRC}/{dim}.parquet"),
                       os.path.join(out_dir, f"{dim}.parquet"))

    # --- customer ---------------------------------------------------
    ck = np.arange(n_cust, dtype="int64")
    customer = pa.table({
        "c_custkey": ck,
        "c_name": pa.array([f"Customer#{i:09d}" for i in ck]),
        "c_nationkey": pa.array(
            rng.integers(0, 25, n_cust).astype("int32"), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(
            np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    })
    _write(out_dir, "customer", customer, 4)

    # --- supplier ---------------------------------------------------
    sk = np.arange(n_supp, dtype="int64")
    supplier = pa.table({
        "s_suppkey": sk,
        "s_name": pa.array([f"Supplier#{i:09d}" for i in sk]),
        "s_nationkey": pa.array(
            rng.integers(0, 25, n_supp).astype("int32"), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    })
    _write(out_dir, "supplier", supplier, 1)

    # --- part -------------------------------------------------------
    pk = np.arange(n_part, dtype="int64")
    part = pa.table({
        "p_partkey": pk,
        "p_name": pa.array([
            f"{ADJS[a]} {NOUNS[b]}"
            for a, b in zip(rng.integers(0, len(ADJS), n_part),
                            rng.integers(0, len(NOUNS), n_part))]),
        "p_brand": pa.array([f"Brand#{i}" for i in
                             rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(
            ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
        )[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(
            rng.integers(1, 51, n_part).astype("int32"), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
    })
    _write(out_dir, "part", part, 4)

    # --- orders -----------------------------------------------------
    ok = np.arange(n_ord, dtype="int64")
    date_lo, date_hi = _us("1995-01-01"), _us("2001-08-01")
    odate = (rng.integers(0, (date_hi - date_lo) // 86_400_000_000 + 1,
                          n_ord) * 86_400_000_000 + date_lo)
    orders = pa.table({
        "o_orderkey": ok,
        "o_custkey": rng.integers(0, n_cust, n_ord).astype("int64"),
        "o_orderstatus": pa.array(
            np.array(STATUSES)[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _ts_col(odate),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    })
    _write(out_dir, "orders", orders, 8)

    # --- lineitem ---------------------------------------------------
    lik = np.repeat(ok, n_li_per)
    n_li = len(lik)
    linenum = (np.arange(n_li) -
               np.repeat(np.cumsum(n_li_per) - n_li_per, n_li_per) + 1)
    ship_off = rng.integers(1, 96, n_li) * 86_400_000_000
    lineitem = pa.table({
        "l_orderkey": lik,
        "l_partkey": rng.integers(0, n_part, n_li).astype("int64"),
        "l_suppkey": rng.integers(0, n_supp, n_li).astype("int64"),
        "l_linenumber": pa.array(linenum.astype("int32"), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(
            rng.integers(0, 11, n_li).astype("float64") / 100, 2),
        "l_tax": np.round(
            rng.integers(0, 9, n_li).astype("float64") / 100, 2),
        "l_returnflag": pa.array(
            np.array(["N", "R", "A"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(
            np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_col(np.repeat(odate, n_li_per) + ship_off),
    })
    _write(out_dir, "lineitem", lineitem, 8)

    # --- events -----------------------------------------------------
    ek = np.arange(n_ev, dtype="int64")
    ev_lo, ev_hi = _us("2024-01-01"), _us("2024-01-31")
    ets = np.sort(rng.integers(ev_lo, ev_hi, n_ev))
    events = pa.table({
        "event_id": ek,
        "ts": _ts_col(ets),
        "user_id": rng.integers(0, n_users, n_ev).astype("int64"),
        "event_type": pa.array(
            np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.uniform(0, 560, n_ev), 2),
        "props": pa.array([f'{{"k": {k}}}' for k in
                           rng.integers(0, 100, n_ev)]),
    })
    _write(out_dir, "events", events, 8)

    # --- documents (grown vocabulary + organic near-dup density) ----
    vocab = np.array(CORE_VOCAB + TAIL_VOCAB)
    # token distribution: core stays uniform-hot (sf0.1 shape), tail
    # is Zipf(1.3) — new tokens are individually rare, jointly ~20%
    core_w = np.full(len(CORE_VOCAB), 1.0 / len(CORE_VOCAB)) * 0.8
    tail_w = 1.0 / np.power(np.arange(1, len(TAIL_VOCAB) + 1), 1.3)
    tail_w = tail_w / tail_w.sum() * 0.2
    w = np.concatenate([core_w, tail_w])
    doc_lens = rng.integers(8, 100, n_doc)
    texts: list[str] = []
    for L in doc_lens:
        texts.append(" ".join(vocab[rng.choice(len(vocab), L, p=w)]))
    # exact dups (~0.32%) + near-dups: end-append (J>=0.9 for 5-gram
    # shingles on 40+ token docs) and mid-edit (J~0.5-0.85)
    n_exact = int(0.0032 * n_doc)
    n_append = int(0.004 * n_doc)
    n_edit = int(0.004 * n_doc)
    idx = rng.choice(n_doc, n_exact + n_append + n_edit, replace=False)
    for i in idx[:n_exact]:
        texts[i] = texts[(i + 1) % n_doc]
    for i in idx[n_exact:n_exact + n_append]:
        base = texts[(i + 7) % n_doc]
        texts[i] = base + " " + vocab[rng.choice(len(vocab), p=w)]
    for i in idx[n_exact + n_append:]:
        toks = texts[(i + 13) % n_doc].split()
        if len(toks) > 4:
            toks[len(toks) // 2] = str(vocab[rng.choice(len(vocab), p=w)])
        texts[i] = " ".join(toks)
    dk = np.arange(n_doc, dtype="int64")
    documents = pa.table({
        "doc_id": dk,
        "text": pa.array(texts),
        "lang": pa.array(np.array(LANGS)[rng.integers(0, 100, n_doc)]),
        # source domain grows with the corpus (3x the sf0.1 20)
        "source": pa.array([f"src{i}" for i in
                            rng.integers(0, 60, n_doc)]),
        "n_chars": np.array([len(t) for t in texts], dtype="int64"),
    })
    _write(out_dir, "documents", documents, 8)

    # --- embeddings (fresh clustered unit vectors, guard-banded) ----
    dim, n_lab = 64, 10
    centers = rng.normal(size=(n_lab, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, n_lab, n_vec)
    vecs = centers[labels] + rng.normal(scale=0.55, size=(n_vec, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs32 = vecs.astype("float32")
    # guard band on the float32 values both engines actually read
    v64 = vecs32.astype("float64")
    norms = np.sqrt(np.einsum("ij,ij->i", v64, v64))
    step = 4000
    min_gap = np.inf
    for lo in range(0, n_vec, step):
        cos = (v64[lo:lo + step] @ v64.T) / np.outer(
            norms[lo:lo + step], norms)
        np.fill_diagonal(cos[:, lo:lo + step], 0.0)
        min_gap = min(min_gap, np.abs(cos - GUARD_THRESHOLD).min())
    assert min_gap > GUARD, (
        f"guard band violated: a cosine sits {min_gap:.2e} from "
        f"{GUARD_THRESHOLD}; re-seed the generator")
    embeddings = pa.table({
        "vec_id": np.arange(n_vec, dtype="int64"),
        "embedding": pa.array([v for v in vecs32],
                              type=pa.list_(pa.float32())),
        "label": pa.array(labels.astype("int32"), pa.int32()),
    })
    _write(out_dir, "embeddings", embeddings, 4)

    # schema parity assertion, column for column
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents",
                 "embeddings"):
        want = pq.read_schema(f"{SRC}/{name}.parquet")
        path = os.path.join(out_dir, f"{name}.parquet")
        if os.path.isdir(path):
            path = os.path.join(path, sorted(os.listdir(path))[0])
        got = pq.read_schema(path)
        assert [f.name for f in want] == [f.name for f in got], \
            f"{name}: column mismatch {want.names} vs {got.names}"
        for fw, fg in zip(want, got):
            assert fw.type == fg.type, \
                f"{name}.{fw.name}: {fw.type} vs {fg.type}"

    stats = {"mult": mult, "lineitem_rows": int(n_li),
             "documents": int(n_doc), "embeddings": int(n_vec),
             "vocab": int(len(vocab)), "users": int(n_users),
             "guard_gap": float(min_gap)}
    with open(os.path.join(out_dir, "_STATS.json"), "w") as f:
        json.dump(stats, f)
    with open(marker, "w") as f:
        f.write("ok\n")
    print(json.dumps(stats), file=sys.stderr)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mdis_grown_sf1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    build(out, mult)
