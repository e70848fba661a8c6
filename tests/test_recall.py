"""Quality checks for the approximate operators (SURVEY.md §5):
MinHash candidates vs exact-Jaccard truth, LSH/IVF ANN vs brute force.

Approximate ≠ arbitrary: with fixed seeds these outcomes are
deterministic, so the observed recall is pinned as a regression test.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def qs():
    return E.queries()


def test_minhash_candidates_cover_high_jaccard_pairs(spark, qs):
    from manual_data_ingest_spark.io import load_table
    from manual_data_ingest_spark.operators.dedup import _minhash_candidates

    truth = {(r.id_a, r.id_b): r.jaccard
             for r in qs["dedup_near_jaccard"](spark, SF_ORACLE).collect()}
    cand = {(r.id_a, r.id_b)
            for r in _minhash_candidates(
                load_table(spark, SF_ORACLE, "documents")).collect()}
    high = {p for p, j in truth.items() if j >= 0.9}
    assert high, "fixture should contain planted near-dups"
    missed = high - cand
    assert not missed, f"MinHash missed J>=0.9 pairs: {missed}"
    # banding threshold ~0.71 → decent recall on the 0.5+ band too
    mid = {p for p, j in truth.items() if j >= 0.7}
    recall = len(mid & cand) / len(mid)
    assert recall >= 0.8, f"recall@J>=0.7 degraded to {recall}"
    # the REGISTERED operator is the verified set: exactly the J>=0.9 truth
    verified = {(r.id_a, r.id_b)
                for r in qs["dedup_near_minhash"](spark, SF_ORACLE).collect()}
    assert verified == high


def test_ann_results_are_true_neighbors_of_their_candidates(spark, qs):
    """LSH/IVF top-k must equal brute force RESTRICTED to their candidate
    set — approximation may lose neighbors, never mis-rank them."""
    exact = {}
    for r in qs["sim_topk"](spark, SF_ORACLE).collect():
        exact.setdefault(r.probe_id, {})[r.neighbor_id] = r.score
    for name in ("sim_ann_lsh", "sim_ann_ivf"):
        rows = qs[name](spark, SF_ORACLE).collect()
        assert rows, name
        for r in rows:
            # any ANN hit that IS in the exact top-5 must carry the same score
            s = exact.get(r.probe_id, {}).get(r.neighbor_id)
            if s is not None:
                assert abs(s - r.score) < 1e-9, (name, r)
        # scores are sorted within each probe
        by_probe = {}
        for r in rows:
            by_probe.setdefault(r.probe_id, []).append((r.rn, r.score))
        for probe, xs in by_probe.items():
            xs.sort()
            scores = [s for _, s in xs]
            assert scores == sorted(scores, reverse=True), (name, probe)


def test_ivf_candidates_shrink_vs_bruteforce(spark):
    """The IVF cell restriction must actually reduce candidate volume —
    the whole point of the index at 100 TB."""
    from manual_data_ingest_spark.io import load_table

    e = load_table(spark, SF_ORACLE, "embeddings")
    n = e.count()
    per_label = e.groupBy("label").count().agg(F.max("count")).first()[0]
    assert per_label * 10 <= n * 2  # cells are balanced-ish
    assert per_label < n / 5       # each probe scans <20% of the corpus


def test_int8_quantized_topk_recall(spark):
    """sim_quantize_int8: the quantized ranking must recover most of
    the exact top-5 (int8 on 64-dim unit-ish vectors loses little) —
    the measured recall behind the '4x smaller at small recall cost'
    claim. Floor: mean overlap@5 >= 0.8, and every probe >= 3/5."""
    qs = E.queries()
    exact, quant = {}, {}
    for r in qs["sim_topk"](spark, SF_ORACLE).collect():
        exact.setdefault(r.probe_id, set()).add(r.neighbor_id)
    for r in qs["sim_quantize_int8"](spark, SF_ORACLE).collect():
        quant.setdefault(r.probe_id, set()).add(r.neighbor_id)
    assert set(quant) == set(exact)
    overlaps = [len(exact[p] & quant[p]) / 5 for p in exact]
    assert min(overlaps) >= 0.6, overlaps
    assert sum(overlaps) / len(overlaps) >= 0.8, overlaps


def test_knn_graph_blocked_recall_and_rank_fidelity(spark, qs):
    """The LSH-blocked kNN graph may MISS cross-bucket neighbors but
    must never mis-rank within its candidate set, and same-bucket
    recall of the exact graph's edges is pinned."""
    exact = {}
    for r in qs["sim_knn_graph"](spark, SF_ORACLE).collect():
        exact.setdefault(r.src, {})[r.dst] = r.score
    rows = qs["sim_knn_graph_blocked"](spark, SF_ORACLE).collect()
    assert rows
    hits = 0
    total_exact = sum(len(v) for v in exact.values())
    for r in rows:
        s = exact.get(r.src, {}).get(r.dst)
        if s is not None:
            hits += 1
            # an edge kept by blocking carries the identical exact score
            assert abs(s - r.score) < 1e-9, r
    recall = hits / total_exact
    # 16 sign buckets over a 100-vector population of RANDOM unclustered
    # vectors is the LSH worst case (~6 candidates/bucket vs k=5):
    # observed 0.106, pinned as deterministic floor. Rank fidelity above
    # is the semantic law; recall is the documented knob (more bits /
    # multi-probe / IVF key on clustered real corpora).
    assert recall >= 0.10, f"blocked kNN recall collapsed: {recall:.3f}"


def test_hamming_blocked_radius3_recall_is_total(spark, qs):
    """Pigeonhole law: 4 chunks over a 60-bit fp mean ANY pair within
    hamming <= 3 shares an exact chunk, so every exact top-3 neighbor
    at hamming <= 3 MUST appear in the blocked twin's candidate output
    (recall is exact inside the radius, approximate beyond — the
    documented trade)."""
    exact = qs["sim_hamming_topk"](spark, SF_ORACLE).collect()
    blocked = {(r.probe_id, r.neighbor_id)
               for r in qs["sim_hamming_topk_blocked"](spark, SF_ORACLE).collect()}
    assert blocked, "blocked twin returned nothing"
    must_have = [(r.probe_id, r.neighbor_id) for r in exact if r.hamming <= 3]
    missed = [p for p in must_have if p not in blocked]
    assert missed == [], f"in-radius neighbors missed: {missed}"
    # and the blocked output never invents a closer-than-exact rank-1:
    exact_best = {}
    for r in exact:
        exact_best.setdefault(r.probe_id, r.hamming)
    for r in qs["sim_hamming_topk_blocked"](spark, SF_ORACLE).collect():
        if r.rn == 1 and r.probe_id in exact_best:
            assert r.hamming >= exact_best[r.probe_id], r


def test_multiprobe_recall_dominates_plain_lsh(spark):
    """Multi-probe candidates are a superset of the plain bucket's, and
    any candidate that outranks a true top-3 hit is itself a true
    top-3 hit — so recall@3 vs the exact arm must be >= plain LSH's
    for EVERY probe (the docstring's monotonicity claim, pinned)."""
    qs = E.queries()
    exact = {(r.probe_id, r.neighbor_id)
             for r in qs["sim_topk"](spark, SF_ORACLE)
             .filter(F.col("rn") <= 3).collect()}
    probes = sorted({p for p, _ in exact})

    def hits(name):
        got = {(r.probe_id, r.neighbor_id)
               for r in qs[name](spark, SF_ORACLE).collect()}
        return {p: len({x for x in exact if x[0] == p} & got)
                for p in probes}

    plain = hits("sim_ann_lsh")
    multi = hits("sim_ann_lsh_multiprobe")
    assert all(multi[p] >= plain[p] for p in probes), (plain, multi)
    # non-vacuity: somewhere the wider ring actually recovered a hit
    # (holds on all three shipped fixture scales; if a regenerated
    # fixture ever makes this vacuous the assert below says so loudly)
    assert sum(multi.values()) > sum(plain.values()), (plain, multi)


def test_pq_adc_rank_fidelity(spark, qs):
    """ADC with 8×2-bit codes on RANDOM 64-dim vectors is the PQ
    worst case — top-3 recall is legitimately ~0, so the pinned law is
    RANK FIDELITY: per probe, the Spearman correlation between the
    replayed ADC distance and the true squared L2 distance is clearly
    positive (measured 0.25-0.63 across probes and SFs; floor 0.15).
    Also pins that the operator's emitted top-3 equals the replay's
    rounded-rank top-3 — the numpy twin of the DuckDB oracle."""
    import numpy as np
    from tests.pq_replay import load_sorted, pq_replay, adc_scores

    for sf_dir in ("/root/testdata/sf0.001", SF_ORACLE):
        vec_ids, labels, emb = load_sorted(sf_dir)
        n = len(vec_ids)
        codes, cents = pq_replay(emb)
        got = {}
        for r in qs["sim_pq_adc_topk"](spark, sf_dir).collect():
            got.setdefault(r.probe_id, []).append(
                (r.rn, r.neighbor_id, r.adc_dist))
        assert len(got) == 5
        for lbl in range(5):
            idx = np.where(labels == lbl)[0]
            p = idx[0]
            adc = adc_scores(emb, codes, cents, p)
            mask = np.arange(n) != p
            d2 = ((emb - emb[p]) ** 2).sum(axis=1)[mask]
            a = adc[mask]
            ra = np.argsort(np.argsort(a)).astype(float)
            rb = np.argsort(np.argsort(d2)).astype(float)
            ra -= ra.mean(); rb -= rb.mean()
            rho = float((ra * rb).sum()
                        / np.sqrt((ra * ra).sum() * (rb * rb).sum()))
            assert rho > 0.15, (sf_dir, lbl, rho)
            # replay the operator's rounded ranking exactly
            radc = np.floor(adc * 1e6 + 0.5) / 1e6
            radc[p] = np.inf
            order = np.lexsort((vec_ids, radc))[:3]
            expect = [(rk + 1, int(vec_ids[i]), float(radc[i]))
                      for rk, i in enumerate(order)]
            assert sorted(got[int(vec_ids[p])]) == expect, (sf_dir, lbl)


def test_overlap_minhash_calibration_vs_exact(spark, qs):
    """agg_overlap_minhash's estimate must track the exact Jaccard the
    twin op computes: with k=32 signature components the worst-case
    standard error is ~0.09, so a per-pair absolute error ≤ 0.25 (≈3σ)
    pinned on every fixture SF means the sketch is trustworthy for the
    segment-overlap report; a hashing/contract regression (est drifting
    toward 0 or 1) trips this long before the oracle could notice."""
    for sf_dir in ("/root/testdata/sf0.001", SF_ORACLE,
                   "/root/testdata/sf0.1"):
        exact = {(r.type_a, r.type_b): r.jaccard
                 for r in qs["agg_user_overlap_jaccard"](
                     spark, sf_dir).collect()}
        est = {(r.type_a, r.type_b): r.est_jaccard
               for r in qs["agg_overlap_minhash"](spark, sf_dir).collect()}
        assert set(est) == set(exact), sf_dir
        worst = max(abs(est[k] - exact[k]) for k in exact)
        assert worst <= 0.25, (sf_dir, worst)
