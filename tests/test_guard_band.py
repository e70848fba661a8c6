"""Threshold guard-band checks (r2 advisor item, dedup.py:360).

``dedup_embedding`` / ``dedup_embedding_ann`` / ``sim_threshold_pairs``
filter on the RAW (unrounded) cosine at 0.35. numpy's pairwise
summation can differ in the last bits from DuckDB's sequential
``list_dot_product`` fold, so a pair lying within float-epsilon of the
threshold could be admitted by one engine and rejected by the other.
These tests pin the *fixture-level* precondition that makes the raw
filter safe: on every fixture scale the driver touches, NO candidate
pair's cosine lies within GUARD of the threshold, so any summation
order yields the same admit/reject verdict.

Pure pyarrow+numpy — no Spark session, runs in milliseconds; if a
future fixture regeneration lands a borderline pair, this fails loudly
and the fix is to switch threshold FILTERS back to the bit-exact
left-associated fold (reserving cos_arrow for emitted-and-rounded
scores).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

THRESHOLD = 0.35  # similarity._SIM_THRESHOLD and the dedup_embedding rule
#: worst-case |pairwise - sequential| divergence for a 64-term float64
#: dot product is ~dim * eps * |terms| ~ 1e-13; 1e-9 is 4 orders over
GUARD = 1e-9

SF_DIRS = [d for d in ("/root/testdata/sf0.001",
                       "/root/testdata/sf0.01",
                       "/root/testdata/sf0.1")
           if os.path.isdir(d)]


def _load(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["label", "embedding"])
    emb = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    labels = np.asarray(t["label"].to_pylist())
    return labels, emb


def _cos_matrix(emb: np.ndarray) -> np.ndarray:
    norms = np.sqrt(np.einsum("ij,ij->i", emb, emb))
    return (emb @ emb.T) / np.outer(norms, norms)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_no_pair_within_guard_band_of_threshold(sf_dir: str) -> None:
    labels, emb = _load(sf_dir)
    cos = _cos_matrix(emb)
    iu = np.triu_indices(len(emb), k=1)
    # strictest superset of every operator's candidate set: ALL pairs
    # (label blocking / LSH bucketing only shrink it)
    gaps = np.abs(cos[iu] - THRESHOLD)
    assert gaps.min() > GUARD, (
        f"{sf_dir}: pair within {gaps.min():.3e} of the {THRESHOLD} "
        f"threshold — raw-score filters are no longer order-safe")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_centroid_classify_argmax_margin(sf_dir: str) -> None:
    """ml_centroid_classify pins its argmax on raw cosine scores: the
    top1-vs-top2 centroid-similarity gap must dwarf engine last-bit
    drift (~1e-12) so Spark (einsum) and DuckDB (sequential fold)
    elect the same centroid for every vector."""
    labels, emb = _load(sf_dir)
    cents = np.stack([emb[labels == l].mean(axis=0)
                      for l in np.unique(labels)])
    sims = (emb @ cents.T) / np.outer(
        np.sqrt(np.einsum("ij,ij->i", emb, emb)),
        np.sqrt(np.einsum("ij,ij->i", cents, cents)))
    top2 = np.sort(sims, axis=1)[:, -2:]
    margin = (top2[:, 1] - top2[:, 0]).min()
    assert margin > 5e-6, (
        f"{sf_dir}: centroid argmax margin {margin:.3e} too small for "
        "raw-score election")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_bollinger_breakout_distance(sf_dir: str) -> None:
    """win_bollinger's breakout flag compares raw daily cents against
    raw mu +/- 2*sd; both sides drift only via window-frame summation
    association (~1e-6 cents). Pin that no fixture day sits within
    1e-3 cents of either band."""
    t = pq.read_table(f"{sf_dir}/orders.parquet",
                      columns=["o_orderdate", "o_totalprice"])
    import collections
    daily = collections.defaultdict(int)
    for d, p in zip(t["o_orderdate"].to_pylist(),
                    t["o_totalprice"].to_pylist()):
        daily[d] += int(np.floor(p * 100.0 + 0.5))
    days = sorted(daily)
    cents = np.array([daily[d] for d in days], dtype=np.float64)
    n = 20
    min_gap = np.inf
    for i in range(n - 1, len(cents)):
        w = cents[i - n + 1:i + 1]
        mu = w.sum() / n
        sd = np.sqrt(max(((w * w).sum() - w.sum() ** 2 / n) / (n - 1), 0.0))
        for band in (mu - 2.0 * sd, mu + 2.0 * sd):
            min_gap = min(min_gap, abs(cents[i] - band))
    assert min_gap > 1e-3, (
        f"{sf_dir}: a day sits {min_gap:.3e} cents from a Bollinger band "
        "— raw breakout comparison no longer order-safe")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_mmr_rounding_boundaries_and_margins(sf_dir: str) -> None:
    """sim_mmr_diversify ranks on 6dp-ROUNDED cosines: safe iff (a) no
    raw relevance/pairwise cosine in the candidate pools sits within
    1e-9 of a 1e-6 rounding boundary (engine drift cannot flip the
    rounded value), and (b) no greedy argmax step has a rounded-score
    tie resolved differently than the cid tie-break (ties are fine —
    both engines break on cid — so only (a) is load-bearing; margins
    are asserted informationally via the tie-break's determinism)."""
    labels, emb = _load(sf_dir)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
    vec_ids = np.asarray(t["vec_id"].to_pylist())
    order = np.argsort(vec_ids)
    vec_ids, labels, emb = vec_ids[order], labels[order], emb[order]
    norms = np.sqrt(np.einsum("ij,ij->i", emb, emb))
    checked = 0
    for lbl in range(5):
        idx = np.where(labels == lbl)[0]
        if len(idx) == 0:
            continue
        p = idx[0]  # lowest vec_id of the label (sorted above)
        rel = (emb @ emb[p]) / (norms * norms[p])
        rel[p] = -np.inf
        ranked = np.argsort(-rel, kind="stable")
        pool = ranked[:8]
        # pool-boundary margin (r4 ADVICE): the top-8 pool is cut on RAW
        # relevance, so the rel[7]-vs-rel[8] gap must exceed engine
        # drift (or be EXACTLY tied, which the cid tie-break resolves
        # deterministically) — else sub-ulp drift admits different
        # candidates and flips the diversified picks.
        if len(ranked) > 8:
            cut_gap = rel[ranked[7]] - rel[ranked[8]]
            assert cut_gap == 0.0 or cut_gap > 1e-9, (
                f"{sf_dir} label {lbl}: raw pool-cut margin {cut_gap:.3e} "
                "within engine drift of the 8th/9th candidate boundary")
        # pairwise sims within the pool + relevance values
        vals = list(rel[pool])
        sub = emb[pool]
        subn = norms[pool]
        pair = (sub @ sub.T) / np.outer(subn, subn)
        vals.extend(pair[np.triu_indices(len(pool), k=1)])
        for v in vals:
            frac = abs((v * 1e6 + 0.5) % 1.0)
            dist = min(frac, 1.0 - frac)
            assert dist > 1e-3, (
                f"{sf_dir} label {lbl}: cosine {v!r} sits {dist:.2e} "
                "(x1e-6) from a 6dp rounding boundary")
            checked += 1
    assert checked > 0


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_ann_recall_rank_boundary_margins(sf_dir: str) -> None:
    """sim_ann_recall_report counts top-3 set overlap between the exact
    arm and the LSH-bucket arm; both top-3 cuts rank on RAW cosine with
    vec_id tie-break. Safe iff at every probe the rank-3/rank-4 raw
    margin exceeds engine summation drift in BOTH arms (exact ties are
    fine — the vec_id tie-break is deterministic on both engines)."""
    labels, emb = _load(sf_dir)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
    vec_ids = np.asarray(t["vec_id"].to_pylist())
    order = np.argsort(vec_ids)
    vec_ids, labels, emb = vec_ids[order], labels[order], emb[order]
    norms = np.sqrt(np.einsum("ij,ij->i", emb, emb))
    # LSH bucket = sign bits of dims 0..3 (similarity._LSH_BUCKET_*)
    bucket = sum((emb[:, i] >= 0).astype(int) << i for i in range(4))
    checked = 0
    for lbl in range(5):
        idx = np.where(labels == lbl)[0]
        if len(idx) == 0:
            continue
        p = idx[0]
        rel = (emb @ emb[p]) / (norms * norms[p])
        ring = {bucket[p] ^ f for f in (0, 1, 2, 4, 8)}
        for arm, mask in (("exact", np.ones(len(rel), bool)),
                          ("ann", bucket == bucket[p]),
                          ("multiprobe", np.isin(bucket, list(ring)))):
            cand = np.where(mask)[0]
            cand = cand[cand != p]
            if len(cand) < 4:
                continue  # no rank-4 boundary to cross
            vals = np.sort(rel[cand])[::-1]
            gap = vals[2] - vals[3]
            assert gap == 0.0 or gap > GUARD, (
                f"{sf_dir} label {lbl} {arm}: rank-3/4 cosine margin "
                f"{gap:.3e} within engine drift")
            checked += 1
    assert checked > 0


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_stats_agg_rounding_boundaries(sf_dir: str) -> None:
    """agg_spearman / agg_anova_f / agg_cramers_v sum a handful of
    per-group double terms before ONE final rounded expression; the
    sum's association order differs between engines (~1e-12 abs
    drift). Pin that on every fixture scale each emitted statistic
    sits farther than GUARD from its rounding boundary, so any
    summation order rounds identically (independent numpy
    recomputation, not the oracle SQL)."""
    import duckdb

    def gap(v: float, digits: int) -> float:
        x = v * 10.0 ** digits + 0.5
        return abs(x - np.round(x))

    con = duckdb.connect()
    # spearman (6dp): doubled average ranks are exact ints -> drift
    # only in the final expression; still pin the boundary.
    li = con.execute(
        f"SELECT l_returnflag, l_quantity, l_extendedprice "
        f"FROM '{sf_dir}/lineitem.parquet'").fetchnumpy()
    flags = li["l_returnflag"]
    for fl in np.unique(flags):
        m = flags == fl
        for q_, p_ in [(li["l_quantity"][m], li["l_extendedprice"][m])]:
            def r2(v):
                order = np.argsort(v, kind="stable")
                le = np.searchsorted(np.sort(v), v, side="right")
                lt = np.searchsorted(np.sort(v), v, side="left")
                return (le + lt + 1).astype(np.float64)
            rx, ry = r2(q_), r2(p_)
            n = float(len(rx))
            vx = n * (rx * rx).sum() - rx.sum() ** 2
            vy = n * (ry * ry).sum() - ry.sum() ** 2
            rho = (n * (rx * ry).sum() - rx.sum() * ry.sum()) / np.sqrt(vx * vy)
            assert gap(rho, 6) > 1e-6, (fl, rho)
            # agg_spearman_grid (6dp): same law on the GRID-BINNED
            # values (quantity native grid, price $100 bins), plus the
            # docstring's fidelity claim |rho_grid - rho_exact| < 2e-3.
            rgx, rgy = r2(np.floor(q_)), r2(np.floor(p_ / 100.0))
            vgx = n * (rgx * rgx).sum() - rgx.sum() ** 2
            vgy = n * (rgy * rgy).sum() - rgy.sum() ** 2
            rho_g = (n * (rgx * rgy).sum() - rgx.sum() * rgy.sum()) \
                / np.sqrt(vgx * vgy)
            assert gap(rho_g, 6) > 1e-6, (fl, rho_g)
            assert abs(rho_g - rho) < 2e-3, (fl, rho_g, rho)
    # anova_f (6dp) + ss terms (4dp) over customer cents
    cust = con.execute(
        f"SELECT c_mktsegment, floor(c_acctbal*100.0+0.5)::BIGINT AS c "
        f"FROM '{sf_dir}/customer.parquet'").fetchnumpy()
    segs = cust["c_mktsegment"]
    cents = cust["c"].astype(np.int64)
    ni = []; si = []; qi = []
    for sg in np.unique(segs):
        m = segs == sg
        ni.append(m.sum()); si.append(int(cents[m].sum()))
        qi.append(int((cents[m].astype(object) ** 2).sum()))
    k, n = len(ni), sum(ni)
    sg_ = sum(float(s) * s / c for s, c in zip(si, ni))
    s_all, q_all = float(sum(si)), float(sum(qi))
    ssb, ssw = sg_ - s_all * s_all / n, q_all - sg_
    sst = q_all - s_all * s_all / n
    f_stat = (ssb / (k - 1)) / (ssw / (n - k))
    assert gap(ssb / sst, 6) > 1e-6, ssb / sst
    assert gap(f_stat, 6) > 1e-6, f_stat
    # cramers_v (6dp) / chi2 (4dp) over the joined contingency
    cells = con.execute(
        f"SELECT c_mktsegment, o_orderpriority, count(*)::BIGINT "
        f"FROM '{sf_dir}/orders.parquet' o "
        f"JOIN '{sf_dir}/customer.parquet' c ON o_custkey = c_custkey "
        f"GROUP BY 1, 2").fetchall()
    segs_u = sorted({r[0] for r in cells})
    prios_u = sorted({r[1] for r in cells})
    obs = np.zeros((len(segs_u), len(prios_u)))
    for sgm, pr, c_ in cells:
        obs[segs_u.index(sgm), prios_u.index(pr)] = c_
    rtot, ctot, ntot = obs.sum(1), obs.sum(0), obs.sum()
    exp = np.outer(rtot, ctot) / ntot
    chi2 = ((obs - exp) ** 2 / exp).sum()
    v = np.sqrt(chi2 / (ntot * (min(obs.shape) - 1)))
    assert gap(chi2, 4) > 1e-4, chi2
    assert gap(v, 6) > 1e-6, v


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_rrf_fusion_arm_cut_margins(sf_dir: str) -> None:
    """sim_rrf_fusion fuses each arm's top-10; the candidate set is
    safe iff at every probe the rank-10/11 RAW margin exceeds engine
    drift in BOTH arms (dense cosine and int8-quantized dot). Fused
    scores themselves are exact rationals of the ranks — no float
    discipline needed past the cut."""
    labels, emb = _load(sf_dir)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
    vec_ids = np.asarray(t["vec_id"].to_pylist())
    order = np.argsort(vec_ids)
    vec_ids, labels, emb = vec_ids[order], labels[order], emb[order]
    norms = np.sqrt(np.einsum("ij,ij->i", emb, emb))
    s = np.maximum(np.abs(emb).max(axis=1), 1e-12) / 127.0
    qv = np.floor(emb / s[:, None] + 0.5)
    checked = 0
    for lbl in range(5):
        idx = np.where(labels == lbl)[0]
        if len(idx) == 0:
            continue
        p = idx[0]
        arms = {
            "dense": (emb @ emb[p]) / (norms * norms[p]),
            "quant": (qv @ qv[p]) * s * s[p],
        }
        for arm, rel in arms.items():
            cand = np.delete(np.arange(len(rel)), p)
            vals = np.sort(rel[cand])[::-1]
            if len(vals) < 11:
                continue
            gap = vals[9] - vals[10]
            assert gap == 0.0 or gap > GUARD, (
                f"{sf_dir} label {lbl} {arm}: rank-10/11 margin "
                f"{gap:.3e} within engine drift")
            checked += 1
    assert checked > 0


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_bm25_rank_and_rounding_margins(sf_dir: str) -> None:
    """sim_bm25_topk ranks on RAW summed BM25 scores (per-token float
    contributions summed in engine order): pin (a) the rank-3/4 margin
    per probe and (b) the emitted top-3 scores' distance from a 6dp
    rounding boundary."""
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    scores = con.execute("""
        WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS token
                     FROM documents),
        tf AS (SELECT doc_id, token, count(*)::DOUBLE AS tf
               FROM tok GROUP BY 1,2),
        dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
        stats AS (SELECT count(*)::DOUBLE AS n, avg(dl)::DOUBLE AS avgdl
                  FROM dl),
        idf AS (SELECT token, ln(1.0::DOUBLE +
                    ((SELECT n FROM stats) - count(*)::DOUBLE + 0.5)
                    / (count(*)::DOUBLE + 0.5)) AS idf
                FROM tf GROUP BY 1)
        SELECT q.doc_id AS probe_id, tf.doc_id AS neighbor_id,
               sum(idf.idf * tf.tf * 2.2
                   / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                      / (SELECT avgdl FROM stats)))) AS raw
        FROM (SELECT DISTINCT doc_id, token FROM tf WHERE doc_id < 10) q
        JOIN tf ON tf.token = q.token AND tf.doc_id <> q.doc_id
        JOIN dl ON dl.doc_id = tf.doc_id
        JOIN idf ON idf.token = q.token
        GROUP BY 1, 2
    """).fetchall()
    by_probe: dict = {}
    for pid, nid, raw in scores:
        by_probe.setdefault(pid, []).append(raw)
    checked = 0
    for pid, vals in by_probe.items():
        vals = np.sort(np.asarray(vals))[::-1]
        if len(vals) >= 4:
            gap = vals[2] - vals[3]
            # BM25 sums span ~30 tokens; drift bound ~1e-12, 1e-9 margin
            assert gap == 0.0 or gap > GUARD, (
                f"{sf_dir} probe {pid}: BM25 rank-3/4 margin {gap:.3e}")
        for v in vals[:3]:
            frac = abs((v * 1e6 + 0.5) % 1.0)
            dist = min(frac, 1.0 - frac)
            assert dist > 1e-6, (
                f"{sf_dir} probe {pid}: BM25 score {v!r} sits {dist:.2e} "
                "(x1e-6) from a 6dp rounding boundary")
        checked += 1
    assert checked > 0


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_lorenz_spend_rounding_boundaries(sf_dir: str) -> None:
    """agg_lorenz_curve ranks customers on 2dp-ROUNDED total spend: the
    order is engine-stable iff no customer's RAW spend sum sits within
    summation drift of a half-cent boundary (where the two engines'
    floor(x*100+0.5) could disagree)."""
    import duckdb

    con = duckdb.connect()
    spends = con.execute(f"""
        SELECT sum(o_totalprice) FROM '{sf_dir}/orders.parquet'
        GROUP BY o_custkey
    """).fetchall()
    vals = np.asarray([s[0] for s in spends], dtype=np.float64)
    frac = np.abs((vals * 100.0 + 0.5) % 1.0)
    dist = np.minimum(frac, 1.0 - frac)
    # drift of a ~10-term double sum at 1e5 magnitude is ~1e-10
    assert dist.min() > 1e-6, (
        f"{sf_dir}: customer spend {vals[dist.argmin()]!r} sits "
        f"{dist.min():.2e} (x1e-2 cents) from a half-cent boundary")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_neyman_rounding_boundaries(sf_dir: str) -> None:
    """sample_neyman_allocation emits 4dp-rounded stddevs and 6dp
    shares, and integer-allocates off the rounded shares: pin every
    raw value's distance from its rounding grid (stddev_samp differs
    across engines only at ~1e-12 relative)."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(f"""
        WITH s AS (SELECT c_mktsegment, count(*)::DOUBLE AS n_h,
                          stddev_samp(c_acctbal) AS s_h
                   FROM '{sf_dir}/customer.parquet' GROUP BY 1)
        SELECT s_h, n_h * s_h / sum(n_h * s_h) OVER () AS w,
               n_h / sum(n_h) OVER () AS p
        FROM s
    """).fetchall()
    for s_h, w, p in rows:
        for v, grid, label in ((s_h, 1e4, "sd@4dp"), (w, 1e6, "share@6dp"),
                               (p, 1e6, "prop@6dp")):
            frac = abs((v * grid + 0.5) % 1.0)
            dist = min(frac, 1.0 - frac)
            assert dist > 1e-6, (
                f"{sf_dir} {label}: {v!r} sits {dist:.2e} from a "
                "rounding boundary")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_pq_adc_rank_and_rounding_margins(sf_dir: str) -> None:
    """sim_pq_adc_topk ranks on RAW 8-term ADC sums: full numpy replay
    of the trained trajectory (init 4 lowest ids, 2 Lloyd iters, 6dp
    centroid rounding, (dist2, cl) argmin), then pin per probe (a) the
    rank-3/4 ADC margin, (b) pairwise separation within the top-5
    (two same-code-tuple neighbors sum the SAME table entries in
    engine-dependent order — they must not sit inside the head), and
    (c) the emitted top-3 values' 6dp boundary distances."""
    from tests.pq_replay import load_sorted, pq_replay, adc_scores

    vec_ids, labels, emb = load_sorted(sf_dir)
    n = len(vec_ids)
    codes, cents = pq_replay(emb)

    checked = 0
    for lbl in range(5):
        idx = np.where(labels == lbl)[0]
        if len(idx) == 0:
            continue
        p = idx[0]
        adc = adc_scores(emb, codes, cents, p)
        cand = np.delete(np.arange(n), p)
        vals = np.sort(adc[cand])
        # The operator ranks on the 6dp-ROUNDED distance with the
        # neighbor_id tie-break (same-code-tuple candidates sum the
        # SAME 8 table entries in engine-dependent order, so raw-rank
        # margins cannot be pinned — a same-tuple pair sits INSIDE the
        # top-3 at sf0.1). Determinism therefore needs exactly one
        # property: no head-relevant RAW value within engine drift of
        # a 6dp rounding boundary. Pin it for the top-8 envelope.
        for v in vals[:8]:
            frac = abs((v * 1e6 + 0.5) % 1.0)
            dist = min(frac, 1.0 - frac)
            assert dist > 1e-6, (
                f"{sf_dir} label {lbl}: ADC {v!r} sits {dist:.2e} "
                "from a 6dp boundary")
        checked += 1
    assert checked > 0


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_item_cooccurrence_rank_boundaries(sf_dir: str) -> None:
    """sim_item_cooccurrence ranks neighbors on the 6dp-ROUNDED cosine
    (partkey tie-break): pin that each probe's rank-3/4 rounded-cosine
    gap is either an exact tie (id-break decides, deterministic) or
    wider than engine drift, and that every emitted cosine sits away
    from its rounding boundary (independent duckdb+numpy replay)."""
    import duckdb

    con = duckdb.connect()
    li = con.execute(
        f"SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk "
        f"FROM '{sf_dir}/lineitem.parquet'").fetchnumpy()
    ok, pk = li["ok"], li["pk"]
    import collections
    n_ord = collections.Counter(pk.tolist())
    probes = sorted(n_ord, key=lambda p: (-n_ord[p], p))[:10]
    baskets = collections.defaultdict(list)
    for o, p in zip(ok.tolist(), pk.tolist()):
        baskets[o].append(p)
    checked = 0
    for pr in probes:
        co = collections.Counter()
        for o, items in baskets.items():
            if pr in items:
                for q in items:
                    if q != pr:
                        co[q] += 1
        if not co:
            continue
        vals = []
        for q, c in co.items():
            cos = c / np.sqrt(n_ord[pr] * n_ord[q])
            r = np.floor(cos * 1e6 + 0.5) / 1e6
            # emitted value boundary distance (raw vs grid)
            g = abs(cos * 1e6 + 0.5 - np.round(cos * 1e6 + 0.5))
            assert g > 1e-6, (sf_dir, pr, q, cos)
            vals.append(r)
        vals.sort(reverse=True)
        if len(vals) >= 4:
            gap = vals[2] - vals[3]
            assert gap == 0.0 or gap > 5e-7, (sf_dir, pr, gap)
        checked += 1
    assert checked > 0


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_woe_rounding_boundaries(sf_dir: str) -> None:
    """ml_woe_encoding emits 6dp-rounded ln-derived values (PARITY #31:
    ln is ≤1 ulp cross-engine, safe only away from rounding
    boundaries): pin every woe/iv_term's boundary distance on each
    fixture SF via an independent duckdb+numpy replay."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(f"""
      SELECT c_mktsegment, sum((o_orderpriority = '1-URGENT')::INT),
             count(*) FROM '{sf_dir}/orders.parquet' o
      JOIN '{sf_dir}/customer.parquet' c ON o_custkey = c_custkey
      GROUP BY 1""").fetchall()
    t_pos = sum(r[1] for r in rows)
    t_neg = sum(r[2] - r[1] for r in rows)

    def gap(v: float, digits: int) -> float:
        x = v * 10.0 ** digits + 0.5
        return abs(x - np.round(x))

    for seg, npos, n in rows:
        nneg = n - npos
        pp = (npos + 0.5) / (t_pos + 0.5)
        pn = (nneg + 0.5) / (t_neg + 0.5)
        woe = np.log(pp / pn)
        assert gap(woe, 6) > 1e-6, (sf_dir, seg, woe)
        assert gap((pp - pn) * woe, 6) > 1e-6, (sf_dir, seg)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_perplexity_micronat_boundaries(sf_dir: str) -> None:
    """text_perplexity_ngram quantizes each bigram surprisal to
    micro-nats (floor(−ln p·1e6+0.5)) so all downstream aggregation is
    exact integers; the quantization is cross-engine-safe iff no
    surprisal sits within ln-drift (~1e-12 relative) of a 0.5 grid
    boundary. Pin the minimum boundary distance over EVERY distinct
    (bigram, doc-independent) surprisal value on each fixture SF
    (vectorized duckdb+numpy replay)."""
    import duckdb

    con = duckdb.connect()
    vals = con.execute(f"""
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS l
        FROM '{sf_dir}/documents.parquet'
        WHERE text IS NOT NULL AND source IS NOT NULL
      ), uni AS (
        SELECT w, count(*)::BIGINT AS c
        FROM (SELECT unnest(l) AS w FROM toks) GROUP BY 1
      ), tot AS (SELECT sum(c)::BIGINT AS t FROM uni),
      bg AS (
        SELECT l[i] AS w1, l[i + 1] AS w2, count(*)::BIGINT AS bc
        FROM toks, LATERAL unnest(generate_series(1, len(l) - 1)) AS u(i)
        WHERE len(l) >= 2 GROUP BY 1, 2
      )
      SELECT DISTINCT bc, u1.c AS c1, u2.c AS c2, tot.t
      FROM bg JOIN uni u1 ON bg.w1 = u1.w JOIN uni u2 ON bg.w2 = u2.w
      CROSS JOIN tot""").fetchnumpy()
    p = (0.75 * vals["bc"].astype(np.float64) / vals["c1"]
         + 0.25 * vals["c2"].astype(np.float64) / vals["t"])
    x = -np.log(p) * 1e6 + 0.5
    dist = np.abs(x - np.round(x))
    # ln's cross-engine drift is ~1e-12 relative of values ~5e6 micro-
    # nats => ~5e-6 absolute on the grid; require 100x headroom
    assert dist.min() > 5e-4, (sf_dir, float(dist.min()), int(len(x)))
