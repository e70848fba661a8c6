"""Shared numpy replay of the PQ trained state (init = 4 lowest ids,
2 Lloyd iterations, 6dp centroid rounding, (dist2, cl) argmin) — used
by the ADC guard-band margins and the rank-fidelity law. Mirrors
manual_data_ingest_spark/operators/ml.py::_pq_train.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq


def load_sorted(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "label", "embedding"])
    vid = np.asarray(t["vec_id"].to_pylist())
    lab = np.asarray(t["label"].to_pylist())
    emb = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    o = np.argsort(vid)
    return vid[o], lab[o], emb[o]


def pq_replay(emb: np.ndarray):
    """Return (codes[n, 8], cents: list of 8 dicts cl -> centroid)."""
    n = len(emb)
    codes = np.zeros((n, 8), dtype=np.int64)
    cents = []
    for s in range(8):
        sub = emb[:, s * 8:(s + 1) * 8]
        cent = {cl: np.floor(sub[i] * 1e6 + 0.5) / 1e6
                for cl, i in enumerate(range(4))}
        for _ in range(2):
            assign = np.array(
                [min(cent, key=lambda cl:
                     (float(((sub[i] - cent[cl]) ** 2).sum()), cl))
                 for i in range(n)])
            cent = {cl: np.floor(sub[assign == cl].mean(axis=0)
                                 * 1e6 + 0.5) / 1e6
                    for cl in set(assign.tolist())}
        codes[:, s] = [min(cent, key=lambda cl:
                           (float(((sub[i] - cent[cl]) ** 2).sum()), cl))
                       for i in range(n)]
        cents.append(cent)
    return codes, cents


def adc_scores(emb: np.ndarray, codes: np.ndarray, cents, p: int):
    """ADC distance of every corpus vector to probe p."""
    table = [{cl: float(((emb[p, s * 8:(s + 1) * 8] - c) ** 2).sum())
              for cl, c in cents[s].items()} for s in range(8)]
    return np.array([sum(table[s][codes[i, s]] for s in range(8))
                     for i in range(len(emb))])
