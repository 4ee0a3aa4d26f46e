"""Mergeable sketches for approximate aggregation at 100 TB scale.

The reference has no approximate aggregates (SURVEY.md §2.5); a
training-data pipeline needs them.  Sketches are the guide's partial-agg
pattern taken to its limit: one serialized sketch per batch, merged in a
tiny second stage — constant shuffle volume no matter the input size.

- HyperLogLog (public algorithm, Flajolet et al.): approximate distinct
  count with ~1.04/sqrt(2^p) relative error; registers merge by max.
- Misra-Gries heavy hitters: k-counter summary, mergeable, superset
  guarantee for items with frequency > n/k.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

HLL_P = 12  # 4096 registers → ~1.6% expected error
_M = 1 << HLL_P

# One distributed merge level between the per-batch partials and the driver
# fold: repartition(TREE_FANIN) + per-partition merge, so take_all() always
# receives O(TREE_FANIN) rows — independent of block count (r3 verdict: at
# 10^6 blocks the raw partial fold alone is ~4 GB of driver state).
TREE_FANIN = 8


def _fmix64(h: np.ndarray) -> np.ndarray:
    """murmur3 finalizer (public): FNV's high bits avalanche poorly for
    short keys — the HLL bucket index uses the TOP p bits, so mix."""
    h = h ^ (h >> np.uint64(33))
    h = h * np.uint64(0xFF51AFD7ED558CCD)
    h = h ^ (h >> np.uint64(33))
    h = h * np.uint64(0xC4CEB9FE1A85EC53)
    return h ^ (h >> np.uint64(33))


def _hash64(tokens: list[str]) -> np.ndarray:
    """C-speed token hashing: pd.util.hash_array (siphash, deterministic
    across processes — the repo-standard from functions/dedup.py) plus the
    murmur finalizer so the HLL bucket index reads well-mixed TOP bits."""
    import pandas as pd

    if not tokens:
        return np.empty(0, dtype=np.uint64)
    h = pd.util.hash_array(np.asarray(tokens, dtype=object))
    with np.errstate(over="ignore"):
        return _fmix64(h)


def hll_from_tokens(tokens: list[str]) -> np.ndarray:
    """Build an HLL register array (uint8[4096]) from token strings."""
    regs = np.zeros(_M, dtype=np.uint8)
    if not tokens:
        return regs
    hashes = _hash64(tokens)
    idx = (hashes >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = hashes << np.uint64(HLL_P)
    # rank = leading zeros of the remaining 64-p bits, + 1
    ranks = np.ones(len(hashes), dtype=np.uint8)
    zero_mask = rest == 0
    ranks[zero_mask] = 64 - HLL_P + 1
    active = ~zero_mask
    # vectorized leading-zero count via per-byte scan
    nz = rest[active]
    if nz.size:
        # log2 of top bit position: use 64 - bit_length
        bits = np.frombuffer(nz.astype(">u8").tobytes(), dtype=np.uint8)
        bits = bits.reshape(-1, 8)
        lz = np.zeros(len(nz), dtype=np.uint8)
        found = np.zeros(len(nz), dtype=bool)
        for byte_i in range(8):
            byte = bits[:, byte_i]
            has = (~found) & (byte != 0)
            if has.any():
                lz_byte = (7 - np.floor(np.log2(byte[has])).astype(np.uint8))
                lz[has] = byte_i * 8 + lz_byte
                found |= has
        ranks[active] = lz + 1
    np.maximum.at(regs, idx, ranks)
    return regs


def hll_merge(sketches: list[np.ndarray]) -> np.ndarray:
    out = np.zeros(_M, dtype=np.uint8)
    for s in sketches:
        np.maximum(out, s, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    m = float(_M)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(2.0 ** (-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)  # small-range correction
    return float(est)


def approx_distinct_tokens(sf_dir: str) -> "object":
    """Approximate distinct token count over documents: one HLL per batch
    → merge → single-row estimate (+ exact via the word_count groupby
    would cost a full shuffle; the sketch costs 4 KB per batch)."""
    import re

    import pandas as pd

    import ray.data as rd

    from jimmy_ray.functions.textstats import TOKEN_RE

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    pat = re.compile(TOKEN_RE)

    def partial(batch: pa.Table) -> pa.Table:
        tokens: list[str] = []
        for text in batch["text"].to_pylist():
            tokens.extend(pat.findall(text.lower()))
        regs = hll_from_tokens(tokens)
        return pa.table({"sketch": pa.array([regs.tobytes()], pa.binary())})

    def merge_partition(batch: pa.Table) -> pa.Table:
        merged = hll_merge([
            np.frombuffer(s.as_py(), dtype=np.uint8) for s in batch["sketch"]
        ])
        return pa.table({"sketch": pa.array([merged.tobytes()], pa.binary())})

    tree = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=2048)
        .repartition(TREE_FANIN)
        .map_batches(merge_partition, batch_format="pyarrow", batch_size=None)
    )
    sketches = [
        np.frombuffer(row["sketch"], dtype=np.uint8)
        for row in tree.take_all()  # ≤ TREE_FANIN rows by construction
    ]
    estimate = hll_estimate(hll_merge(sketches))
    return pd.DataFrame({"approx_distinct_tokens": [round(estimate)]})


# --- Misra-Gries heavy hitters ---------------------------------------------

def mg_summarize(tokens: list[str], k: int) -> dict[str, int]:
    counters: dict[str, int] = {}
    for t in tokens:
        if t in counters:
            counters[t] += 1
        elif len(counters) < k - 1:
            counters[t] = 1
        else:
            for key in list(counters):
                counters[key] -= 1
                if counters[key] == 0:
                    del counters[key]
    return counters


def mg_merge(summaries: list[dict[str, int]], k: int) -> dict[str, int]:
    merged: dict[str, int] = {}
    for s in summaries:
        for t, c in s.items():
            merged[t] = merged.get(t, 0) + c
    if len(merged) >= k:
        # subtract the k-th largest count and drop non-positive
        kth = sorted(merged.values(), reverse=True)[k - 1]
        merged = {t: c - kth for t, c in merged.items() if c - kth > 0}
    return merged


def heavy_hitter_tokens(sf_dir: str, k: int = 16) -> "object":
    """Misra-Gries candidates merged across batches; guaranteed superset
    of tokens with frequency > n_tokens/k."""
    import re

    import pandas as pd

    import ray.data as rd

    from jimmy_ray.functions.textstats import TOKEN_RE

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    pat = re.compile(TOKEN_RE)

    def partial(batch: pa.Table) -> pa.Table:
        tokens: list[str] = []
        for text in batch["text"].to_pylist():
            tokens.extend(pat.findall(text.lower()))
        summary = mg_summarize(tokens, k)
        return pa.table({"token": pa.array(list(summary), pa.string()),
                         "c": pa.array(list(summary.values()), pa.int64())})

    def merge_partition(batch: pa.Table) -> pa.Table:
        acc: dict[str, int] = {}
        for t, c in zip(batch["token"].to_pylist(), batch["c"].to_pylist()):
            acc[t] = acc.get(t, 0) + c
        merged = mg_merge([acc], k)  # ≤ k-1 counters per partition
        return pa.table({"token": pa.array(list(merged), pa.string()),
                         "c": pa.array(list(merged.values()), pa.int64())})

    parts = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=2048)
        .repartition(TREE_FANIN)
        .map_batches(merge_partition, batch_format="pyarrow", batch_size=None)
        .take_all()  # ≤ TREE_FANIN × (k-1) rows by construction
    )
    merged: dict[str, int] = {}
    for row in parts:
        merged[row["token"]] = merged.get(row["token"], 0) + row["c"]
    top = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pd.DataFrame({"token": [t for t, _ in top],
                         "approx_count": [c for _, c in top]})


# --- mergeable quantile sketch (per-batch compressed CDF) ------------------

QS_K = 64  # order statistics kept per batch -> per-batch rank error ~ n/K


def quantile_compress(values: np.ndarray, k: int = QS_K) -> tuple[np.ndarray, float]:
    """(k sorted order statistics, weight per point) for one batch."""
    v = np.sort(values.astype(np.float64))
    if v.size <= k:
        return v, 1.0
    idx = np.floor((np.arange(k) + 0.5) * v.size / k).astype(np.int64)
    return v[idx], v.size / k


def quantile_recompress(points: np.ndarray, weights: np.ndarray,
                        k: int = QS_K) -> tuple[np.ndarray, np.ndarray]:
    """Merge weighted sketch points back down to ≤ k points (the tree-merge
    level): sort, pick the points at k evenly spaced cumulative-weight
    targets, give each total/k weight.  Adds ≤ 1/k rank error on top of the
    per-batch bound; passthrough when already ≤ k points."""
    if points.size <= k:
        return points, weights
    order = np.argsort(points, kind="stable")
    pts, w = points[order], weights[order]
    cum = np.cumsum(w)
    total = cum[-1]
    targets = (np.arange(k) + 0.5) * total / k
    idx = np.minimum(np.searchsorted(cum, targets, side="left"), pts.size - 1)
    return pts[idx], np.full(k, total / k)


def weighted_quantiles(points: np.ndarray, weights: np.ndarray,
                       probs: list[float]) -> list[float]:
    order = np.argsort(points, kind="stable")
    pts, w = points[order], weights[order]
    cum = np.cumsum(w)
    total = cum[-1]
    out = []
    for p in probs:
        target = p * total
        j = int(np.searchsorted(cum, target, side="left"))
        out.append(float(pts[min(j, len(pts) - 1)]))
    return out


def doc_length_quantiles(sf_dir: str,
                         probs=(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)):
    """Approximate doc-length quantiles via a mergeable sketch: each batch
    ships K weighted order statistics (constant bytes per batch, like the
    HLL row), a tree-merge level re-compresses per partition, and the
    driver folds ≤ TREE_FANIN × K points — never the column and never
    O(blocks).  Rank error ≤ 1/K per level; accuracy asserted in tests."""
    import pandas as pd

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        pts, weight = quantile_compress(
            batch["n_chars"].to_numpy(zero_copy_only=False)
        )
        return pa.table({
            "point": pa.array(pts, pa.float64()),
            "weight": pa.array(np.full(pts.size, weight), pa.float64()),
        })

    def merge_partition(batch: pa.Table) -> pa.Table:
        pts, wts = quantile_recompress(
            batch["point"].to_numpy(), batch["weight"].to_numpy())
        return pa.table({"point": pa.array(pts, pa.float64()),
                         "weight": pa.array(wts, pa.float64())})

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .repartition(TREE_FANIN)
        .map_batches(merge_partition, batch_format="pyarrow", batch_size=None)
        .take_all()  # ≤ TREE_FANIN × QS_K rows by construction
    )
    points = np.array([r["point"] for r in rows])
    weights = np.array([r["weight"] for r in rows])
    qs = weighted_quantiles(points, weights, list(probs))
    return pd.DataFrame({
        "p": list(probs),
        "n_chars_quantile": qs,
    })
