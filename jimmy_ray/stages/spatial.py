"""Spatial operators: cell/tile assignment, point-in-polygon joins, kNN.

North-rule layer (BASELINE.json): cell index → point-in-polygon join
(candidate prune + exact refine) → kNN (per-batch bounded top-k + merge)
→ tile materialization.  All cell/tile math is exact int64 microdegrees
(jimmy_ray.geo.core); the join refine is exact integer ray casting
(jimmy_ray.geo.polygon).  The reference's analogous patterns: candidate
prune + refine mirrors its fuzzy-match argmax (SURVEY.md §2.4 J5,
/root/reference/src/jimmy/common.py:373-400); group-sort-emit mirrors its
in-group ordering semantics (/root/reference/src/jimmy/formats/evernote.py:187-191).

Two join strategies:

- :class:`SpatialJoinStage` — broadcast join (polygon side small): the
  actor builds a res-R cell → candidate-polygon index once in
  ``__init__`` and streams page batches through it.  No shuffle; this is
  the 100 TB default when the polygon set fits in memory.
- :func:`spatial_join_shuffle` — partitioned join (polygon side large):
  both sides keyed by res-R cell, hot cells salted from a sampled
  histogram, one ``groupby(key).map_groups`` exchange.  Demonstrates the
  explicit skew handling the north rule requires; results are asserted
  identical to the broadcast path in tests.
"""

from __future__ import annotations

import functools as _functools

import numpy as np
import pandas as pd
import pyarrow as pa

from jimmy_ray.geo import core, polygon as poly_mod

JOIN_RES = 7
N_JOIN_BUCKETS = 256
KNN_EXTRA = 16  # per-batch top-(k+extra) guards exact-tie boundary drops


# --- cell / tile assignment (vectorized, stateless) ------------------------

def tile_assign_batch(batch: pa.Table) -> pa.Table:
    """(url, lat_e6, lon_e6) -> + geocell r7/r8/r9 + tiles z7/z10/z12."""
    lat = batch["lat_e6"].to_numpy(zero_copy_only=False)
    lon = batch["lon_e6"].to_numpy(zero_copy_only=False)
    cols = {name: batch[name] for name in batch.column_names}
    for res in core.GEOCELL_RESOLUTIONS:
        cols[f"cell_r{res}"] = pa.array(core.geocell_id(lat, lon, res), pa.int64())
    for zoom in core.TILE_ZOOMS:
        cols[f"tile_z{zoom}"] = pa.array(core.tile_id(lat, lon, zoom), pa.int64())
    return pa.table(cols)


# --- broadcast point-in-polygon join ---------------------------------------

class SpatialJoinStage:
    """Actor-pool stage: cell-indexed polygon candidates + exact refine.

    ``__init__`` runs once per actor (SURVEY.md §2.3 ST6): builds the
    cell→candidates inverted index and packs polygon vertex arrays.
    Pass ``polygons_ref`` (a ``ray.put`` handle of a list of polygon
    dicts) to broadcast a custom polygon set once per actor instead of
    re-shipping it per batch; defaults to the deterministic fixture set.
    """

    def __init__(self, polygons_ref=None, res: int = JOIN_RES):
        if polygons_ref is not None:
            import ray

            polys = ray.get(polygons_ref)
        else:
            polys = poly_mod.fixture_polygons()
        self.res = res
        self.polys = polys
        self.bboxes = [poly_mod.polygon_bbox(p["verts"]) for p in polys]
        self.cell_candidates: dict[int, list[int]] = {}
        for i, p in enumerate(polys):
            for cell in poly_mod.polygon_cell_cover(p["verts"], res):
                self.cell_candidates.setdefault(int(cell), []).append(i)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch["lat_e6"].to_numpy(zero_copy_only=False)
        lon = batch["lon_e6"].to_numpy(zero_copy_only=False)
        urls = batch["url"]
        out_idx: list[np.ndarray] = []
        out_pid: list[str] = []
        if len(self.polys) <= 64:
            # few polygons: loop polygons, fully vectorized over points
            # (bbox mask then exact refine) — O(P) python iterations/batch
            for pi, poly in enumerate(self.polys):
                min_x, min_y, max_x, max_y = self.bboxes[pi]
                bbox_ok = (
                    (lat >= min_y) & (lat <= max_y)
                    & (lon >= min_x) & (lon <= max_x)
                )
                if not bbox_ok.any():
                    continue
                cand_rows = np.nonzero(bbox_ok)[0]
                inside = poly_mod.point_in_polygon(
                    lon[cand_rows], lat[cand_rows], poly["verts"]
                )
                hit = cand_rows[inside]
                if hit.size:
                    out_idx.append(hit)
                    out_pid.extend([poly["polygon_id"]] * hit.size)
        else:
            # many polygons: cell-indexed candidate pruning
            cells = core.geocell_id(lat, lon, self.res)
            uniq, inverse = np.unique(cells, return_inverse=True)
            for u_i, cell in enumerate(uniq):
                cand = self.cell_candidates.get(int(cell))
                if not cand:
                    continue
                rows = np.nonzero(inverse == u_i)[0]
                for pi in cand:
                    min_x, min_y, max_x, max_y = self.bboxes[pi]
                    sub_lat = lat[rows]
                    sub_lon = lon[rows]
                    bbox_ok = (
                        (sub_lat >= min_y) & (sub_lat <= max_y)
                        & (sub_lon >= min_x) & (sub_lon <= max_x)
                    )
                    if not bbox_ok.any():
                        continue
                    cand_rows = rows[bbox_ok]
                    inside = poly_mod.point_in_polygon(
                        lon[cand_rows], lat[cand_rows], self.polys[pi]["verts"]
                    )
                    hit = cand_rows[inside]
                    if hit.size:
                        out_idx.append(hit)
                        out_pid.extend([self.polys[pi]["polygon_id"]] * hit.size)
        if out_idx:
            idx = np.concatenate(out_idx)
            return pa.table(
                {
                    "url": urls.take(pa.array(idx)),
                    "polygon_id": pa.array(out_pid, pa.string()),
                }
            )
        return pa.table({"url": pa.array([], pa.string()),
                         "polygon_id": pa.array([], pa.string())})


# --- shuffle point-in-polygon join (salted groupby-on-cell) ----------------

def detect_hot_cells(points_ds, res: int = JOIN_RES, sample_frac: float = 0.05,
                     hot_threshold: int = 2000, seed: int = 42) -> dict[int, int]:
    """Sampled cell histogram → {hot_cell: n_salts}.  The skew guard the
    north rule requires: urban clusters concentrate pages into few cells."""
    sample = points_ds.random_sample(sample_frac, seed=seed)

    def cell_counts(batch: pa.Table) -> pa.Table:
        cells = core.geocell_id(
            batch["lat_e6"].to_numpy(zero_copy_only=False),
            batch["lon_e6"].to_numpy(zero_copy_only=False),
            res,
        )
        uniq, counts = np.unique(cells, return_counts=True)
        return pa.table({"cell": pa.array(uniq), "n": pa.array(counts)})

    partials = sample.map_batches(cell_counts, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    # sample count threshold equivalent to est > hot_threshold
    min_sample_n = hot_threshold * sample_frac

    def keep_hot(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater(batch["n"], min_sample_n))

    # coalesce the per-batch histograms (hundreds of tiny blocks) so the
    # groupby is a handful of tasks, not two per input block; the hot
    # filter runs distributed BEFORE the collect, so driver state is
    # O(hot cells), never O(occupied cells)
    agg = (
        partials.repartition(8)
        .groupby("cell")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(keep_hot, batch_format="pyarrow")
        .to_pandas()
    )
    if agg.empty:  # no hot cells: to_pandas of an empty ds drops columns
        return {}
    scale = 1.0 / sample_frac
    hot = {}
    for cell, n in zip(agg["cell"], agg["n"]):
        est = n * scale
        if est > hot_threshold:
            hot[int(cell)] = max(2, min(32, int(est // hot_threshold) + 1))
    return hot


def spatial_join_shuffle(points_ds, res: int = JOIN_RES,
                         hot_cells: dict[int, int] | None = None):
    """Partitioned PIP join: groupby-on-cell with explicit hot-cell salting.

    Points get ``key = "cell.salt"`` (salt = url-hash % n_salts for hot
    cells); the polygon cover side is replicated across each hot cell's
    salts, so every group sees every matching polygon.  One all-to-all
    exchange; within-group refine is the exact integer kernel.
    """
    if hot_cells is None:
        hot_cells = detect_hot_cells(points_ds, res)

    polys = poly_mod.fixture_polygons()
    cover_rows: list[tuple[int, int, str]] = []  # (cell, salt, polygon_id)
    for p in polys:
        for cell in poly_mod.polygon_cell_cover(p["verts"], res):
            n_salt = hot_cells.get(int(cell), 1)
            for s in range(n_salt):
                cover_rows.append((int(cell), s, p["polygon_id"]))
    # the cover side is tiny (cells × salts × polygons): broadcast it by
    # closure capture instead of widening the exchange with union rows —
    # measured ~30% faster than shipping a "G"-side through the shuffle
    cover = pd.DataFrame(cover_rows, columns=["cell", "salt", "polygon_id"])
    verts_by_id = {p["polygon_id"]: p["verts"] for p in polys}

    hot_items = sorted(hot_cells.items())
    hot_cell_arr = np.array([c for c, _ in hot_items], dtype=np.int64)
    hot_salt_arr = np.array([n for _, n in hot_items], dtype=np.int64)

    def key_points(batch: pa.Table) -> pa.Table:
        lat = batch["lat_e6"].to_numpy(zero_copy_only=False)
        lon = batch["lon_e6"].to_numpy(zero_copy_only=False)
        cells = core.geocell_id(lat, lon, res)
        salts = np.zeros(len(cells), dtype=np.int64)
        if hot_cell_arr.size:
            pos = np.searchsorted(hot_cell_arr, cells)
            pos_c = np.clip(pos, 0, hot_cell_arr.size - 1)
            is_hot = hot_cell_arr[pos_c] == cells
            if is_hot.any():
                # deterministic url hash (stable across processes)
                uhash = _stable_hash_vec(batch["url"])
                salts[is_hot] = (uhash[is_hot] % hot_salt_arr[pos_c[is_hot]].astype(np.uint64)).astype(np.int64)
        # coarse-bucket exchange key: hash(cell, salt) % N_JOIN_BUCKETS —
        # one sort over a small int key, N_JOIN_BUCKETS map_groups calls
        # instead of one per distinct cell (measured 13.8 s -> bucketed)
        bk = ((cells * np.int64(31) + salts) % N_JOIN_BUCKETS).astype(np.int64)
        return pa.table(
            {
                "cell": pa.array(cells, pa.int64()),
                "salt": pa.array(salts, pa.int64()),
                "url": batch["url"],
                "lat_e6": batch["lat_e6"],
                "lon_e6": batch["lon_e6"],
                "__bk": pa.array(bk, pa.int64()),
            }
        )

    keyed = points_ds.map_batches(key_points, batch_format="pyarrow")

    def join_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        """One vectorized candidate merge on (cell, salt), then a single
        exact PIP refine per polygon (≤ |polys| numpy kernels per bucket,
        never per (cell, salt) group)."""
        empty = pd.DataFrame({"url": pd.Series([], dtype=str),
                              "polygon_id": pd.Series([], dtype=str)})
        if bucket.empty:
            return empty
        m = bucket.merge(cover, on=["cell", "salt"])
        if m.empty:
            return empty
        out_frames: list[pd.DataFrame] = []
        for pid, sub in m.groupby("polygon_id", sort=True):
            inside = poly_mod.point_in_polygon(
                sub["lon_e6"].to_numpy(dtype=np.int64),
                sub["lat_e6"].to_numpy(dtype=np.int64),
                verts_by_id[pid],
            )
            if inside.any():
                out_frames.append(pd.DataFrame(
                    {"url": sub["url"].to_numpy()[inside],
                     "polygon_id": pid}))
        if not out_frames:
            return empty
        return pd.concat(out_frames, ignore_index=True)

    # Coalesce before the exchange: the keyed side arrives as hundreds of
    # ~200 KB blocks and the sort-based groupby launches two tasks per
    # block, so per-task latency dominates the tiny blocks (measured: the
    # sort was 10 s of wall for ~2.6 s of work).  One cheap repartition
    # makes the shuffle a handful of right-sized tasks.
    n_blocks = max(8, min(64, N_JOIN_BUCKETS // 8))
    return (
        keyed.repartition(n_blocks)
        .groupby("__bk")
        .map_groups(join_bucket, batch_format="pandas")
    )


def _stable_hash(s: str) -> int:
    """Deterministic 64-bit FNV-1a (process-independent, unlike hash())."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _stable_hash_vec(col) -> np.ndarray:
    """Vectorized FNV-1a over a string column: position-wise numpy sweep of
    the raw Arrow byte buffer (loop bound = longest string, not row count)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = np.frombuffer(col.buffers()[1], dtype=np.int32)[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    starts, lens = offsets[:-1], offsets[1:] - offsets[:-1]
    h = np.full(len(col), 0xCBF29CE484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for j in range(int(lens.max(initial=0))):
            active = lens > j
            b = data[starts[active] + j].astype(np.uint64)
            h[active] = (h[active] ^ b) * prime
    return h


@_functools.lru_cache(maxsize=4)
def _default_join_stage(res: int = JOIN_RES) -> "SpatialJoinStage":
    """Once-per-worker-process join index (lru_cache ≙ actor state, but
    elastic: stateless tasks reuse warm worker processes with zero actor
    pool spin-up — the right trade for small fixed state; actor pools
    remain the path for big state like a custom polygon set)."""
    return SpatialJoinStage(res=res)


def spatial_join_batch(batch: pa.Table) -> pa.Table:
    """Task-path broadcast PIP join (cached per-process index)."""
    return _default_join_stage()(batch)


def polygon_count_partial_batch(batch: pa.Table) -> pa.Table:
    """Partial per-polygon counts over spatial_join output (A1 combiner):
    the exchange ships one row per polygon per batch instead of one row
    per matched page — at 16.2M pages the un-combined groupby moved every
    (url, polygon_id) row through the coalesce and capped spatial_join
    scaling at 1.6x for 4x cores."""
    joined = spatial_join_batch(batch)
    ids = joined["polygon_id"].to_numpy(zero_copy_only=False)
    uniq, counts = np.unique(ids, return_counts=True)
    # explicit string type: an all-miss batch yields an empty object
    # array, which untyped pa.array() infers as null and breaks schema
    # unification downstream
    return pa.table({"polygon_id": pa.array(uniq, pa.string()),
                     "p_n": pa.array(counts, pa.int64())})


def tile_count_partial_batch(batch: pa.Table) -> pa.Table:
    """Vectorized partial tile counts (A1 combiner): emit one row per tile
    per batch so the global groupby shuffles tiles, not pages."""
    lat = batch["lat_e6"].to_numpy(zero_copy_only=False)
    lon = batch["lon_e6"].to_numpy(zero_copy_only=False)
    tiles = core.tile_id(lat, lon, 10)
    uniq, counts = np.unique(tiles, return_counts=True)
    return pa.table({"tile_z10": pa.array(uniq, pa.int64()),
                     "p_n": pa.array(counts, pa.int64())})


@_functools.lru_cache(maxsize=4)
def _default_knn_stage(n_queries: int) -> "KNNCandidateStage":
    from jimmy_ray.data import synth

    return KNNCandidateStage(synth.query_points(n_queries))


def knn_candidates_batch(batch: pa.Table, n_queries: int = 50) -> pa.Table:
    """Task-path kNN candidates (cached per-process query matrix)."""
    return _default_knn_stage(n_queries)(batch)


def spatial_join_native(points_ds, res: int = JOIN_RES, num_partitions: int = 16):
    """PIP join via Ray's native hash join (Dataset.join, hash-partitioned
    on the cell key): points keyed by res-R cell ⋈ exploded polygon cell
    cover → candidates → exact integer ray-cast refine.  The third join
    strategy next to the broadcast and hand-salted-shuffle variants;
    results are identical (asserted by the shared oracle)."""
    import ray.data as rd

    polys = poly_mod.fixture_polygons()
    verts_by_id = {p["polygon_id"]: p["verts"] for p in polys}
    cover_rows = [
        (int(cell), p["polygon_id"])
        for p in polys
        for cell in poly_mod.polygon_cell_cover(p["verts"], res)
    ]
    cover_ds = rd.from_arrow(
        pa.table(
            {
                "cell": pa.array([c for c, _ in cover_rows], pa.int64()),
                "polygon_id": pa.array([p for _, p in cover_rows], pa.string()),
            }
        )
    )

    def key_points(batch: pa.Table) -> pa.Table:
        cells = core.geocell_id(
            batch["lat_e6"].to_numpy(zero_copy_only=False),
            batch["lon_e6"].to_numpy(zero_copy_only=False),
            res,
        )
        return batch.append_column("cell", pa.array(cells, pa.int64()))

    keyed = points_ds.map_batches(key_points, batch_format="pyarrow")
    candidates = keyed.join(
        cover_ds, join_type="inner", num_partitions=num_partitions, on=("cell",)
    )

    def refine(batch: pa.Table) -> pa.Table:
        lat = batch["lat_e6"].to_numpy(zero_copy_only=False)
        lon = batch["lon_e6"].to_numpy(zero_copy_only=False)
        pids = batch["polygon_id"].to_pylist()
        keep = np.zeros(len(lat), dtype=bool)
        pid_arr = np.asarray(pids, dtype=object)
        for pid in set(pids):
            rows = np.nonzero(pid_arr == pid)[0]
            inside = poly_mod.point_in_polygon(lon[rows], lat[rows],
                                               verts_by_id[pid])
            keep[rows[inside]] = True
        return batch.filter(pa.array(keep)).select(["url", "polygon_id"])

    return candidates.map_batches(refine, batch_format="pyarrow", batch_size=8192)


# --- hex / S2 cell index stages (genuine cell math; rows-only checks) ------

def hex_s2_index_batch(batch: pa.Table) -> pa.Table:
    """(url, lat_e6, lon_e6) -> + hex r7/r8/r9 + s2 level 10/14 + s2 token.

    Uses the genuine hexagonal index (jimmy_ray.geo.hexcell) and genuine
    S2 cell ids (jimmy_ray.geo.s2).  Float projections are not bit-exactly
    SQL-mirrorable, so these columns are covered by scalar-reference unit
    tests + the driver's rows-only check; the SQL-oracle path uses the
    integer geocell grid (tile_assign_batch)."""
    from jimmy_ray.geo import hexcell, s2

    lat = batch["lat_e6"].to_numpy(zero_copy_only=False)
    lon = batch["lon_e6"].to_numpy(zero_copy_only=False)
    cols = {name: batch[name] for name in batch.column_names}
    for res in hexcell.HEX_RESOLUTIONS:
        cols[f"hex_r{res}"] = pa.array(hexcell.hexcell_id_e6(lat, lon, res), pa.int64())
    leaf = s2.latlng_e6_to_cell_id(lat, lon)
    for level in (10, 14):
        ids = s2.parent(leaf, level)
        cols[f"s2_l{level}"] = pa.array(ids.view(np.int64), pa.int64())
    cols["s2_token_l10"] = pa.array(
        [s2.token(int(c)) for c in s2.parent(leaf, 10)], pa.string()
    )
    return pa.table(cols)


def knn_hex_pruned(points_ds, qpoints: list[dict], ring_k: int = 2,
                   concurrency=(1, 4)):
    """kNN with hex k-ring candidate pruning (the J9 k-ring expansion
    path): only pages whose res-7 hex cell falls inside the union of the
    query points' k-rings are scanned.  Partitioning assumption: ring_k
    rings at res 7 (~5.5 km hexes) cover the true k nearest neighbors —
    holds for dense (urban-cluster) data; sparse regions need a larger
    ring or the exact path (KNNCandidateStage scans everything)."""
    from jimmy_ray.geo import hexcell

    probe: set[int] = set()
    for q in qpoints:
        cell = int(hexcell.hexcell_id_e6(
            np.int64(q["lat_e6"]), np.int64(q["lon_e6"]), 7))
        probe.update(int(c) for c in hexcell.k_ring(cell, ring_k))
    probe_arr = np.fromiter(probe, dtype=np.int64, count=len(probe))

    def ring_filter(batch: pa.Table) -> pa.Table:
        cells = hexcell.hexcell_id_e6(
            batch["lat_e6"].to_numpy(zero_copy_only=False),
            batch["lon_e6"].to_numpy(zero_copy_only=False), 7)
        keep = np.isin(cells.astype(np.int64), probe_arr)
        return batch.filter(pa.array(keep))

    filtered = points_ds.map_batches(ring_filter, batch_format="pyarrow",
                                     batch_size=8192)
    cands = filtered.map_batches(
        KNNCandidateStage,
        fn_constructor_kwargs={"qpoints": qpoints},
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=concurrency,
    )
    return knn_finalize(cands, {q["qid"]: q["k"] for q in qpoints})


# --- raster tiles (A4: raster <-> vector materialization) ------------------

RASTER_N = 16  # subcells per tile axis -> 16x16 grid


def raster_subcell(lat_e6, lon_e6, zoom: int = 10, n: int = RASTER_N):
    """Exact integer subcell index within a tile: 0..n*n-1.

    sub_x/sub_y are the fractional position inside the tile quantized to
    n steps, computed purely in int64 (same floor-division trick as the
    tile itself), so numpy and DuckDB agree bit-for-bit."""
    z = np.int64(1) << zoom
    gx = (np.asarray(lon_e6, dtype=np.int64) - core.LON_MIN_E6) * (z * n) // core.LON_SPAN_E6
    gy = (np.int64(90_000_000) - np.asarray(lat_e6, dtype=np.int64)) * (z * n) // core.LAT_SPAN_E6
    gx = np.clip(gx, 0, z * n - 1)
    gy = np.clip(gy, 0, z * n - 1)
    return (gy % n) * n + (gx % n)


def sql_raster_subcell(lat_col: str, lon_col: str, zoom: int = 10,
                       n: int = RASTER_N) -> str:
    zn = (1 << zoom) * n
    gx = (f"least(greatest((({lon_col}) - ({core.LON_MIN_E6})) * {zn} "
          f"// {core.LON_SPAN_E6}, 0), {zn - 1})")
    gy = (f"least(greatest((90000000 - ({lat_col})) * {zn} "
          f"// {core.LAT_SPAN_E6}, 0), {zn - 1})")
    return f"((({gy}) % {n}) * {n} + (({gx}) % {n}))"


def rasterize_tiles(points_ds, zoom: int = 10):
    """Vector -> raster: per-tile 16x16 count grid (one row per tile,
    grid as a flat list<int64>[256]).  Partial per-batch histograms sum
    exactly, so this is a combiner-shaped groupby."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch["lat_e6"].to_numpy(zero_copy_only=False)
        lon = batch["lon_e6"].to_numpy(zero_copy_only=False)
        tiles = core.tile_id(lat, lon, zoom)
        sub = raster_subcell(lat, lon, zoom)
        key = tiles * (RASTER_N * RASTER_N) + sub
        uniq, counts = np.unique(key, return_counts=True)
        return pa.table({
            "tile_sub": pa.array(uniq, pa.int64()),
            "p_n": pa.array(counts, pa.int64()),
        })

    exploded = (
        points_ds.map_batches(partial, batch_format="pyarrow", batch_size=32768)
        .repartition(8)  # tiny per-batch histograms -> few shuffle tasks
        .groupby("tile_sub")
        .aggregate(Sum("p_n", alias_name="n_points"))
    )

    def to_grid(group: pd.DataFrame) -> pd.DataFrame:
        import numpy as _np

        tile = int(group["tile_id"].iloc[0])
        grid = _np.zeros(RASTER_N * RASTER_N, dtype=np.int64)
        subs = (group["tile_sub"] % (RASTER_N * RASTER_N)).to_numpy()
        grid[subs] = group["n_points"].to_numpy()
        return pd.DataFrame({"tile_id": [tile], "grid": [grid.tolist()],
                             "n_points": [int(grid.sum())]})

    def add_tile(batch: pa.Table) -> pa.Table:
        keys = batch["tile_sub"].to_numpy()
        return batch.append_column(
            "tile_id", pa.array(keys // (RASTER_N * RASTER_N), pa.int64())
        )

    return (
        exploded.map_batches(add_tile, batch_format="pyarrow")
        .groupby("tile_id")
        .map_groups(to_grid, batch_format="pandas")
    )


def raster_to_vector(raster_ds):
    """Raster -> vector: explode grids back to (tile_id, subcell,
    n_points) rows — the inverse materialization."""

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        tiles, subs, counts = [], [], []
        for tile, grid in zip(batch["tile_id"], batch["grid"]):
            g = np.asarray(grid)
            nz = np.nonzero(g)[0]
            tiles.extend([tile] * nz.size)
            subs.extend(nz.tolist())
            counts.extend(g[nz].tolist())
        return pd.DataFrame({"tile_z10": tiles, "subcell": subs,
                             "n_points": counts})

    return raster_ds.map_batches(explode, batch_format="pandas")


def raster_tiles_exploded(points_ds, zoom: int = 10):
    """(tile_z10, subcell, n_points) — the oracle-checkable raster form."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch["lat_e6"].to_numpy(zero_copy_only=False)
        lon = batch["lon_e6"].to_numpy(zero_copy_only=False)
        tiles = core.tile_id(lat, lon, zoom)
        sub = raster_subcell(lat, lon, zoom)
        key = tiles * (RASTER_N * RASTER_N) + sub
        uniq, counts = np.unique(key, return_counts=True)
        return pa.table({"tile_sub": pa.array(uniq, pa.int64()),
                         "p_n": pa.array(counts, pa.int64())})

    agg = (
        points_ds.map_batches(partial, batch_format="pyarrow", batch_size=32768)
        .repartition(8)
        .groupby("tile_sub")
        .aggregate(Sum("p_n", alias_name="n_points"))
    )

    def split_key(batch: pa.Table) -> pa.Table:
        keys = batch["tile_sub"].to_numpy()
        return pa.table({
            "tile_z10": pa.array(keys // (RASTER_N * RASTER_N), pa.int64()),
            "subcell": pa.array(keys % (RASTER_N * RASTER_N), pa.int64()),
            "n_points": batch["n_points"],
        })

    return agg.map_batches(split_key, batch_format="pyarrow")


# --- kNN -------------------------------------------------------------------

class KNNCandidateStage:
    """Per-batch bounded top-k per query point (SURVEY.md §2.4 J9).

    Exact distributed top-k: each batch emits its local best (k + extra)
    rows per query; a final tiny groupby(qid) merge sorts by
    (dist_m, url) and cuts to k.  Query points are broadcast state held
    per actor; distance math is vectorized haversine (B×Q per batch).
    """

    def __init__(self, qpoints: list[dict]):
        self.qids = [q["qid"] for q in qpoints]
        self.qlat = np.array([q["lat_e6"] for q in qpoints], dtype=np.int64)
        self.qlon = np.array([q["lon_e6"] for q in qpoints], dtype=np.int64)
        self.k = np.array([q["k"] for q in qpoints], dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch["lat_e6"].to_numpy(zero_copy_only=False)
        lon = batch["lon_e6"].to_numpy(zero_copy_only=False)
        urls = batch["url"]
        n = len(lat)
        out_q: list[str] = []
        out_rows: list[np.ndarray] = []
        out_dist: list[np.ndarray] = []
        for j, qid in enumerate(self.qids):
            dist = core.haversine_m(lat, lon, self.qlat[j], self.qlon[j])
            kk = min(int(self.k[j]) + KNN_EXTRA, n)
            idx = np.argpartition(dist, kk - 1)[:kk] if kk < n else np.arange(n)
            out_q.extend([qid] * idx.size)
            out_rows.append(idx)
            out_dist.append(dist[idx])
        if not out_rows:
            return pa.table({"qid": pa.array([], pa.string()),
                             "url": pa.array([], pa.string()),
                             "dist_m": pa.array([], pa.float64())})
        idx_all = np.concatenate(out_rows)
        return pa.table(
            {
                "qid": pa.array(out_q, pa.string()),
                "url": urls.take(pa.array(idx_all)),
                "dist_m": pa.array(np.concatenate(out_dist), pa.float64()),
            }
        )


def knn_finalize(candidates_ds, k_by_qid: dict[str, int]):
    """groupby(qid) merge: sort (dist_m, url), cut to k, emit rank."""

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:  # typed empty block (no schema-drift warnings)
            return pd.DataFrame({"qid": pd.Series([], dtype=str),
                                 "url": pd.Series([], dtype=str),
                                 "rank": pd.Series([], dtype=np.int64),
                                 "dist_m": pd.Series([], dtype=np.float64)})
        qid = group["qid"].iloc[0]
        k = k_by_qid[qid]
        g = group.sort_values(["dist_m", "url"], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["dist_m"] = g["dist_m"].round(3)
        return g[["qid", "url", "rank", "dist_m"]]

    # candidates are (k+extra)·Q rows per input block — hundreds of tiny
    # blocks; coalesce so the merge groupby is a few tasks, not 2/block
    return (
        candidates_ds.repartition(8)
        .groupby("qid")
        .map_groups(topk, batch_format="pandas")
    )
