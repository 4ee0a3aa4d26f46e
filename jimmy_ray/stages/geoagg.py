"""Geo aggregate tier: per-polygon stats, density grid clustering.

Two scale-shaped additions to the geospatial layer (north rule), both
bit-exact int64 microdegree math with DuckDB mirrors:

- ``polygon_stats``: per-polygon count / coordinate sums / bbox of the
  point-in-polygon join — the classic "zonal statistics" aggregate.
  Shape: partial aggregation inside the join stage (one row per
  (polygon, batch), never per point) → tiny groupby.
- ``grid_cluster``: DBSCAN-style density clustering — occupied geocells
  with ≥ min_pts points are core cells, 8-neighborhood adjacency between
  core cells forms the cluster graph, distributed min-label propagation
  (shared with dedup_clusters) labels the components.  All stages are
  map/partial-agg/hash-join; the only iteration state is one int64
  checksum per round on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from jimmy_ray.geo import core as geo_core
from jimmy_ray.geo import polygon as poly_mod

CLUSTER_RES = 8
MIN_PTS = 3


def _points(sf_dir: str):
    from jimmy_ray.pipelines import flagship

    return flagship.geo_points(sf_dir)


# --- per-polygon stats (zonal statistics) -----------------------------------

def polygon_stats_partial(batch: pa.Table) -> pa.Table:
    """One partial-stats row per (polygon, batch): bbox gate + exact
    point-in-polygon refine, then vectorized sums."""
    lat = batch["lat_e6"].to_numpy(zero_copy_only=False)
    lon = batch["lon_e6"].to_numpy(zero_copy_only=False)
    pids, ns = [], []
    s_lat, s_lon = [], []
    mn_lat, mx_lat, mn_lon, mx_lon = [], [], [], []
    for poly in poly_mod.fixture_polygons():
        min_x, min_y, max_x, max_y = poly_mod.polygon_bbox(poly["verts"])
        bbox_ok = ((lat >= min_y) & (lat <= max_y)
                   & (lon >= min_x) & (lon <= max_x))
        if not bbox_ok.any():
            continue
        rows = np.nonzero(bbox_ok)[0]
        inside = poly_mod.point_in_polygon(lon[rows], lat[rows], poly["verts"])
        hit = rows[inside]
        if not hit.size:
            continue
        pids.append(poly["polygon_id"])
        ns.append(hit.size)
        s_lat.append(int(lat[hit].sum()))
        s_lon.append(int(lon[hit].sum()))
        mn_lat.append(int(lat[hit].min()))
        mx_lat.append(int(lat[hit].max()))
        mn_lon.append(int(lon[hit].min()))
        mx_lon.append(int(lon[hit].max()))
    return pa.table({
        "polygon_id": pa.array(pids, pa.string()),
        "p_n": pa.array(ns, pa.int64()),
        "p_sum_lat": pa.array(s_lat, pa.int64()),
        "p_sum_lon": pa.array(s_lon, pa.int64()),
        "p_min_lat": pa.array(mn_lat, pa.int64()),
        "p_max_lat": pa.array(mx_lat, pa.int64()),
        "p_min_lon": pa.array(mn_lon, pa.int64()),
        "p_max_lon": pa.array(mx_lon, pa.int64()),
    })


def polygon_stats_from_points(points, batch_size: int = 8192):
    """The shipped zonal-stats plan over any points dataset — shared by
    the oracle query and the bench (the bench must time THIS plan, not a
    rebuilt variant; ADVICE r3)."""
    from ray.data.aggregate import Max, Min, Sum

    return (
        points
        .map_batches(polygon_stats_partial, batch_format="pyarrow",
                     batch_size=batch_size)
        .repartition(8)  # coalesce tiny per-batch partials (CLAUDE.md)
        .groupby("polygon_id")
        .aggregate(
            Sum("p_n", alias_name="n_pages"),
            Sum("p_sum_lat", alias_name="sum_lat_e6"),
            Sum("p_sum_lon", alias_name="sum_lon_e6"),
            Min("p_min_lat", alias_name="min_lat_e6"),
            Max("p_max_lat", alias_name="max_lat_e6"),
            Min("p_min_lon", alias_name="min_lon_e6"),
            Max("p_max_lon", alias_name="max_lon_e6"),
        )
    )


def polygon_stats(sf_dir: str):
    return polygon_stats_from_points(_points(sf_dir))


def sql_polygon_stats(points_cte: str) -> str:
    edges = poly_mod.sql_polygon_edges()
    crossing = poly_mod.sql_pip_crossing("pts.lon_e6", "pts.lat_e6")
    return f"""
{points_cte},
edges(polygon_id, x1, y1, x2, y2) AS (VALUES
    {edges}),
hits AS (
  SELECT pts.url, pts.lat_e6, pts.lon_e6, edges.polygon_id
  FROM pts, edges
  GROUP BY pts.url, pts.lat_e6, pts.lon_e6, edges.polygon_id
  HAVING SUM({crossing}) % 2 = 1
)
SELECT polygon_id,
  CAST(COUNT(*) AS BIGINT) AS n_pages,
  CAST(SUM(lat_e6) AS BIGINT) AS sum_lat_e6,
  CAST(SUM(lon_e6) AS BIGINT) AS sum_lon_e6,
  CAST(MIN(lat_e6) AS BIGINT) AS min_lat_e6,
  CAST(MAX(lat_e6) AS BIGINT) AS max_lat_e6,
  CAST(MIN(lon_e6) AS BIGINT) AS min_lon_e6,
  CAST(MAX(lon_e6) AS BIGINT) AS max_lon_e6
FROM hits GROUP BY polygon_id
"""


# --- density grid clustering (DBSCAN-ish) -----------------------------------

def _cell_count_partial(batch: pa.Table) -> pa.Table:
    cells = geo_core.geocell_id(
        batch["lat_e6"].to_numpy(zero_copy_only=False),
        batch["lon_e6"].to_numpy(zero_copy_only=False), CLUSTER_RES)
    uniq, counts = np.unique(cells, return_counts=True)
    return pa.table({"cell": pa.array(uniq, pa.int64()),
                     "p_n": pa.array(counts, pa.int64())})


def _neighbor_edges_batch(batch: pa.Table) -> pa.Table:
    """(a=cell, b=candidate neighbor incl. self) rows — lon wraps, lat
    clips; the join against the occupied set keeps real neighbors only."""
    cell = batch["cell"].to_numpy(zero_copy_only=False)
    res, cx, cy = geo_core.geocell_components(cell)
    nx = np.int64(1) << (CLUSTER_RES + 6)
    ny = np.int64(1) << (CLUSTER_RES + 5)
    a_out, b_out = [], []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            ncx = (cx + dx) % nx
            ncy = cy + dy
            valid = (ncy >= 0) & (ncy < ny)
            nid = (np.int64(CLUSTER_RES) << 40) | (ncx << 20) | ncy
            a_out.append(cell[valid])
            b_out.append(nid[valid])
    return pa.table({
        "a": pa.array(np.concatenate(a_out), pa.int64()),
        "b": pa.array(np.concatenate(b_out), pa.int64()),
    })


def grid_cluster_from_points(points_ds, min_pts: int = MIN_PTS,
                             num_partitions: int = 8,
                             batch_size: int = 16384):
    """Core of the density clustering over any (lat_e6, lon_e6) dataset:
    core cells (count ≥ min_pts) labeled by connected component over the
    8-neighborhood graph → (cell_id, cluster_rep).  Shared by the
    oracle-checked query and the benchmark."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from jimmy_ray.functions.dedup import min_label_components

    occupied = (
        points_ds
        .map_batches(_cell_count_partial, batch_format="pyarrow",
                     batch_size=batch_size)
        .repartition(num_partitions)
        .groupby("cell")
        .aggregate(Sum("p_n", alias_name="n"))
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["n"], min_pts))
            .select(["cell"]),
            batch_format="pyarrow",
        )
        .materialize()
    )

    candidate_edges = occupied.map_batches(
        _neighbor_edges_batch, batch_format="pyarrow", batch_size=batch_size
    )
    # keep only edges whose far end is itself an occupied core cell
    # (self-edges survive, so singleton cells still get a label)
    edges = candidate_edges.join(
        occupied.map_batches(
            lambda t: pa.table({"b_cell": t["cell"]}),
            batch_format="pyarrow",
        ),
        join_type="inner", num_partitions=num_partitions,
        on=("b",), right_on=("b_cell",),
    ).select_columns(["a", "b"])

    labels = min_label_components(edges, num_partitions=num_partitions)
    return labels.map_batches(
        lambda t: pa.table({"cell_id": t["node"],
                            "cluster_rep": t["cluster_rep"]}),
        batch_format="pyarrow",
    )


def grid_cluster(sf_dir: str, min_pts: int = MIN_PTS,
                 num_partitions: int = 8):
    return grid_cluster_from_points(_points(sf_dir), min_pts,
                                    num_partitions)


def sql_grid_cluster(points_cte: str, min_pts: int = MIN_PTS) -> str:
    nx = 1 << (CLUSTER_RES + 6)
    cell_sql = geo_core.sql_geocell_id("pts.lat_e6", "pts.lon_e6",
                                       CLUSTER_RES)
    # the reach CTE is recursive; DuckDB wants RECURSIVE on the WITH head.
    # Guard the rewrite: it must see exactly one plain "WITH " prefix, or
    # the string surgery would silently corrupt the query (ADVICE r3).
    if not points_cte.startswith("WITH "):
        raise ValueError("points_cte must start with 'WITH '")
    if points_cte.startswith("WITH RECURSIVE"):
        raise ValueError("points_cte is already RECURSIVE")
    points_cte = "WITH RECURSIVE " + points_cte[len("WITH "):]
    return f"""
{points_cte},
cells AS (
  SELECT {cell_sql} AS cell FROM pts
  GROUP BY 1 HAVING COUNT(*) >= {min_pts}
),
comp AS (
  SELECT cell, (cell >> 20) & 1048575 AS cx, cell & 1048575 AS cy
  FROM cells
),
raw(a, b) AS (
  SELECT a.cell, b.cell FROM comp a JOIN comp b
  ON ((a.cx - b.cx + {nx}) % {nx}) IN (0, 1, {nx - 1})
  AND abs(a.cy - b.cy) <= 1
),
edges(src, dst) AS (SELECT a, b FROM raw UNION SELECT b, a FROM raw),
nodes(node) AS (SELECT DISTINCT src FROM edges),
reach(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS cell_id, MIN(label) AS cluster_rep
FROM reach GROUP BY node
"""


# --- per-tile language mix (geo x webtext cross) -----------------------------

def geo_points_lang(sf_dir: str):
    """Located pages keeping the lang column: (lang, lat_e6, lon_e6)."""
    from jimmy_ray.pipelines import flagship
    from jimmy_ray.stages import extract as ex

    def fn(batch: pa.Table) -> pa.Table:
        has_geo, lat_e6, lon_e6 = ex._parse_geo_heads(
            ex._decode_heads(batch))
        mask = pa.array(has_geo)
        return pa.table({
            "lang": batch["lang"].filter(mask),
            "lat_e6": pa.array(lat_e6[has_geo], pa.int64()),
            "lon_e6": pa.array(lon_e6[has_geo], pa.int64()),
        })

    return flagship.pages(sf_dir).map_batches(
        fn, batch_format="pyarrow", batch_size=512)


def tile_language_mix_from_points(points_lang, zoom: int = 10):
    """Per-tile language rollup: page count, distinct languages and the
    dominant language (ties break lexicographically) — the geo x web
    composition a multilingual corpus map needs.  Shape: per-batch
    (tile, lang) pre-counts, coalesce, one groupby(tile), local fold."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        tiles = geo_core.tile_id(
            batch["lat_e6"].to_numpy(zero_copy_only=False),
            batch["lon_e6"].to_numpy(zero_copy_only=False),
            zoom,
        )
        df = pd.DataFrame({"tile": tiles,
                           "lang": batch["lang"].to_pylist()})
        out = df.groupby(["tile", "lang"], as_index=False).size()
        out.columns = ["tile", "lang", "n"]
        return pa.Table.from_pandas(out, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["tile", "lang"], as_index=False)["n"].sum()
        c = c.sort_values(["tile", "n", "lang"],
                          ascending=[True, False, True], kind="mergesort")
        top = c.drop_duplicates("tile", keep="first")
        agg = c.groupby("tile").agg(
            n_pages=("n", "sum"), n_langs=("lang", "size")).reset_index()
        out = agg.merge(top[["tile", "lang"]], on="tile")
        out.columns = [f"tile_z{zoom}", "n_pages", "n_langs", "top_lang"]
        return out

    return (points_lang
            .map_batches(partial, batch_format="pyarrow", batch_size=32768)
            .repartition(8)
            .groupby("tile")
            .map_groups(fold, batch_format="pandas"))


def tile_language_mix(sf_dir: str, zoom: int = 10):
    return tile_language_mix_from_points(geo_points_lang(sf_dir), zoom)


def sql_tile_language_mix(points_lang_cte: str, zoom: int = 10) -> str:
    tile = geo_core.sql_tile_id("lat_e6", "lon_e6", zoom)
    return f"""
{points_lang_cte}, tl AS (
  SELECT {tile} AS tile, lang, count(*) AS n
  FROM pts GROUP BY 1, 2
), ranked AS (
  SELECT tile, lang, n,
         row_number() OVER (PARTITION BY tile
                            ORDER BY n DESC, lang) AS rn
  FROM tl
)
SELECT t.tile AS tile_z{zoom}, CAST(sum(t.n) AS BIGINT) AS n_pages,
       CAST(count(*) AS BIGINT) AS n_langs,
       any_value(r.lang) AS top_lang
FROM tl t JOIN ranked r ON r.tile = t.tile AND r.rn = 1
GROUP BY t.tile
"""


# --- per-source geographic footprint (geo x web, one exchange) ----------------

def geo_points_source(sf_dir: str):
    """Located pages with the SITE derived from the url path (the
    pages schema carries no source column — the url embeds it as
    ``https://fixture.test/<source>/...``, so the Ray path extracts it
    the way a real crawl pipeline would; the SQL mirror reads the
    documents.source column directly, an independent derivation)."""
    import pyarrow.compute as pc

    from jimmy_ray.pipelines import flagship
    from jimmy_ray.stages import extract as ex

    def fn(batch: pa.Table) -> pa.Table:
        has_geo, lat_e6, lon_e6 = ex._parse_geo_heads(
            ex._decode_heads(batch))
        mask = pa.array(has_geo)
        urls = batch["url"].filter(mask)
        sources = pc.list_element(pc.split_pattern(urls, "/"), 3)
        return pa.table({
            "source": sources,
            "lat_e6": pa.array(lat_e6[has_geo], pa.int64()),
            "lon_e6": pa.array(lon_e6[has_geo], pa.int64()),
        })

    return flagship.pages(sf_dir).map_batches(
        fn, batch_format="pyarrow", batch_size=512)


def source_geo_footprint(sf_dir: str, zoom: int = 10):
    """Per-source spatial spread: located-page count, DISTINCT tile
    count and the integer-microdegree bounding box — the "where does
    this site's content point" rollup.  Shape: per-batch (source,
    tile) partials with bbox, one small groupby(source), local fold
    (sources are low-cardinality; tiles dedupe exactly inside the
    fold because each (source, tile) pair co-locates)."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        tiles = geo_core.tile_id(
            batch["lat_e6"].to_numpy(zero_copy_only=False),
            batch["lon_e6"].to_numpy(zero_copy_only=False),
            zoom,
        )
        df = pd.DataFrame({
            "source": batch["source"].to_pylist(),
            "tile": tiles,
            "lat_e6": batch["lat_e6"].to_numpy(zero_copy_only=False),
            "lon_e6": batch["lon_e6"].to_numpy(zero_copy_only=False),
        })
        out = df.groupby(["source", "tile"]).agg(
            p_n=("lat_e6", "size"),
            p_min_lat=("lat_e6", "min"), p_max_lat=("lat_e6", "max"),
            p_min_lon=("lon_e6", "min"), p_max_lon=("lon_e6", "max"),
        ).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "source": [g["source"].iloc[0]],
            "n_points": [int(g["p_n"].sum())],
            "n_tiles": [int(g["tile"].nunique())],
            "min_lat": [int(g["p_min_lat"].min())],
            "max_lat": [int(g["p_max_lat"].max())],
            "min_lon": [int(g["p_min_lon"].min())],
            "max_lon": [int(g["p_max_lon"].max())],
        })

    return (geo_points_source(sf_dir)
            .map_batches(partial, batch_format="pyarrow", batch_size=32768)
            .repartition(8)
            .groupby("source")
            .map_groups(fold, batch_format="pandas"))


def sql_source_geo_footprint(points_source_cte: str,
                             zoom: int = 10) -> str:
    tile = geo_core.sql_tile_id("lat_e6", "lon_e6", zoom)
    return f"""
{points_source_cte}
SELECT source, CAST(count(*) AS BIGINT) AS n_points,
       CAST(count(DISTINCT {tile}) AS BIGINT) AS n_tiles,
       CAST(min(lat_e6) AS BIGINT) AS min_lat,
       CAST(max(lat_e6) AS BIGINT) AS max_lat,
       CAST(min(lon_e6) AS BIGINT) AS min_lon,
       CAST(max(lon_e6) AS BIGINT) AS max_lon
FROM pts GROUP BY source
"""
