"""Flagship pipeline: pages → extract → geocode → cell index → spatial
join → tile aggregation (BASELINE.json north_star, SURVEY.md §3.4).

Every step is a streaming Dataset stage — nothing materializes the full
input; the wide ``html`` column is dropped at the geocode projection
(SURVEY.md §4 memory row).
"""

from __future__ import annotations

import pyarrow as pa

from jimmy_ray.data import synth
from jimmy_ray.stages import extract as ex
from jimmy_ray.stages import spatial as sp


def pages(sf_dir: str):
    return synth.pages_dataset(sf_dir)


def extracted(sf_dir: str):
    """Extraction stage output: (url, warc_ts, lang, title, text, error)."""
    return pages(sf_dir).map_batches(
        ex.extract_markdown_batch, batch_format="pyarrow", batch_size=512
    )


def geo_points(sf_dir: str):
    """Located pages only: (url, lat_e6, lon_e6). html dropped early."""
    return pages(sf_dir).map_batches(
        ex.geocode_points_batch, batch_format="pyarrow", batch_size=512
    )


def tile_assignments(sf_dir: str):
    return geo_points(sf_dir).map_batches(
        sp.tile_assign_batch, batch_format="pyarrow", batch_size=4096
    )


def spatial_join(sf_dir: str, concurrency=(1, 4)):
    """Broadcast cell-indexed point-in-polygon join (actor pool)."""
    return geo_points(sf_dir).map_batches(
        sp.SpatialJoinStage,
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
    )


def knn(sf_dir: str, n_queries: int = 50, concurrency=(1, 4)):
    qpoints = synth.query_points(n_queries)
    cands = geo_points(sf_dir).map_batches(
        sp.KNNCandidateStage,
        fn_constructor_kwargs={"qpoints": qpoints},
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=concurrency,
    )
    return sp.knn_finalize(cands, {q["qid"]: q["k"] for q in qpoints})


def tile_counts(sf_dir: str, zoom: int = 10):
    """Per-tile page counts with a per-batch combiner: the shuffle moves
    one row per (tile, block), never per page (A1 partial-agg shape)."""
    import numpy as np
    import pyarrow as pa

    from ray.data.aggregate import Sum

    from jimmy_ray.geo import core as geo_core

    def partial(batch: pa.Table) -> pa.Table:
        tiles = geo_core.tile_id(
            batch["lat_e6"].to_numpy(zero_copy_only=False),
            batch["lon_e6"].to_numpy(zero_copy_only=False),
            zoom,
        )
        uniq, counts = np.unique(tiles, return_counts=True)
        return pa.table({
            f"tile_z{zoom}": pa.array(uniq, pa.int64()),
            "p_n": pa.array(counts, pa.int64()),
        })

    return (
        geo_points(sf_dir)
        .map_batches(partial, batch_format="pyarrow", batch_size=32768)
        .repartition(8)
        .groupby(f"tile_z{zoom}")
        .aggregate(Sum("p_n", alias_name="n_pages"))
    )


def run_flagship(sf_dir: str, out_dir: str, n_partitions: int = 16,
                 resume: bool = True) -> dict:
    """The full §3.4 lifecycle in one call: pages → extract → geocode →
    cell/tile index → spatial join → resumable partitioned sinks with
    per-partition lineage, plus the A1 counters row.

    Writes three products under ``out_dir`` (each independently
    resumable via its manifest):
      extracted/   (url, title, text, error)
      tiles/       (url, lat/lon, cells, tiles)
      join/        (url, polygon_id)
    Returns the combined run stats (counters + per-sink write stats).
    """
    from jimmy_ray.state import manifest

    stats: dict = {}
    stats["extracted"] = manifest.write_partitioned(
        extracted(sf_dir), f"{out_dir}/extracted",
        n_partitions=n_partitions, resume=resume,
    )
    stats["tiles"] = manifest.write_partitioned(
        tile_assignments(sf_dir), f"{out_dir}/tiles",
        n_partitions=n_partitions, resume=resume,
    )
    stats["join"] = manifest.write_partitioned(
        spatial_join(sf_dir), f"{out_dir}/join",
        n_partitions=n_partitions, resume=resume,
    )
    from jimmy_ray.stages.fuzzy import import_stats

    stats["counters"] = {
        k: v[0] for k, v in import_stats(sf_dir).to_pydict().items()
    }
    return stats


def flagship_result(sf_dir: str):
    """entry() result: join counts per polygon — exercises extract →
    geocode → cells → broadcast join → aggregate end-to-end.  Map-side
    partial counts so the exchange ships polygons, not pages (the
    tile_count combiner pattern)."""
    from ray.data.aggregate import Sum

    return (
        geo_points(sf_dir)
        .map_batches(sp.polygon_count_partial_batch,
                     batch_format="pyarrow", batch_size=4096)
        .repartition(8)  # coalesce tiny partials before the sort-groupby
        .groupby("polygon_id")
        .aggregate(Sum("p_n", alias_name="n_pages"))
    )
