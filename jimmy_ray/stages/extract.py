"""Extraction + geocode map_batches stages over the pages table.

- :func:`extract_markdown_batch` — the jimmy converter as a stateless
  Arrow-batch transform (SURVEY.md §2.2 M1-M3; north star: "jimmy's
  extraction as a stateless map_batches stage ... byte-identical
  extracted text per url").  HTML parsing is inherently per-document
  (same as the reference's per-note converters,
  /root/reference/src/jimmy/converter.py:239-387), but the stage is
  zero-copy Arrow in/out and embarrassingly parallel across blocks.
- :func:`geocode_batch` — vectorized integer-exact parse of the
  ``geo.position`` meta tag (the target-side analogue of the reference's
  first-class note coordinates,
  /root/reference/src/jimmy/intermediate_format.py:183-185).  Regex runs
  only over the first ``_HEAD_BYTES`` of each page, so the wide ``html``
  column is never scanned fully.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from jimmy_ray.html import extract as hx

_HEAD_BYTES = 512
_GEO_RE = r'name="geo\.position" content="(-?)(\d+)\.(\d{6});(-?)(\d+)\.(\d{6})"'


def extract_markdown_batch(batch: pa.Table) -> pa.Table:
    """pages batch -> (url, warc_ts, lang, title, text) with text = extracted
    Markdown. Row-level fault isolation: a failing document yields
    error != NULL and empty text instead of crashing the task (mirrors
    @catch_all_exceptions, /root/reference/src/jimmy/common.py:66-82)."""
    htmls = batch["html"].to_pylist()
    texts: list[str] = []
    titles: list[str] = []
    errors: list[str | None] = []
    for html in htmls:
        try:
            text, title = hx.html_to_markdown_and_title(html)
            texts.append(text)
            titles.append(title)
            errors.append(None)
        except Exception as exc:  # noqa: BLE001 - dead-letter semantics
            texts.append("")
            titles.append("")
            errors.append(f"{type(exc).__name__}: {exc}")
    return pa.table(
        {
            "url": batch["url"],
            "warc_ts": batch["warc_ts"],
            "lang": batch["lang"],
            "title": pa.array(titles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "error": pa.array(errors, pa.string()),
        }
    )


def _parse_geo_heads(heads: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized exact microdegree parse. Returns (has_geo, lat_e6, lon_e6)."""
    groups = heads.str.extract(_GEO_RE)
    has_geo = groups[1].notna().to_numpy()
    lat_e6 = np.zeros(len(heads), dtype=np.int64)
    lon_e6 = np.zeros(len(heads), dtype=np.int64)
    if has_geo.any():
        sub = groups[has_geo]
        lat = sub[1].astype(np.int64) * 1_000_000 + sub[2].astype(np.int64)
        lat = np.where(sub[0] == "-", -lat, lat)
        lon = sub[4].astype(np.int64) * 1_000_000 + sub[5].astype(np.int64)
        lon = np.where(sub[3] == "-", -lon, lon)
        lat_e6[has_geo] = lat
        lon_e6[has_geo] = lon
    return has_geo, lat_e6, lon_e6


def geocode_batch(batch: pa.Table) -> pa.Table:
    """Append nullable int64 lat_e6 / lon_e6 parsed from the html head."""
    has_geo, lat_e6, lon_e6 = _parse_geo_heads(_decode_heads(batch))
    null_mask = ~has_geo
    lat_col = pa.array(lat_e6, pa.int64(), mask=null_mask)
    lon_col = pa.array(lon_e6, pa.int64(), mask=null_mask)
    return batch.append_column("lat_e6", lat_col).append_column("lon_e6", lon_col)


def _decode_heads(batch: pa.Table) -> pd.Series:
    """First _HEAD_BYTES of html as strings — vectorized Arrow fast path
    (binary_slice + cast), falling back to per-row decode only if the
    slice cut a multibyte codepoint somewhere in the batch."""
    import pyarrow.compute as pc

    sliced = pc.binary_slice(batch["html"], 0, _HEAD_BYTES)
    try:
        return pc.cast(sliced, pa.string()).to_pandas()
    except pa.ArrowInvalid:
        return pd.Series(
            [h[:_HEAD_BYTES].decode("utf-8", errors="replace")
             for h in batch["html"].to_pylist()]
        )


def geocode_points_batch(batch: pa.Table) -> pa.Table:
    """Like geocode_batch but emits only located rows (url, lat_e6, lon_e6)
    — drops the wide html column early (SURVEY.md §4 memory row)."""
    has_geo, lat_e6, lon_e6 = _parse_geo_heads(_decode_heads(batch))
    return pa.table(
        {
            "url": batch["url"].filter(pa.array(has_geo)),
            "lat_e6": pa.array(lat_e6[has_geo], pa.int64()),
            "lon_e6": pa.array(lon_e6[has_geo], pa.int64()),
        }
    )


def table_extract(sf_dir: str):
    """Complex-table normalization as an oracle-checked op: one synthesized
    rowspan/colspan/hidden/block-content table per document → extracted
    pipe-table markdown (streamline_tables behavior port,
    /root/reference/src/jimmy/md_lib/html_filter.py:568-673)."""
    import ray.data as rd

    from jimmy_ray.data import synth

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = [hx.html_to_markdown(synth.render_table_html(i)) for i in ids]
        return pa.table({"doc_id": batch["doc_id"],
                         "text": pa.array(texts, pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=256)
