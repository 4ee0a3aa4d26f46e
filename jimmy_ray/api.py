"""Engine API: stage registry + pipeline-spec compiler (SURVEY.md §2.10).

The reference's extension surface is a converter plugin API (subclass
BaseConverter, register by module name in FORMAT_REGISTRY, dynamic
import — /root/reference/src/jimmy/converter.py:19-158,
variables.py:10-52, main.py:74-83) parameterized by one plain-data
Config (common.py:33-58).  The Ray-native equivalent:

- a **stage** is a named factory ``(params) -> StageDef`` where StageDef
  says how to mount it on a Dataset (map_batches fn or actor class,
  batch format/size, concurrency);
- a **pipeline spec** is plain data — ``[{"stage": name, **params}]`` —
  compiled onto a source Dataset with :func:`compile_pipeline`;
- users extend the engine with ``@stage("my_stage")`` exactly like the
  reference's plugin modules, but the registered unit is a batch
  transform, not a per-file converter.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Callable
from typing import Any

STAGE_REGISTRY: dict[str, Callable[..., "StageDef"]] = {}


@dataclasses.dataclass
class StageDef:
    """How to mount one transform on a Dataset."""

    fn: Any  # callable batch fn, or a class for actor pools
    batch_format: str = "pyarrow"
    batch_size: int | None = None
    concurrency: Any = None  # None = stateless tasks; int/(min,max) = actors
    num_cpus: float | None = None
    fn_constructor_kwargs: dict | None = None
    kind: str = "map_batches"  # or "filter_expr" | "groupby_map_groups"
    groupby_key: Any = None

    def apply(self, ds):
        if self.kind == "map_batches":
            kwargs: dict[str, Any] = {"batch_format": self.batch_format}
            if self.batch_size is not None:
                kwargs["batch_size"] = self.batch_size
            if self.concurrency is not None:
                kwargs["concurrency"] = self.concurrency
            if self.num_cpus is not None:
                kwargs["num_cpus"] = self.num_cpus
            if self.fn_constructor_kwargs:
                kwargs["fn_constructor_kwargs"] = self.fn_constructor_kwargs
            return ds.map_batches(self.fn, **kwargs)
        if self.kind == "groupby_map_groups":
            return ds.groupby(self.groupby_key).map_groups(
                self.fn, batch_format=self.batch_format
            )
        raise ValueError(f"unknown stage kind {self.kind}")


def stage(name: str):
    """Register a stage factory under ``name`` (the plugin decorator)."""

    def deco(factory: Callable[..., StageDef]):
        if name in STAGE_REGISTRY:
            raise ValueError(f"stage {name!r} already registered")
        STAGE_REGISTRY[name] = factory
        return factory

    return deco


def compile_pipeline(source_ds, spec: list[dict]):
    """Apply a plain-data pipeline spec to a source Dataset.

    >>> spec = [{"stage": "extract_markdown"}, {"stage": "geocode_points"}]

    Unknown stage names raise immediately (the reference logs-and-falls-
    back to a default converter; an engine spec error should be loud).
    """
    ds = source_ds
    for item in spec:
        params = dict(item)
        name = params.pop("stage")
        factory = STAGE_REGISTRY.get(name)
        if factory is None:
            raise KeyError(
                f"unknown stage {name!r}; registered: {sorted(STAGE_REGISTRY)}"
            )
        ds = factory(**params).apply(ds)
    return ds


# --- built-in stages -------------------------------------------------------

@stage("extract_markdown")
def _extract_markdown() -> StageDef:
    from jimmy_ray.stages import extract as ex

    return StageDef(ex.extract_markdown_batch, batch_size=512)


@stage("geocode")
def _geocode() -> StageDef:
    from jimmy_ray.stages import extract as ex

    return StageDef(ex.geocode_batch, batch_size=512)


@stage("geocode_points")
def _geocode_points() -> StageDef:
    from jimmy_ray.stages import extract as ex

    return StageDef(ex.geocode_points_batch, batch_size=512)


@stage("tile_assign")
def _tile_assign() -> StageDef:
    from jimmy_ray.stages import spatial as sp

    return StageDef(sp.tile_assign_batch, batch_size=4096)


@stage("hex_s2_index")
def _hex_s2_index() -> StageDef:
    from jimmy_ray.stages import spatial as sp

    return StageDef(sp.hex_s2_index_batch, batch_size=4096)


@stage("spatial_join")
def _spatial_join(concurrency=(1, 4), batch_size: int = 4096) -> StageDef:
    from jimmy_ray.stages import spatial as sp

    return StageDef(sp.SpatialJoinStage, batch_size=batch_size,
                    concurrency=concurrency)


@stage("extract_links")
def _extract_links() -> StageDef:
    from jimmy_ray.stages import notes

    return StageDef(notes.links_batch, batch_size=512)


@stage("inline_tags")
def _inline_tags() -> StageDef:
    from jimmy_ray.stages import notes

    return StageDef(notes.tags_batch, batch_size=512)


@stage("polygon_stats_partial")
def _polygon_stats_partial() -> StageDef:
    from jimmy_ray.stages import geoagg

    return StageDef(geoagg.polygon_stats_partial, batch_size=8192)


@stage("cell_counts")
def _cell_counts() -> StageDef:
    from jimmy_ray.stages import geoagg

    return StageDef(geoagg._cell_count_partial, batch_size=16384)


@stage("text_stats")
def _text_stats() -> StageDef:
    from jimmy_ray.functions import textstats

    return StageDef(textstats.text_stats_batch)


@stage("lang_id")
def _lang_id() -> StageDef:
    from jimmy_ray.functions import textstats

    return StageDef(textstats.lang_id_batch)


@stage("media_features")
def _media_features(concurrency=(1, 4)) -> StageDef:
    from jimmy_ray.stages import multimodal

    return StageDef(multimodal.MediaFeatureStage, batch_size=256,
                    concurrency=concurrency)


@stage("subprocess_convert")
def _subprocess_convert(concurrency=(1, 4), batch_size: int = 256) -> StageDef:
    from jimmy_ray.stages import subproc

    return StageDef(subproc.SubprocessConverterStage, batch_size=batch_size,
                    concurrency=concurrency)


@stage("decrypt")
def _decrypt(password: str = "fixture-password",
             concurrency=(1, 4)) -> StageDef:
    from jimmy_ray.scalars import crypto

    return StageDef(crypto.DecryptStage, batch_size=512,
                    concurrency=concurrency,
                    fn_constructor_kwargs={"password": password})


@stage("filename_recovery")
def _filename_recovery(inventory: list | None = None,
                       concurrency=(1, 4)) -> StageDef:
    from jimmy_ray.stages import filerecovery

    return StageDef(filerecovery.FilenameRecoveryStage, batch_size=4096,
                    concurrency=concurrency,
                    fn_constructor_kwargs={"inventory": inventory or []})


@stage("repetition_stats")
def _repetition_stats() -> StageDef:
    import pyarrow as _pa

    from jimmy_ray.functions import textstats

    def batch_fn(batch: _pa.Table) -> _pa.Table:
        import collections
        import re as _re

        import numpy as _np

        tok_re = _re.compile(textstats.TOKEN_RE)
        top_n, tot_n = [], []
        for text in batch["text"].to_pylist():
            counts = collections.Counter(tok_re.findall(text.lower()))
            top_n.append(max(counts.values()) if counts else 0)
            tot_n.append(sum(counts.values()))
        top = _np.array(top_n, dtype=_np.int64)
        tot = _np.maximum(_np.array(tot_n, dtype=_np.int64), 1)
        return batch.append_column(
            "top_token_ratio",
            _pa.array(top.astype(_np.float64) / tot.astype(_np.float64),
                      _pa.float64()),
        )

    return StageDef(batch_fn, batch_size=2048)


@stage("enex_to_markdown")
def _enex_to_markdown(password: str | None = None) -> StageDef:
    import pyarrow as _pa

    from jimmy_ray.md.enex import enex_body_to_md

    def batch_fn(batch: _pa.Table) -> _pa.Table:
        texts = [enex_body_to_md(x, password)[0]
                 for x in batch["content"].to_pylist()]
        out = {n: batch[n] for n in batch.column_names}
        out["text"] = _pa.array(texts, _pa.string())
        return _pa.table(out)

    return StageDef(batch_fn, batch_size=256)


@stage("main_content")
def _main_content() -> StageDef:
    from jimmy_ray.html import maincontent

    return StageDef(maincontent.main_content_batch, batch_size=512)


@stage("c4_clean")
def _c4_clean() -> StageDef:
    from jimmy_ray.functions import c4

    return StageDef(c4.c4_clean_batch, batch_size=4096)


@stage("normalize_unicode")
def _normalize_unicode() -> StageDef:
    from jimmy_ray.scalars import charset

    return StageDef(charset.normalize_batch, batch_size=4096)
