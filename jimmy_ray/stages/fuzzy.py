"""Fuzzy title matching (SURVEY.md §2.4 J5) + import-stats counters (A1).

J5 ports the reference's similarity argmax
(/root/reference/src/jimmy/common.py:373-400): for each query title,
the best SequenceMatcher ratio against a broadcast title index, linked
only when ratio >= 0.6, with an exact-match fast path.  The index is the
small side (ray.put-style broadcast via actor __init__); candidates are
deterministic: ties broken by first index entry in sorted-title order
(the reference relies on dict insertion order — re-keyed to sorted order
per SURVEY.md §4).

A1 ports get_import_stats (/root/reference/src/jimmy/common.py:408-451):
one global counters row (notes/links/tags/resources-analogue) assembled
from per-batch partial counts — the same partial→sum shape that emits
per-partition lineage metrics at scale.
"""

from __future__ import annotations

import difflib

import pyarrow as pa


class FuzzyTitleMatchStage:
    """Actor-pool stage: (qtitle rows) -> (qtitle, matched_title, ratio).

    ``titles`` is the broadcast index (small side).  Exact matches skip
    the O(n) scan; below-threshold queries emit a null match (the
    reference's None / debug-log path)."""

    def __init__(self, titles: list[str], threshold: float = 0.6):
        self.titles = sorted(set(titles))
        self.threshold = threshold
        self.exact = set(self.titles)
        # length buckets: ratio == 2M/(la+lb) <= 2*min(la,lb)/(la+lb), so
        # whole buckets prune once that bound drops below the running best
        # (the candidate-prune the O(titles) scan needed at scale; result
        # is bit-identical to the full scan — ties resolve to the sorted-
        # first title in both).
        self.by_len: dict[int, list[str]] = {}
        for t in self.titles:
            self.by_len.setdefault(len(t), []).append(t)

    def best_match(self, query: str) -> tuple[str | None, float]:
        if query in self.exact:
            return query, 1.0
        la = len(query)

        def bound(lb: int) -> float:
            return 2.0 * min(la, lb) / (la + lb) if la + lb else 0.0

        best_ratio = -1.0
        best_title = None
        for lb in sorted(self.by_len, key=bound, reverse=True):
            if bound(lb) < best_ratio:  # no later bucket can beat or tie
                break
            for title in self.by_len[lb]:
                sm = difflib.SequenceMatcher(None, query, title)
                if sm.real_quick_ratio() < best_ratio:
                    continue
                if sm.quick_ratio() < best_ratio:
                    continue
                ratio = sm.ratio()
                if ratio > best_ratio or (
                    ratio == best_ratio
                    and best_title is not None
                    and title < best_title
                ):
                    best_ratio = ratio
                    best_title = title
        if best_ratio < self.threshold:
            return None, best_ratio
        return best_title, best_ratio

    def __call__(self, batch: pa.Table) -> pa.Table:
        queries = batch["qtitle"].to_pylist()
        matches: list[str | None] = []
        ratios: list[float] = []
        for q in queries:
            m, r = self.best_match(q)
            matches.append(m)
            ratios.append(round(r, 6))
        out = {name: batch[name] for name in batch.column_names}
        out["matched_title"] = pa.array(matches, pa.string())
        out["match_ratio"] = pa.array(ratios, pa.float64())
        return pa.table(out)


def fuzzy_title_match(sf_dir: str):
    """Match mangled titles back to the note-title index (rows-only check;
    difflib has no SQL mirror — covered by unit tests instead)."""
    import ray.data as rd

    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    titles = [f"Doc {d}" for d in docs["doc_id"].to_pylist()]

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def mangle(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        # deterministic deformations: casing, decoration, truncation
        qtitles = []
        for d in ids:
            mode = d % 4
            base = f"Doc {d}"
            if mode == 0:
                qtitles.append(base)                      # exact
            elif mode == 1:
                qtitles.append(f'*"{base}"*')             # decorated
            elif mode == 2:
                qtitles.append(base.lower())              # case-mangled
            else:
                qtitles.append(f"{base} (copy)")          # suffixed
        return pa.table({"doc_id": batch["doc_id"],
                         "qtitle": pa.array(qtitles, pa.string())})

    return ds.map_batches(mangle, batch_format="pyarrow").map_batches(
        FuzzyTitleMatchStage,
        fn_constructor_kwargs={"titles": titles},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
    )


def import_stats(sf_dir: str):
    """One counters row over the extracted corpus (A1): pages, notes with
    titles, links, tags, geo points, errors."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from jimmy_ray.md import links as md_links
    from jimmy_ray.md import tags as md_tags
    from jimmy_ray.md import text as md_text
    from jimmy_ray.pipelines import flagship

    pages = flagship.extracted(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        n_links = 0
        n_tags = 0
        n_titled = 0
        for text in batch["text"].to_pylist():
            n_links += len(md_links.get_markdown_links(text))
            n_tags += len(md_tags.get_inline_tags(text))
            if md_text.split_title_from_body(text)[0]:
                n_titled += 1
        n_err = int(pc.sum(pc.cast(pc.is_valid(batch["error"]), pa.int64())).as_py())
        return pa.table({
            "p_pages": pa.array([batch.num_rows], pa.int64()),
            "p_titled": pa.array([n_titled], pa.int64()),
            "p_links": pa.array([n_links], pa.int64()),
            "p_tags": pa.array([n_tags], pa.int64()),
            "p_errors": pa.array([n_err], pa.int64()),
        })

    partials = pages.map_batches(partial, batch_format="pyarrow", batch_size=512)
    row = partials.aggregate(
        Sum("p_pages", alias_name="n_pages"),
        Sum("p_titled", alias_name="n_titled_notes"),
        Sum("p_links", alias_name="n_links"),
        Sum("p_tags", alias_name="n_tags"),
        Sum("p_errors", alias_name="n_errors"),
    )
    # Return an Arrow table (same shape as every other query) — the driver's
    # hash path is exercised on Dataset/Table results; a lone DataFrame was
    # an untested shape in round 1 (ADVICE.md).
    return pa.table(
        {k: pa.array([int(v)], pa.int64()) for k, v in row.items()}
    )
