"""Shared /tmp cache keying for driver-built sqlite fixtures.

The Anki and QOwnNotes readers materialize a sqlite database derived
from ``documents.parquet``; the cache key embeds a content fingerprint
(size + mtime_ns) of the source so a regenerated fixture or a
same-basename sibling tree never collides (ADVICE r2).  Builders write
to a pid-suffixed temp path and ``os.replace`` into place, so
concurrent processes race safely to an identical artifact.
"""

from __future__ import annotations

import os


def cache_path(sf_dir: str, prefix: str, suffix: str) -> str:
    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    tag = (f"{os.path.basename(os.path.normpath(sf_dir))}"
           f"_{st.st_size}_{st.st_mtime_ns}")
    return f"/tmp/{prefix}_{tag}{suffix}"
