"""Filesystem-safe path scalars (SURVEY.md §2.2 M18, §2.7).

Behavioral port of /root/reference/src/jimmy/common.py:85-168 (safe_path)
and :171-202 (get_unique_path), re-keyed for determinism: the reference
falls back to seeded uuids for empty names (common.py:364-370) and to
filesystem probing for collisions; here both are pure functions of the
stable key (url / content hash), so any parallelism yields identical
output (SURVEY.md §4 determinism row).
"""

from __future__ import annotations

import hashlib
import posixpath

_WINDOWS_FORBIDDEN = ["<", ">", ":", '"', "/", "\\", "|", "?", "*"] + [
    chr(v) for v in range(32)
]
_FORBIDDEN_NAMES = (
    ["CON", "PRN", "AUX", "NUL"]
    + [f"COM{i}" for i in range(1, 10)]
    + [f"LPT{i}" for i in range(1, 10)]
)


def safe_path(name: str, max_name_length: int = 50, key: str = "") -> str:
    r"""
    >>> safe_path("ab" + chr(0) + "c")
    'ab_c'
    >>> safe_path("CON")
    'CON_'
    >>> safe_path("LPT7")
    'LPT7_'
    >>> safe_path("bc.")
    'bc_'
    >>> safe_path("b:c")
    'b_c'
    >>> safe_path("a/b/c")
    'a_b_c'
    >>> safe_path("g" * 50, max_name_length=4)
    'gggg'
    >>> safe_path("g" * 20 + ".png", max_name_length=10)
    'gggggg.png'
    >>> safe_path("08.06.2014 16:58:55")
    '08.06.2014 16_58_55'
    >>> safe_path("", key="https://x/1")
    'unnamed_2b6a374db3ab8f57f12fc5ebaf42145e'
    """
    if name == "":
        # deterministic replacement for the reference's seeded-uuid fallback
        return "unnamed_" + hashlib.md5(key.encode()).hexdigest()
    for c in _WINDOWS_FORBIDDEN:
        name = name.replace(c, "_")
    if name in _FORBIDDEN_NAMES:
        name += "_"
    if name[-1] in (" ", "."):
        name = name[:-1] + "_"
    name = name.replace("/", "_").replace("\x00", "_")
    if name in (".", ".."):
        name += "_"
    diff = len(name) - max_name_length
    if diff > 0:
        stem, suffix = posixpath.splitext(name)
        if suffix and suffix != "." and len(suffix) < 10:
            name = stem[:-diff] + suffix
        else:
            name = name[:-diff]
    return name


def unique_name(name: str, seen_hashes: dict[str, str], content_hash: str) -> str:
    """Deterministic collision numbering (get_unique_path semantics,
    common.py:171-202): identical content reuses the name; different
    content gets ``name_0001``-style suffixes.  Caller iterates names in a
    deterministic (sorted) order within one group — the reference's
    sorted-iteration invariant.

    ``seen_hashes`` maps already-allocated name -> content hash.
    """
    if name not in seen_hashes:
        seen_hashes[name] = content_hash
        return name
    if seen_hashes[name] == content_hash:
        return name
    stem, suffix = posixpath.splitext(name)
    for idx in range(1, 10000):
        cand = f"{stem}_{idx:04}{suffix}"
        if cand not in seen_hashes:
            seen_hashes[cand] = content_hash
            return cand
        if seen_hashes[cand] == content_hash:
            return cand
    # deterministic last resort (reference: uuid; here: content hash)
    cand = f"{stem}_{content_hash}{suffix}"
    seen_hashes[cand] = content_hash
    return cand
