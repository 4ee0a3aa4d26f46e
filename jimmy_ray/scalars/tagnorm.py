"""Tag normalizers (SURVEY.md §2.2 M19).

Behavioral ports of the doctest specs at
/root/reference/src/jimmy/intermediate_format.py:22-76."""

from __future__ import annotations

import re
import string

_OBSIDIAN_TAG_RE = re.compile(r"[^\w/_-]", re.UNICODE)
_ASCII_LETTERS = set(string.ascii_letters)
_FUTO_VALID = set(string.ascii_letters + string.digits + "_-")


def normalize_tag_for_futo(tag: str) -> str:
    """
    >>> normalize_tag_for_futo("123")
    'a123'
    >>> normalize_tag_for_futo("")
    ''
    >>> normalize_tag_for_futo("example#section")
    'example-section'
    >>> normalize_tag_for_futo("normalize-futo_tag-123")
    'normalize-futo_tag-123'
    >>> normalize_tag_for_futo("a" * 51)
    'aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa'
    """
    out = ""
    for index, char in enumerate(tag):
        if index == 0 and char not in _ASCII_LETTERS:
            out += "a"
        out += char if char in _FUTO_VALID else "-"
        if len(out) == 50:
            return out
    return out


def normalize_tag_for_obsidian(tag: str) -> str:
    """
    >>> normalize_tag_for_obsidian("nested/tag")
    'nested/tag'
    >>> normalize_tag_for_obsidian("grüße-cześć-привет-你好")
    'grüße-cześć-привет-你好'
    >>> normalize_tag_for_obsidian("mul & tip...le")
    'mul___tip___le'
    >>> normalize_tag_for_obsidian("1984")
    '1984_'
    >>> normalize_tag_for_obsidian("y1984")
    'y1984'
    """
    out = _OBSIDIAN_TAG_RE.sub("_", tag)
    if out.isdigit():
        out += "_"
    return out
