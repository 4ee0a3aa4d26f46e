"""Inline tag extraction (SURVEY.md §2.2 M14).

Behavioral port of the word-scan spec at
/root/reference/src/jimmy/md_lib/tags.py:4-27: a word is a tag when it
starts with a marker character, has length > 1, and is not made of marker
characters only (so ``###`` headers are not tags).  Returns tags in a
deterministic sorted order (the reference returns set order; we re-key
every nondeterminism, SURVEY.md §4)."""

from __future__ import annotations


def get_inline_tags(text: str, start_characters: tuple[str, ...] = ("#",)) -> list[str]:
    """
    >>> get_inline_tags("# header")
    []
    >>> get_inline_tags("### h3")
    []
    >>> get_inline_tags("#tag")
    ['tag']
    >>> get_inline_tags("#tag abc")
    ['tag']
    >>> get_inline_tags("#tag @abc", ("#", "@"))
    ['abc', 'tag']
    """
    tags = set()
    for word in text.split():
        if (
            any(word.startswith(c) for c in start_characters)
            and len(word) > 1
            and any(c not in start_characters for c in word)
        ):
            tags.add(word[1:])
    return sorted(tags)
