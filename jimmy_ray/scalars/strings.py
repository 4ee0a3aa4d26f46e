"""String scalars (SURVEY.md §2.2 M24).

Behavioral ports from /root/reference/src/jimmy/common.py:276-343
(pascal case) and /root/reference/src/jimmy/formats/facebook.py:10-13
(latin-1 mojibake repair); implementations written fresh against the
doctest specs."""

from __future__ import annotations

import re
import string

_PASCAL_RE = re.compile(r"^(?:[A-Z][a-z]+)+$")


def is_pascal_case(value: str) -> bool:
    """
    >>> is_pascal_case("camel")
    False
    >>> is_pascal_case("camelCase")
    False
    >>> is_pascal_case("CamelCase")
    True
    >>> is_pascal_case("CAMELCASE")
    False
    >>> is_pascal_case("Camelcase")
    True
    >>> is_pascal_case("~HelloThere")
    False
    """
    return bool(_PASCAL_RE.match(value))


def to_pascal_case(value: str) -> str:
    """
    >>> to_pascal_case("abc")
    'Abc'
    >>> to_pascal_case("make IT pascal CaSe")
    'MakeItPascalCase'
    >>> to_pascal_case("PascalCase")
    'PascalCase'
    >>> to_pascal_case("snake_case")
    'SnakeCase'
    >>> to_pascal_case("kebab-case")
    'KebabCase'
    >>> to_pascal_case("PascalCase).")
    'PascalCase'
    """
    value = value.strip(string.punctuation)
    if is_pascal_case(value):
        return value
    for p in string.punctuation:
        value = value.replace(p, " ")
    return value.title().replace(" ", "")


def fix_encoding_error(text: str) -> str:
    """Repair utf-8-read-as-latin-1 mojibake (facebook.py:10-13).

    >>> fix_encoding_error("grÃ¼Ãe")
    'grüße'
    >>> fix_encoding_error("plain")
    'plain'
    """
    try:
        return text.encode("latin-1").decode("utf-8")
    except (UnicodeEncodeError, UnicodeDecodeError):
        return text


def find_pascal_case_links(body: str, titles: set[str]) -> list[str]:
    """TiddlyWiki-style CamelCase auto-linking probe (SURVEY.md §2.4 J6,
    /root/reference/src/jimmy/formats/tiddlywiki.py:371-413): every
    PascalCase word of the body that names an existing title.  The title
    set is the broadcast small side."""
    hits = []
    for word in body.split():
        w = word.strip(string.punctuation)
        if w and is_pascal_case(w) and w in titles:
            hits.append(w)
    return hits
