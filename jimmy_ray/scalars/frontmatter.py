"""Frontmatter writers + template formatter (SURVEY.md §2.2 M20/M21).

Behavioral ports of /root/reference/src/jimmy/intermediate_format.py:
- apply_frontmatter dialects :229-287 (futo header-tag-block, joplin,
  obsidian, qownnotes) — the reference serializes via python-frontmatter
  + PyYAML (unavailable here); this module emits the same minimal YAML
  subset deterministically (sorted keys within each dialect's fixed key
  order, block style lists).
- apply_template via a string.Formatter subclass :155-171,214-227.
"""

from __future__ import annotations

import string

from jimmy_ray.scalars.tagnorm import normalize_tag_for_futo, normalize_tag_for_obsidian


def _yaml_scalar(value) -> str:
    if isinstance(value, bool):
        return "true" if value else "false"
    if value is None:
        return "null"
    if isinstance(value, (int, float)):
        return repr(value)
    text = str(value)
    needs_quote = (
        text == ""
        or text.strip() != text
        or any(c in text for c in ":#{}[]&*!|>'\"%@`\n")
        or text.lower() in ("null", "true", "false", "yes", "no")
    )
    if needs_quote:
        return "'" + text.replace("'", "''") + "'"
    return text


def _yaml_dump(items: list[tuple[str, object]]) -> str:
    lines: list[str] = []
    for key, value in items:
        if isinstance(value, (list, tuple)):
            lines.append(f"{key}:")
            for v in value:
                lines.append(f"- {_yaml_scalar(v)}")
        else:
            lines.append(f"{key}: {_yaml_scalar(value)}")
    return "\n".join(lines)


def apply_frontmatter(
    body: str,
    dialect: str,
    *,
    title: str | None = None,
    author: str | None = None,
    created_iso: str | None = None,
    updated_iso: str | None = None,
    latitude: float | None = None,
    longitude: float | None = None,
    altitude: float | None = None,
    tags: list[str] | None = None,
) -> str:
    """Prepend the dialect's metadata block.

    >>> apply_frontmatter("b", "futo", tags=["x", "2fast"])
    '#a2fast #x\\n\\nb'
    >>> apply_frontmatter("b", "obsidian", tags=["a b", "z"])
    '---\\ntags:\\n- a_b\\n- z\\n---\\n\\nb'
    >>> apply_frontmatter("b", "qownnotes", tags=["t2", "t1"])
    '---\\ntags: t1 t2\\n---\\n\\nb'
    >>> apply_frontmatter("b", "unknown", tags=["x"])
    'b'
    """
    tags = tags or []
    if dialect == "futo":
        if not tags:
            return body
        block = " ".join(
            sorted(f"#{normalize_tag_for_futo(t)}" for t in tags if t)
        )
        return f"{block}\n\n{body}"
    if dialect == "joplin":
        items: list[tuple[str, object]] = []
        for key, value in (
            ("title", title), ("created", created_iso), ("updated", updated_iso),
            ("author", author), ("latitude", latitude), ("longitude", longitude),
            ("altitude", altitude),
        ):
            if value is not None:
                items.append((key, value))
        if tags:
            items.append(("tags", sorted(t.lower() for t in tags)))
        return f"---\n{_yaml_dump(items)}\n---\n\n{body}"
    if dialect == "obsidian":
        if not tags:
            return body
        items = [("tags", sorted(normalize_tag_for_obsidian(t) for t in tags))]
        return f"---\n{_yaml_dump(items)}\n---\n\n{body}"
    if dialect == "qownnotes":
        if not tags:
            return body
        return f"---\ntags: {' '.join(sorted(tags))}\n---\n\n{body}"
    return body


class NoteFormatter(string.Formatter):
    """Template formatter: missing keys render as yaml null
    (intermediate_format.py:155-171)."""

    def get_value(self, key, args, kwargs):
        if isinstance(key, str):
            value = kwargs.get(key)
            return value if value is not None else "null"
        return super().get_value(key, args, kwargs)

    def format_field(self, value, format_spec):
        if value == "null":
            return "null"
        return super().format_field(value, format_spec)


def apply_template(template: str, **fields) -> str:
    """
    >>> apply_template("{title}\\n\\n{body}", title="T", body="B")
    'T\\n\\nB'
    >>> apply_template("{missing}|{body}", body="B")
    'null|B'
    """
    return NoteFormatter().format(template, **fields)
