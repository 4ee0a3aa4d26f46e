"""Doctest conformance corpus for the scalar/markdown library
(FIXTURES.md §6 — behavioral ports of the reference doctest specs)."""

import doctest

import pytest

import jimmy_ray.md.links as links_mod
import jimmy_ray.md.tags as tags_mod
import jimmy_ray.md.text as text_mod
import jimmy_ray.scalars.dates as dates_mod
import jimmy_ray.scalars.frontmatter as fm_mod
import jimmy_ray.scalars.paths as paths_mod
import jimmy_ray.scalars.strings as strings_mod
import jimmy_ray.scalars.tagnorm as tagnorm_mod

MODULES = [links_mod, tags_mod, text_mod, dates_mod, fm_mod, paths_mod,
           strings_mod, tagnorm_mod]


@pytest.mark.parametrize("mod", MODULES, ids=[m.__name__ for m in MODULES])
def test_doctests(mod):
    result = doctest.testmod(mod, verbose=False)
    assert result.attempted > 0, f"{mod.__name__} has no doctests"
    assert result.failed == 0


def test_unique_name_collision_numbering():
    seen: dict[str, str] = {}
    assert paths_mod.unique_name("a.md", seen, "h1") == "a.md"
    assert paths_mod.unique_name("a.md", seen, "h1") == "a.md"  # same content
    assert paths_mod.unique_name("a.md", seen, "h2") == "a_0001.md"
    assert paths_mod.unique_name("a.md", seen, "h3") == "a_0002.md"
    assert paths_mod.unique_name("a.md", seen, "h2") == "a_0001.md"  # reuse


def test_pascal_case_links():
    titles = {"CamelCase", "OtherPage"}
    hits = strings_mod.find_pascal_case_links(
        "see CamelCase and OtherPage, but not camelCase or Unknown.", titles
    )
    assert hits == ["CamelCase", "OtherPage"]


def test_link_extraction_more_cases():
    got = links_mod.get_markdown_links("[mul](tiple) [links](...)")
    assert [(l.text, l.url) for l in got] == [("mul", "tiple"), ("links", "...")]
    got = links_mod.get_markdown_links("[[multiple]] [[links]]")
    assert [l.url for l in got] == ["multiple", "links"]
    got = links_mod.get_markdown_links("![](image.png)")
    assert got[0].is_image and got[0].url == "image.png"
    assert links_mod.get_markdown_links("plain text, no links") == []
    # images come before links (reference ordering, links.py:324)
    got = links_mod.get_markdown_links("[a](b) ![i](j.png)")
    assert [l.is_image for l in got] == [True, False]


def test_frontmatter_joplin():
    out = fm_mod.apply_frontmatter(
        "body", "joplin", title="T", created_iso="2024-01-01T00:00:00",
        latitude=1.5, tags=["B", "a"],
    )
    assert out.startswith("---\n")
    assert "title: T" in out
    assert "latitude: 1.5" in out
    assert "- a\n- b" in out  # joplin lowercases tags
    assert out.endswith("---\n\nbody")


def test_fuzzy_best_match_reference_semantics():
    """Port of get_best_match doctests (common.py:373-400)."""
    from jimmy_ray.stages.fuzzy import FuzzyTitleMatchStage

    stage = FuzzyTitleMatchStage(["quoted and italic"])
    m, r = stage.best_match('*"quoted", and italic*')
    assert m == "quoted and italic" and r >= 0.6

    stage = FuzzyTitleMatchStage(["a", "b", "c"])
    assert stage.best_match("b")[0] == "b"
    assert stage.best_match("d")[0] is None


def test_glob_regex_re2_matches_python():
    """The \\Z→\\z substitution keeps Arrow's re2 kernel byte-equivalent
    to Python's re for fnmatch-translated globs (filter_notes/filter_tags)."""
    import fnmatch
    import re

    import pyarrow as pa
    import pyarrow.compute as pc

    globs = ("Doc 1*", "B?x[abc]*", "*tail", "exact")
    values = pa.array(["Doc 1x", "Doc 2", "doc 1", "Bqxa t", "Bqxz",
                       "a tail", "tail", "exact", "exactly", ""])
    pat = "|".join(fnmatch.translate(g) for g in globs)
    py = [bool(re.compile(pat).match(v)) for v in values.to_pylist()]
    re2 = pc.match_substring_regex(
        values, "^(?:" + pat.replace("\\Z", "\\z") + ")").to_pylist()
    assert re2 == py
