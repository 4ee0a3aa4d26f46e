"""Pure-parser edge cases for the round-3 readers (no Ray needed)."""

import io
import json
import zipfile

import pytest

from jimmy_ray.sources.flatjson2 import (
    parse_cacher, parse_clipto, parse_turtl, reflect_json_to_markdown,
)
from jimmy_ray.sources.folders import (
    anytype_block_to_md, parse_anytype, parse_dynalist, parse_takeout,
)
from jimmy_ray.sources.markdown_folders import (
    get_qownnote_links, parse_frontmatter_tags, parse_obsidian,
)
from jimmy_ray.sources.nimbus import _try_other_suffixes, improve_note_links
from jimmy_ray.sources.synology import get_best_match, parse_nsx, synth_nsx


def test_get_best_match_ported_doctests():
    """common.py:373-399 semantics."""
    assert get_best_match('*"quoted", and italic*',
                          {1: "quoted and italic"}) == 1
    assert get_best_match("b", {"a": "a", "b": "b", "c": "c"}) == "b"
    assert get_best_match("d", {"a": "a", "b": "b", "c": "c"}) is None
    assert get_best_match("x", {}) is None


def test_synology_rejects_non_nsx():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("config.json", json.dumps({"notebook": []}))
    with pytest.raises(ValueError):
        parse_nsx(buf.getvalue())


def test_synology_trash_and_thumb_skipped():
    rows = parse_nsx(synth_nsx(7, "body"))
    assert [r["note_id"] for r in rows] == ["note_7_0", "note_7_1"]
    # the thumbnail never becomes a resource; the referenced one does
    assert rows[0]["resources"] == "att7.png"


def test_nimbus_try_other_suffixes_case_ladder():
    members = {"assets/Report.MD", "assets/data.md", "assets/other.txt"}
    # case-sensitive stem match wins first
    assert _try_other_suffixes("assets/data.txt", members) == "assets/data.md"
    # case-insensitive fallback
    assert _try_other_suffixes("assets/report.txt", members) == \
        "assets/Report.MD"
    assert _try_other_suffixes("assets/none.txt", members) is None


def test_nimbus_improve_note_links_threshold():
    title_map = {"Deploy notes": "Deploy notes"}
    assert improve_note_links(["Deploy notes v2"], title_map) == \
        ["Deploy notes"]
    assert improve_note_links(["completely different"], title_map) == []
    assert improve_note_links(["x"], {}) == []


def test_cacher_non_markdown_files_skipped():
    raw = json.dumps({"personalLibrary": {
        "labels": [],
        "snippets": [{"title": "S", "guid": "g", "files": [
            {"filetype": "plaintext", "filename": "a.txt", "guid": "f1",
             "content": "x", "createdAt": "t", "updatedAt": "t"},
        ]}],
    }})
    assert parse_cacher(raw) == []


def test_clipto_untitled_first_line_split():
    raw = json.dumps({"filters": [], "notes": [
        {"text": "First\nrest", "created": "c", "updated": "u"},
    ]})
    rows = parse_clipto(raw)
    assert rows[0]["title"] == "First"
    assert rows[0]["body"] == "rest"


def test_turtl_unknown_type_empty_body():
    raw = json.dumps({
        "spaces": [{"id": "s", "title": "Sp"}], "boards": [], "files": [],
        "notes": [{"id": "n", "type": "bookmark", "title": "T",
                   "tags": [], "mod": 0, "space_id": "s",
                   "board_id": None, "url": ""}],
    })
    assert parse_turtl(raw)[0]["body"] == ""


def test_reflect_paragraph_after_list_marker_insertion():
    """reflect.py:40-46: a paragraph right after a list marker inserts
    the break BEFORE the marker, keeping the bullet attached."""
    doc = {"type": "doc", "content": [
        {"type": "list", "attrs": {"kind": "bullet"},
         "content": [{"type": "text", "text": "item"}]},
    ]}
    md, _, _ = reflect_json_to_markdown(doc)
    assert "".join(md) == "- item"
    doc2 = {"type": "doc", "content": [
        {"type": "list", "attrs": {"kind": "ordered"}, "content": []},
        {"type": "paragraph", "content": [{"type": "text", "text": "p"}]},
    ]}
    md2, _, _ = reflect_json_to_markdown(doc2)
    assert "".join(md2) == "\n\n1. p"


def test_dynalist_opml_skipped_and_link_probe():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("a.txt", "[b](https://dynalist.io/d/1) "
                             "[nope](https://dynalist.io/d/2)")
        zf.writestr("sub/b.txt", "x")
        zf.writestr("a.opml", "<opml/>")
    rows = parse_dynalist(buf.getvalue())
    assert [r["title"] for r in rows] == ["a", "b"]
    assert rows[0]["note_links"] == "b"  # b.txt exists anywhere; 'nope' not


def test_takeout_only_drive_subtree():
    rows = parse_takeout({
        "Takeout/Drive/x.md": "m",
        "Takeout/archive_browser.html": "skip",
        "other/y.md": "skip",
    })
    assert [r["member"] for r in rows] == ["x.md"]


def test_anytype_marks_and_non_page_skip():
    block = {"text": {"text": "abcdef", "style": "Paragraph",
                      "marks": {"marks": [
                          {"type": "Keyboard",
                           "range": {"from": 0, "to": 3}}]}}}
    assert anytype_block_to_md(block) == "`abc`def"
    assert parse_anytype(json.dumps({"sbType": "Profile",
                                     "snapshot": {"data": {}}})) == []


def test_frontmatter_tags_subset():
    tags, rest = parse_frontmatter_tags("---\ntags: [a, b]\n---\nbody")
    assert tags == ["a", "b"] and rest == "body"
    assert parse_frontmatter_tags("no fm") == ([], "no fm")
    assert parse_frontmatter_tags("---\nbroken") == ([], "---\nbroken")


def test_obsidian_internal_folder_and_non_md_skipped():
    rows = parse_obsidian({
        ".obsidian/x.md": "internal",
        "a.md": "plain",
        "b.txt": "not markdown",
    })
    assert [r["title"] for r in rows] == ["a"]


def test_qownnote_links_ported_doctests():
    assert get_qownnote_links("no link") == []
    assert get_qownnote_links("<one link.md>") == ["one link.md"]
    assert get_qownnote_links("<link 1.md> <link 2.md>") == \
        ["link 1.md", "link 2.md"]
