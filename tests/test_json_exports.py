"""S8 JSON-export reader semantics not covered by the SQL oracles."""

import json

from jimmy_ray.sources import json_exports as jx


def test_dayone_duplicate_titles_get_numeric_suffix():
    """day_one.py:93-111: same-day entries get -0001, -0002, ... suffixes."""
    entry = jx.synth_dayone_entry(0, "x")
    seen: set[str] = set()
    t0 = jx.parse_dayone_entry(entry, seen)["title"]
    t1 = jx.parse_dayone_entry(entry, seen)["title"]
    t2 = jx.parse_dayone_entry(entry, seen)["title"]
    assert t0 == "2023-11-14"
    assert t1 == "2023-11-14-0001"
    assert t2 == "2023-11-14-0002"


def test_keep_untitled_and_missing_body():
    row = jx.parse_keep_note(json.dumps({"title": "  "}))
    assert row["body"] == "" and row["notebook"] == "root"
    assert row["created_ms"] is None


def test_telegram_service_messages_skipped():
    chat = json.dumps({
        "name": "c", "id": 1,
        "messages": [
            {"type": "service", "action": "create_group", "date_unixtime": "100"},
            {"type": "message", "date_unixtime": "200", "from": "u", "text": "hi"},
        ],
    })
    row = jx.parse_telegram_chat(chat)
    assert row["n_messages"] == 1
    assert row["updated_ms"] == 200_000
    assert row["body"].endswith("**u**: hi")


def test_telegram_file_attachment_link():
    chat = json.dumps({
        "name": "c", "id": 1,
        "messages": [{
            "type": "message", "date_unixtime": "300", "from": "u",
            "text": "pic", "file": "files/a.jpg", "file_name": "a.jpg",
        }],
    })
    row = jx.parse_telegram_chat(chat)
    assert row["body"].endswith("**u**: pic\n![a.jpg](tg/files/a.jpg)")


def test_notion_mixed_zip_is_error():
    import pytest

    from jimmy_ray.sources import containers as ct

    mixed = ct._zip_bytes([("a.zip", ct._zip_bytes([("x.md", b"x")])),
                           ("b.md", b"loose")])
    with pytest.raises(ValueError):
        ct.explode_notion_zip(mixed)


def test_notion_flat_and_nested_converge():
    from jimmy_ray.sources import containers as ct

    flat = ct.explode_notion_zip(ct.synth_notion_zip(3, "t"))   # nested
    nested = ct.explode_notion_zip(ct.synth_notion_zip(6, "t"))  # flat (6%3==0)
    assert [m for m, _ in flat] == ["page 3-0.md", "page 3-1.md"]
    assert [m for m, _ in nested] == ["page 6-0.md", "page 6-1.md"]
    # __MACOSX dropped in both container shapes (notion.py:44-45)
    assert all("__MACOSX" not in m for m, _ in flat + nested)


def test_facebook_skip_rules_and_mojibake():
    from jimmy_ray.sources import containers as ct

    rows = ct.parse_facebook_posts(ct.synth_facebook_posts(5, "grüße 你好"))
    assert len(rows) == 1  # titled + empty posts skipped (facebook.py:95-108)
    assert rows[0]["body"] == "grüße 你好"  # mojibake inverted
    assert rows[0]["updated_ms"] == rows[0]["created_ms"] + 60_000


def test_colornote_skip_rules_and_wrong_password():
    import pytest

    from jimmy_ray.sources import colornote as cn

    # doc 5: settings + empty chunks present, both skipped
    rows = cn.parse_backup(cn.synth_backup(5, "body"))
    assert len(rows) == 1 and rows[0]["title"] == "Doc 5"
    assert rows[0]["body"] == "- [x] done 5\n- [ ] body"
    # wrong password -> PKCS7 unpad fails (colornote.py:45-54 error path)
    with pytest.raises(ValueError):
        cn.parse_backup(cn.synth_backup(5, "body"), password="wrong")


def test_colornote_routing_precedence():
    from jimmy_ray.sources import colornote as cn

    # doc 20: calendar (folder 16) AND archive (space 16) -> space wins
    rows = cn.parse_backup(cn.synth_backup(20, "x"))
    assert rows[0]["notebook"] == "archive"
    # doc 12: calendar only; title becomes the reminder date
    rows = cn.parse_backup(cn.synth_backup(12, "x"))
    assert rows[0]["notebook"] == "calendar"
    assert rows[0]["title"].count("-") == 2


def test_chunking_edge_cases_match_sql_semantics():
    """Sliding-window chunker boundaries: empty doc -> no chunks; doc
    shorter than a window -> one partial; exact multiples don't emit an
    empty trailing window."""
    import re

    from jimmy_ray.functions.mixtures import CHUNK_S, CHUNK_W

    def chunks(n):
        toks = [f"w{j}" for j in range(n)]
        out = []
        i = start = 0
        while start < len(toks):
            out.append(toks[start:start + CHUNK_W])
            if start + CHUNK_W >= len(toks):
                break
            i += 1
            start += CHUNK_S
        return out

    assert chunks(0) == []
    assert len(chunks(5)) == 1 and len(chunks(5)[0]) == 5
    assert len(chunks(CHUNK_W)) == 1            # exact window: one chunk
    assert len(chunks(CHUNK_W + 1)) == 2        # one token spill
    # overlap: consecutive chunks share CHUNK_W - CHUNK_S tokens
    c = chunks(40)
    assert c[0][-(CHUNK_W - CHUNK_S):] == c[1][:CHUNK_W - CHUNK_S]
