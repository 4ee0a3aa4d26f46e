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
