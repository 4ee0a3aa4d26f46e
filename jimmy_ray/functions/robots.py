"""robots.txt crawl-permission filter (RFC 9309 subset).

A crawl pipeline's first gate: parse each host's robots.txt, pick the
rule group for our user-agent, and keep only fetchable urls.  The
parser implements the published grammar (RFC 9309 + the de-facto
wildcard extension):

- line-oriented ``field: value`` records, ``#`` comments stripped,
  field names case-insensitive,
- groups = runs of ``User-agent`` lines followed by rules; group
  selection is the longest user-agent token that prefix-matches ours
  (case-insensitive), falling back to the ``*`` group,
- ``Allow``/``Disallow`` path patterns with ``*`` (any run) and ``$``
  (end anchor); empty Disallow means allow-all,
- precedence: the longest matching pattern wins (octet length, the
  RFC 9309 §2.2.2 rule); Allow wins a length tie; no match => allowed,
- unknown fields (Crawl-delay, Sitemap, ...) are ignored.

Fixtures synthesize one robots.txt per registrable domain from a fixed
template (Disallow ``/Path`` overridden by a longer ``Allow
/Path<digit>*``, plus an even-domain ``Disallow /other``), so the
allowed/blocked verdict per url has a closed-form SQL mirror built
from the same constants.  Branches the fixture writer never emits
(specific-agent groups, ``$`` anchors, tie precedence, comments,
stacked agent lines) are covered by hand-crafted byte streams in
tests/test_webtext_tier.py, per the spec-subset-codec rule.

Scale shape: rules are per-domain state — small fixed tables compiled
once per process behind ``lru_cache`` (the CLAUDE.md small-state rule;
a real deployment broadcasts the fetched robots corpus with ray.put
and indexes it by host inside ``__init__`` of an actor pool — same
lookup, bigger dict).  The filter itself is an embarrassingly parallel
stateless map; no exchange.
"""

from __future__ import annotations

import re
from functools import lru_cache
from urllib.parse import urlsplit

import pyarrow as pa

from jimmy_ray.functions.webtext import (
    N_URL_VARIANTS, registrable_domain, synth_url,
)

AGENT = "jimmybot"


def parse_robots(payload: bytes) -> list[tuple[list[str], list[tuple[bool, str]]]]:
    """robots.txt bytes -> list of (agent tokens, [(is_allow, pattern)])."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    in_agents = True
    for raw in payload.decode("utf-8", errors="replace").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agents:       # new group starts
                groups.append((agents, rules))
                agents, rules = [], []
                in_agents = True
            agents.append(value.lower())
        elif field in ("allow", "disallow"):
            if agents:
                in_agents = False
                rules.append((field == "allow", value))
        # other fields (crawl-delay, sitemap, ...) ignored per RFC
    if agents:
        groups.append((agents, rules))
    return groups


def _pattern_re(pattern: str) -> re.Pattern:
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in body)
    return re.compile(rx + ("$" if anchored else ""))


def select_group(groups, agent: str) -> list[tuple[bool, str]]:
    """Longest prefix-matching agent token wins; '*' is the fallback."""
    agent = agent.lower()
    best, best_len = None, -1
    star = None
    for agents, rules in groups:
        for tok in agents:
            if tok == "*":
                if star is None:
                    star = rules
            elif agent.startswith(tok) and len(tok) > best_len:
                best, best_len = rules, len(tok)
    if best is not None:
        return best
    return star if star is not None else []


@lru_cache(maxsize=4096)
def _compiled_rules(payload: bytes, agent: str):
    rules = select_group(parse_robots(payload), agent)
    out = []
    for is_allow, pattern in rules:
        if not pattern:            # empty Disallow: allow-all (no-op rule)
            continue
        out.append((len(pattern), is_allow, _pattern_re(pattern)))
    return out


def is_allowed(payload: bytes, url: str, agent: str = AGENT) -> bool:
    path = urlsplit(url).path or "/"
    q = urlsplit(url).query
    if q:
        path = f"{path}?{q}"
    verdict = True            # no matching rule => fetchable
    best_len = -1
    for plen, is_allow, rx in _compiled_rules(payload, agent):
        if rx.match(path):
            # longest pattern wins; Allow wins an exact length tie
            if plen > best_len or (plen == best_len and is_allow):
                verdict, best_len = is_allow, plen
    return verdict


# --- fixtures (one robots.txt per registrable domain) ------------------------

def synth_robots(k: int) -> bytes:
    """Domain example{k}.com: block /Path except ids starting with the
    domain digit; even domains also block /other."""
    extra = "Disallow: /other\n" if k % 2 == 0 else ""
    return (
        f"# robots for example{k}.com\n"
        "User-agent: badbot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /Path\n"
        f"Allow: /Path{k % 10}*\n"
        f"{extra}"
        "Crawl-delay: 2\n"
    ).encode()


def robots_filter(sf_dir: str):
    """Per (doc, variant): url + the crawl verdict from the real parse
    of the domain's synthesized robots.txt."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def fn(batch: pa.Table) -> pa.Table:
        ids, variants, urls, allowed = [], [], [], []
        for d in batch["doc_id"].to_pylist():
            for v in range(N_URL_VARIANTS):
                u = synth_url(d, v)
                k = d % 50
                ids.append(d)
                variants.append(v)
                urls.append(u)
                allowed.append(is_allowed(synth_robots(k), u))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "variant": pa.array(variants, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "allowed": pa.array(allowed, pa.bool_()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=4096)


def sql_robots_filter() -> str:
    """Closed-form verdict from the same template constants:

    - v0/v1 path is /Path{doc_id}/... -> allowed iff the first digit of
      doc_id equals the domain digit (the Allow /Path{d}* override,
      longer than Disallow /Path),
    - v2 path is /other{doc_id} -> blocked iff the domain is even
      (Disallow /other), else no rule matches.
    """
    k = "(doc_id % 50)"
    url = (
        "CASE v WHEN 0 THEN 'https://WWW.Example' || CAST(doc_id % 50 AS"
        " VARCHAR) || '.COM:443/Path' || CAST(doc_id AS VARCHAR)"
        " || '/?utm_source=feed&b=2&a=1#frag' "
        "WHEN 1 THEN 'https://www.example' || CAST(doc_id % 50 AS VARCHAR)"
        " || '.com/Path' || CAST(doc_id AS VARCHAR) || '/?a=1&b=2' "
        "ELSE 'http://example' || CAST(doc_id % 50 AS VARCHAR)"
        " || '.com:80/other' || CAST(doc_id AS VARCHAR) END"
    )
    return f"""
WITH variants AS (SELECT * FROM (VALUES (0), (1), (2)) AS t(v))
SELECT doc_id, CAST(v AS BIGINT) AS variant, {url} AS url,
  CASE WHEN v IN (0, 1)
    THEN substr(CAST(doc_id AS VARCHAR), 1, 1)
           = CAST({k} % 10 AS VARCHAR)
    ELSE {k} % 2 <> 0
  END AS allowed
FROM documents CROSS JOIN variants
"""
