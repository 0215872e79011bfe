"""Reference-semantics crawl simulator (pure Python, no Spark).

Executes the docrawl crawl discipline the way a sequential
``DocrawlClient`` program would (SURVEY.md §5.2-5.3): one URL at a
time, BFS waves, link extraction in span order, canonicalization via
the exact ``build_abs_url`` (docrawl/utils.py:5-39), skip-if-seen,
per-host politeness budget, robots gating. Its outputs are the golden
files the Spark engine must match exactly (BASELINE.json north_star:
"match the reference's crawl ordering and final URL-seen set").

The shared crawl discipline (implemented independently here and in
plans/crawl.py — any drift is a test failure):

1.  Raw documents are cleaned by the extraction-kernel rules first:
    drop kind∈(text,headline) spans whose text strips to '' (reference
    emptiness rule, docrawl_core.py:631-639); drop kind='table' spans
    with fewer than 2 <tr> (scan-time table guard,
    docrawl_core.py:604-605); drop duplicate (kind,text,media_ref)
    spans keeping the first (XPath dedup, docrawl_core.py:597-618);
    reassign offsets 0..n-1 in order.
2.  Seeds: apply the ``'http' not in url`` prepend quirk
    (docrawl_client.py:200-201); wave-0 candidates ordered by
    seed_order, deduped keeping first.
3.  Robots gate: a URL is blocked iff any non-empty line of its host's
    robots_blob is a prefix of its path; blob lines are split on
    ``\r?\n`` (CRLF robots files are the norm on real hosts — both
    implementations must agree). (Reference has NO robots handling —
    this is the north_rule addition.) Unknown host → allow.
4.  Politeness: within a wave, at most ``budget(host)`` URLs per host
    (unknown host → DEFAULT_BUDGET), chosen in priority order; the
    rest are dropped (not seen; re-discoverable later).
5.  Visit order within a wave = discovery order: seeds by seed_order;
    discovered URLs by (parent visit_rank, span offset). The global
    visit list is the concatenation of waves; visit_rank is the global
    index.
6.  A visited URL enters the seen set whether or not it resolves to a
    document (a miss is a 404 fetch: seen, no spans).
7.  Next-wave candidates: for each wave-w doc in visit order, its
    kind='link' spans in offset order; drop media_refs containing
    'javascript' or 'mailto' (reference link filter, elements.py:61-71,
    applied to the RAW media_ref before canonicalization); canonicalize
    against the parent doc_id; canonicalization errors are quarantined
    (dropped); dedup within-wave keeping first; drop already-seen.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from docrawl_spark.functions.canon import build_abs_url

DEFAULT_BUDGET = 2

EMPTYABLE_KINDS = ("text", "headline")


def _table_has_two_tr(text: str | None) -> bool:
    """Reference scan-time table guard (docrawl_core.py:604-605): skip
    tables with fewer than 2 <tr>. In the span encoding the <th> row is
    one <tr> and each ``rows`` entry is one <tr>. Unparseable payloads
    are kept (the guard fires only on a counted deficit)."""
    import json

    try:
        payload = json.loads(text) if text else None
    except Exception:
        return True
    if not isinstance(payload, dict):
        return True
    # Countable row evidence must be STRUCTURALLY valid for the field's
    # schema — this mirrors Spark's from_json exactly (verified): a
    # structural mismatch anywhere inside a field (non-array where the
    # schema expects an array, array/object where it expects a scalar)
    # nulls the WHOLE field, while scalar leaves coerce to string. So
    # th counts iff it is a list of lists of scalars; rows iff a list
    # of lists of lists of scalars.
    def _scalar(x):
        return not isinstance(x, (list, dict))

    th = payload.get("th")
    rows = payload.get("rows")
    if not (
        isinstance(th, list)
        and all(isinstance(e, list) and all(_scalar(c) for c in e) for e in th)
    ):
        th = None
    if not (
        isinstance(rows, list)
        and all(
            isinstance(r, list)
            and all(isinstance(c, list) and all(_scalar(v) for v in c) for c in r)
            for r in rows
        )
    ):
        rows = None
    if th is None and rows is None:
        return True  # no row evidence at all = unparseable, keep
    return (1 if len(th or []) > 0 else 0) + len(rows or []) >= 2


def clean_spans(raw_spans: list[dict]) -> list[dict]:
    """Extraction-kernel cleaning (rules 1/1b above), python-side."""
    out: list[dict] = []
    seen_keys: set[tuple] = set()
    for s in sorted(raw_spans, key=lambda x: x["offset"]):
        if s["kind"] in EMPTYABLE_KINDS and (s["text"] or "").strip() == "":
            continue
        if s["kind"] == "table" and not _table_has_two_tr(s["text"]):
            continue
        key = (s["kind"], s["text"], s["media_ref"])
        if key in seen_keys:
            continue
        seen_keys.add(key)
        out.append(
            {
                "kind": s["kind"],
                "text": s["text"],
                "media_ref": s["media_ref"],
                "offset": len(out),
            }
        )
    return out


def normalize_seed(url: str) -> str:
    return url if "http" in url else f"http://{url}"


def host_of(url: str) -> str:
    from urllib.parse import urlparse

    return urlparse(url).netloc.lower()


def path_of(url: str) -> str:
    from urllib.parse import urlparse

    return urlparse(url).path


@dataclass
class SimResult:
    visits: list[tuple[int, str]]                      # (wave, url) in visit order
    seen: set[str]                                     # final visited-url set
    docs_spans: dict[str, list[dict]]                  # url -> cleaned spans
    budget_dropped: list[tuple[int, str]] = field(default_factory=list)
    robots_blocked: list[tuple[int, str]] = field(default_factory=list)
    quarantined: list[tuple[str, str]] = field(default_factory=list)  # (parent, ref)


def simulate_crawl(
    documents_raw: dict[str, list[dict]],
    hosts: list[dict],
    seeds: list[dict],
    max_waves: int = 10,
) -> SimResult:
    budget_of = {h["host"]: h["budget"] for h in hosts}
    robots_of = {
        h["host"]: [
            ln for ln in re.split(r"\r?\n", h.get("robots_blob") or "") if ln
        ]
        for h in hosts
    }
    docs = {u: clean_spans(s) for u, s in documents_raw.items()}

    res = SimResult(visits=[], seen=set(), docs_spans=docs)

    # wave-0 candidates from seeds (rule 2)
    candidates: list[str] = []
    seen_in_wave: set[str] = set()
    for s in sorted(seeds, key=lambda x: x["seed_order"]):
        u = normalize_seed(s["url"])
        if u not in seen_in_wave:
            seen_in_wave.add(u)
            candidates.append(u)

    visit_rank = 0
    for wave in range(max_waves):
        if not candidates:
            break
        # robots gate (rule 3)
        allowed: list[str] = []
        for u in candidates:
            prefixes = robots_of.get(host_of(u), [])
            if any(path_of(u).startswith(p) for p in prefixes):
                res.robots_blocked.append((wave, u))
            else:
                allowed.append(u)
        # politeness budget (rule 4)
        per_host_count: dict[str, int] = {}
        selected: list[str] = []
        for u in allowed:
            h = host_of(u)
            b = budget_of.get(h, DEFAULT_BUDGET)
            c = per_host_count.get(h, 0)
            if c < b:
                per_host_count[h] = c + 1
                selected.append(u)
            else:
                res.budget_dropped.append((wave, u))
        # visit (rules 5-6)
        wave_visits: list[tuple[int, str]] = []  # (visit_rank, url)
        for u in selected:
            res.visits.append((wave, u))
            res.seen.add(u)
            wave_visits.append((visit_rank, u))
            visit_rank += 1
        # discover next wave (rule 7)
        next_candidates: list[str] = []
        seen_in_wave = set()
        for _, u in wave_visits:
            for span in docs.get(u, []):
                if span["kind"] != "link":
                    continue
                ref = span["media_ref"] or ""
                if "javascript" in ref or "mailto" in ref:
                    continue
                try:
                    cand = build_abs_url(ref, u)
                except Exception:
                    res.quarantined.append((u, ref))
                    continue
                if cand in res.seen or cand in seen_in_wave:
                    continue
                seen_in_wave.add(cand)
                next_candidates.append(cand)
        candidates = next_candidates

    return res
