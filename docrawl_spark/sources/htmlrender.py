"""Span documents → HTML pages: the serving side of the real-fetch
loop (tests/demos render the deterministic fixture web to real HTML,
serve it over a localhost HTTP server, then crawl it with the pooled
transport + `operators/htmlparse.html_to_spans` — proving the engine
runs end-to-end on real HTTP responses, not just synthetic joins).

The rendering is the INVERSE of the parser's section walk: each raw
span becomes one element whose parse yields the same (kind, text,
media_ref) back. Choices that make the inverse exact:

- fragment lists (table cells, bullet <li>) render each fragment in
  its own ``<b>`` (a tag OUTSIDE every PREDEFINED_TAGS vocabulary —
  ``<span>`` would double-match the ``span[normalize-space(text())]``
  text rule) so ``.//text()`` recovers them one-by-one
  (empty-string fragments are unrepresentable as HTML text nodes — a
  fixture-only robustness artifact; lxml's ``getall()`` never yields
  ``''`` either — so they drop out, and comparisons normalize through
  the kernel's cleaners, which discard them anyway);
- ``th`` entries render OUTSIDE ``<tr>`` so the payload's ``rows``
  (which model the reference's ``.//tr`` iteration result) round-trip
  verbatim;
- buttons render as ``<button href=…>`` (nonstandard attr, parsed
  fine) so they don't double-match the link section;
- context/cookies spans render as ``<section class="docrawl-…">`` —
  tags outside every PREDEFINED_TAGS vocabulary — matching the
  parser's custom-section markers.
"""

from __future__ import annotations

import json
from html import escape

__all__ = ["spans_to_html", "CONTEXT_CLASS", "COOKIES_CLASS"]

CONTEXT_CLASS = "docrawl-context"
COOKIES_CLASS = "docrawl-cookies"


def _frags(frag_list: list[str]) -> str:
    return "".join(f"<b>{escape(f)}</b>" for f in frag_list)


def _render_span(s: dict) -> str:
    kind, text, ref = s["kind"], s["text"] or "", s["media_ref"] or ""
    if kind == "input":
        return f"<textarea>{escape(text)}</textarea>"
    if kind == "table":
        p = json.loads(text)
        th = "".join(f"<th>{_frags(t)}</th>" for t in (p.get("th") or []))
        rows = "".join(
            "<tr>" + "".join(f"<td>{_frags(c)}</td>" for c in row) + "</tr>"
            for row in (p.get("rows") or [])
        )
        return f"<table>{th}{rows}</table>"
    if kind == "bullet":
        lis = "".join(f"<li>{_frags(li)}</li>" for li in json.loads(text))
        return f"<ul>{lis}</ul>"
    if kind == "text":
        return f"<p>{escape(text)}</p>"
    if kind == "headline":
        return f"<h2>{escape(text)}</h2>"
    if kind == "link":
        return f'<a href="{escape(ref, quote=True)}">{escape(text)}</a>'
    if kind == "image":
        return (
            f'<img alt="{escape(text, quote=True)}" '
            f'src="{escape(ref, quote=True)}">'
        )
    if kind == "button":
        return f'<button href="{escape(ref, quote=True)}">{escape(text)}</button>'
    if kind == "context":
        return f'<section class="{CONTEXT_CLASS}">{escape(text)}</section>'
    if kind == "cookies":
        return f'<section class="{COOKIES_CLASS}">{escape(text)}</section>'
    raise ValueError(f"unrenderable span kind: {kind!r}")


def spans_to_html(spans: list[dict], title: str = "") -> str:
    """Raw spans (fixture format: kind/text/media_ref/offset dicts) →
    one HTML page whose `html_to_spans` parse yields the same raw
    sequence back (modulo empty-string fragments, see module doc)."""
    body = "\n".join(_render_span(s) for s in sorted(spans, key=lambda s: s["offset"]))
    return (
        "<!DOCTYPE html><html><head>"
        f"<meta charset=\"utf-8\"><title>{escape(title)}</title>"
        f"</head><body>\n{body}\n</body></html>"
    )
