"""URL-structure bitext candidate mining (STRAND, Resnik & Smith
2003): multilingual sites encode language in the URL (`/en/` vs
`/fr/` path segments), so documents whose URLs differ ONLY by the
language marker are translation-pair candidates — the classic
zero-content first stage of parallel-corpus mining, complementing the
embedding-space margin criterion (`datapipe/similarity.
margin_mine_pairs`) which ranks candidates by content.

Spec (exact, cross-engine):

- the URL's language is the FIRST ``/<code>/`` path-segment match for
  a code in the configured set (regexp_extract, first match in both
  engines); URLs with no marker are dropped;
- the template key replaces EVERY non-overlapping ``/<code>/``
  occurrence with ``/{L}/`` (Spark regexp_replace is global; the
  DuckDB mirror needs the explicit ``'g'`` flag — CLAUDE.md trap);
  patterns are lookahead-free and lazy-free so Java regex and RE2
  agree;
- per (template, lang) the MIN url is the representative (dedup —
  a site may serve one logical page at several marker-bearing URLs);
- candidates pair representatives within a template across languages,
  ``lang_a < lang_b``.

Scale shape: one groupBy(template, lang) HashAggregate + one
equi-join on template; per-template fan-out is bounded by
C(|langs|, 2) — never a corpus-level self-join. All JVM regex, no
Python.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _marker_pattern(langs: list[str]) -> str:
    for code in langs:
        if not code.isalpha():
            raise ValueError(f"language code must be alphabetic: {code!r}")
    return "/(" + "|".join(langs) + ")/"


def strand_url_pairs(
    urls: DataFrame,
    langs: list[str],
    url_col: str = "url",
) -> DataFrame:
    """Bitext candidate pairs from language-marker URL templates.

    Input: any frame with ``url_col``. Output: one row per
    cross-language representative pair —
    ``(template, lang_a, url_a, lang_b, url_b)``.
    """
    pat = _marker_pattern(langs)
    marked = (
        urls.select(
            F.col(url_col).alias("url"),
            F.regexp_extract(url_col, pat, 1).alias("lang"),
            F.regexp_replace(url_col, pat, "/{L}/").alias("template"),
        )
        .where(F.col("lang") != "")
    )
    reps = marked.groupBy("template", "lang").agg(F.min("url").alias("url"))
    a = reps.select(
        "template", F.col("lang").alias("lang_a"), F.col("url").alias("url_a")
    )
    b = reps.select(
        "template", F.col("lang").alias("lang_b"), F.col("url").alias("url_b")
    )
    return a.join(b, "template").where(F.col("lang_a") < F.col("lang_b"))
