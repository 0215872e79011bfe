"""URL canonicalization — the correctness keystone.

Reproduces the reference's ``build_abs_url`` exactly, INCLUDING its
deviations from RFC 3986 (reference: docrawl/utils.py:5-39, spec'd by
docrawl/tests/test_utils.py:6-29; see SURVEY.md §2.3):

1. Absolute input (netloc != '') → returned via ``urlparse(...).geturl()``
   verbatim, regardless of the base.
2. Relative input with no base → error (ValueError in the reference;
   here a null url + error string, since vectorized UDFs can't raise
   per-row).
3. Domain-relative (``/path``) → ``scheme://netloc + path`` — the
   scraped url's query/fragment/params are DROPPED (only ``.path``).
4. Path-relative → segment walk over base-path segments where the base
   path's LAST segment is treated as a directory ('' and '.' skipped,
   '..' pops with error on underflow). RFC 3986 would drop the last
   base segment first; the reference does not. We match the reference.

Plus the client-side quirk (docrawl_client.py:200-201): seeds get
``http://`` prepended only when the substring 'http' appears NOWHERE
in the url.

Everything Spark-facing is vectorized: a fast pandas/regex path covers
absolute + domain-relative urls (the overwhelming majority at crawl
scale); only path-relative urls (rare) fall back to the exact scalar
walk, still inside one Arrow batch.
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# --------------------------------------------------------------------------
# Exact scalar semantics (mirrors docrawl/utils.py:5-39; used by the
# reference-semantics simulator and as the slow-path inside the UDF).
# --------------------------------------------------------------------------


def build_abs_url(scraped_url: str, domain_url: str | None = None) -> str:
    """Absolute-ize ``scraped_url`` against ``domain_url``, reference
    semantics (docrawl/utils.py:5-39). Raises ValueError exactly where
    the reference does."""
    parsed = urlparse(scraped_url)
    if parsed.netloc != "":
        return parsed.geturl()
    if domain_url is None:
        raise ValueError(
            "The domain url must be provided if the scraped url is a relative url."
        )
    base = urlparse(domain_url)
    if parsed.path.startswith("/"):
        return f"{base.scheme}://{base.netloc}{parsed.path}"
    segments: list[str] = base.path.split("/")[1:]
    for seg in parsed.path.split("/"):
        if seg == "" or seg == ".":
            continue
        if seg == "..":
            if not segments:
                raise ValueError("Relative link points to a path that does not exist.")
            segments.pop()
        else:
            segments.append(seg)
    return f"{base.scheme}://{base.netloc}/{'/'.join(segments)}"


# --------------------------------------------------------------------------
# Vectorized batch canonicalization.
# --------------------------------------------------------------------------

# A url we can return verbatim on the fast path: lowercase scheme +
# '://' + non-empty netloc, and no ';' in the first path segment area
# (urlparse's params handling only bites on ';'; geturl() is identity
# for these).
_ABS_FAST = re.compile(r"^[a-z][a-z0-9+.\-]*://[^/?#]")
# Extract scheme://netloc from the base url.
_BASE_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://([^/?#]*)")
# Same plus the path (for the path-relative fast path).
_BASE_FULL_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://([^/?#]*)([^?#;]*)$")
# Plain path-relative ref: non-empty '/'-separated segments, no
# scheme/query/fragment/';', no leading/trailing '/', no '//'.
_REL_FAST = re.compile(r"^[^/?#;:\s]+(/[^/?#;:\s]+)*$")
# A '.' or '..' segment anywhere.
_DOT_SEG = r"(?:^|/)\.\.?(?:/|$)"

_ERR_NO_BASE = "relative url without base"
_ERR_UNDERFLOW = "relative path underflow"


def _canon_scalar(scraped: str, base: str | None) -> tuple[str | None, str | None]:
    try:
        return build_abs_url(scraped, base), None
    except ValueError as e:
        msg = str(e)
        if "domain url must be provided" in msg:
            return None, _ERR_NO_BASE
        return None, _ERR_UNDERFLOW
    except Exception as e:  # malformed beyond parse — quarantine, don't kill the wave
        return None, f"parse error: {e}"


def canonicalize_batch(scraped: pd.Series, base: pd.Series) -> pd.DataFrame:
    """Vectorized canonicalization of a batch.

    Returns a DataFrame with columns ``url`` (canonical absolute url or
    None) and ``error`` (None or reason). Fast vectorized paths:

    - absolute urls (regex match) → verbatim;
    - domain-relative ('/...') with a clean base → string concat;

    everything else → exact scalar walk. At crawl scale the fast paths
    cover ~all rows, so the Python fallback touches a sliver.
    """
    scraped = scraped.astype("object")
    base = base.astype("object")
    n = len(scraped)
    out_url = np.full(n, None, dtype=object)
    out_err = np.full(n, None, dtype=object)

    s = scraped.fillna("")
    is_null = scraped.isna().to_numpy()

    # Fast path 1: absolute, verbatim-safe. geturl() is the identity for
    # lowercase-scheme '://' urls without ';' params ambiguity; keep ';'
    # holders on the slow path to stay bit-exact with urlparse.
    abs_mask = (
        s.str.match(_ABS_FAST).to_numpy() & ~s.str.contains(";", regex=False).to_numpy()
    )
    out_url[abs_mask & ~is_null] = s.to_numpy()[abs_mask & ~is_null]

    # Fast path 2: domain-relative with a parseable base. The reference
    # keeps only urlparse(scraped).path → cut at first '?' or '#'; ';'
    # in the last segment would land in .params, so push those to slow.
    # NB: '//host/path' is protocol-relative — urlparse puts 'host' in
    # netloc, so the reference returns it verbatim; keep it off this
    # fast path (slow path reproduces that).
    dom_mask = (
        s.str.startswith("/").to_numpy()
        & ~s.str.startswith("//").to_numpy()
        & ~s.str.contains(";", regex=False).to_numpy()
        & ~abs_mask
        & ~is_null
    )
    if dom_mask.any():
        b = base.fillna("")
        bparts = b.str.extract(_BASE_RE)  # 0=scheme 1=netloc
        base_ok = bparts[0].notna().to_numpy()
        path_only = s.str.split(r"[?#]", n=1, regex=True).str[0]
        hit = dom_mask & base_ok
        out_url[hit] = (
            bparts[0].str.lower() + "://" + bparts[1] + path_only
        ).to_numpy()[hit]
        no_base = dom_mask & ~base_ok & base.isna().to_numpy()
        out_err[no_base] = _ERR_NO_BASE
        out_url[no_base] = None
        # base present but unparseable by the regex → slow path
        dom_mask = hit | no_base

    # Fast path 3: plain path-relative — no leading '/', no '.'/'..'
    # segments, no empty segments ('//' or trailing '/'), no query/
    # fragment/';'. Reference semantics append the ref's segments to ALL
    # of the base path's segments (the non-RFC "last segment is a
    # directory" rule), which for clean refs is pure concatenation.
    rel_mask = (
        s.str.match(_REL_FAST).to_numpy()
        & ~s.str.contains(_DOT_SEG, regex=True).to_numpy()
        & ~abs_mask
        & ~dom_mask
        & ~is_null
    )
    if rel_mask.any():
        b = base.fillna("")
        bparts = b.str.extract(_BASE_FULL_RE)  # 0=scheme 1=netloc 2=path
        base_ok = (
            bparts[0].notna()
            & ~bparts[2].fillna("").str.contains("//", regex=False)
        ).to_numpy()
        hit = rel_mask & base_ok
        if hit.any():
            # base path '' or '/a/b' → tail '' or 'a/b'; join with ref
            tail = bparts[2].fillna("").str.replace(r"^/", "", regex=True)
            joined = np.where(
                tail.to_numpy() == "", s.to_numpy(), (tail + "/" + s).to_numpy()
            )
            out_url[hit] = (
                bparts[0].str.lower().to_numpy()[hit]
                + "://"
                + bparts[1].to_numpy()[hit]
                + "/"
                + joined[hit]
            )
        no_base = rel_mask & base.isna().to_numpy()
        out_err[no_base] = _ERR_NO_BASE
        rel_mask = hit | no_base  # unparseable/odd base → slow path

    slow = ~abs_mask & ~dom_mask & ~rel_mask & ~is_null
    if slow.any():
        sv = scraped.to_numpy()
        bv = base.to_numpy()
        idx = np.flatnonzero(slow)
        for i in idx:
            u, e = _canon_scalar(sv[i], None if pd.isna(bv[i]) else bv[i])
            out_url[i] = u
            out_err[i] = e

    out_err[is_null] = "null url"
    return pd.DataFrame({"url": out_url, "error": out_err})


_CANON_STRUCT = T.StructType(
    [T.StructField("url", T.StringType()), T.StructField("error", T.StringType())]
)


@pandas_udf(_CANON_STRUCT)
def abs_url_udf(scraped: pd.Series, base: pd.Series) -> pd.DataFrame:
    """Arrow-batched canonicalization UDF: (scraped, base) → struct."""
    return canonicalize_batch(scraped, base)


def with_abs_url(
    df: DataFrame,
    scraped_col: str,
    base_col: str,
    url_out: str = "url",
    err_out: str = "canon_error",
) -> DataFrame:
    """Append canonical url + error columns in one UDF evaluation."""
    tmp = "_canon_struct"
    return (
        df.withColumn(tmp, abs_url_udf(F.col(scraped_col), F.col(base_col)))
        .withColumn(url_out, F.col(f"{tmp}.url"))
        .withColumn(err_out, F.col(f"{tmp}.error"))
        .drop(tmp)
    )


# --------------------------------------------------------------------------
# Pure-Column helpers (JVM-side, whole-stage-codegen'd).
# --------------------------------------------------------------------------


def normalize_seed_url_col(url: Column | str) -> Column:
    """The reference's seed quirk (docrawl_client.py:200-201): prepend
    'http://' iff the SUBSTRING 'http' occurs nowhere in the url."""
    c = F.col(url) if isinstance(url, str) else url
    return F.when(c.contains("http"), c).otherwise(F.concat(F.lit("http://"), c))


def host_of_col(url: Column | str) -> Column:
    """netloc, lowercased — mirrors ``urlparse(u).netloc.lower()``.

    Kept JVM-side via regexp: authority = chars after '://' up to the
    first of '/', '?', '#'."""
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)", 1))


def path_of_col(url: Column | str) -> Column:
    """Path component (leading '/'-inclusive), '' if none. JVM-side."""
    c = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)", 1)


def url_hash_col(url: Column | str) -> Column:
    """Canonical 64-bit url hash for the seen-set / frontier keys.

    ``xxhash64`` is built-in, deterministic, partition-stable, and
    cheap (JVM, codegen) — the right key for a 10^10-row seen set."""
    c = F.col(url) if isinstance(url, str) else url
    return F.xxhash64(c)
