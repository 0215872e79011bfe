"""Sequential client facade — the reference's ``DocrawlClient`` command
surface (docrawl_client.py:182-375) over the batch engine, so an
existing docrawl script ports by swapping the import.

Semantics: one "browser" = one current page; every command re-expresses
its reference twin through the SAME tested batch operators, run on a
one-row frame — outputs (file bytes, tables, scanned elements) are
byte-identical to what the batch pipeline produces for that document,
so scripts migrated here scale up by switching from the facade to the
wave loop with no behavioral change.

Two navigation modes:
- corpus mode (``documents=``): ``load_website`` joins the synthetic /
  warehouse corpus by canonicalized URL — the engine's synthetic-fetch
  twin; a missing doc is a 404 page with no spans (still "loaded",
  like the reference's error page);
- transport mode (``transport=``): a REAL HTTP GET through
  `operators/transport.pooled_http_transport` (or any injected
  transport) + `operators/htmlparse.html_to_spans` — the real-fetch
  loop, one page at a time.

Dropped commands mirror PARITY.md: screenshots / scroll / send_text /
wait_until raise ``NotImplementedError`` with the documented rationale
rather than silently no-op'ing.

This facade is a migration/compat surface, NOT the scale path: each
command is a driver-side step over one page (exactly the reference's
execution model). The 10^10-URL path is `plans/crawl.run_crawl`.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docrawl_spark.functions.canon import build_abs_url
from docrawl_spark.plans.simulator import clean_spans, normalize_seed
from docrawl_spark.sources.schemas import DOCUMENTS_SCHEMA

_DROPPED = {
    "take_screenshot": "browser-only (PARITY.md O9)",
    "take_png_screenshot": "browser-only (PARITY.md O10)",
    "scroll_web_page": "pagination = link-follow in the batch model (O11)",
    "send_text": "interactive form fill; reference dispatch broken (O15)",
    "wait_until_element_is_located": "synchronization is the wave barrier (O16)",
}

# xpath last-segment tag → span kind (the classify_element_by_xpath
# vocabulary, elements.py:35-48, scalar form)
_TAG_KIND = {
    "table": "table", "ul": "bullet", "ol": "bullet",
    "p": "text", "strong": "text", "em": "text", "div": "text", "span": "text",
    "h1": "headline", "h2": "headline", "h3": "headline", "h4": "headline",
    "h5": "headline", "h6": "headline",
    "img": "image", "button": "button", "a": "link",
    "input": "input", "textarea": "input",
}


def classify_xpath(xpath: str) -> str:
    last = xpath.removesuffix("/text()").rstrip("/").replace("//", "/").split("/")[-1]
    import re

    tag = re.match(r"^([A-Za-z0-9]+)", last)
    return _TAG_KIND.get(tag.group(1).lower() if tag else "", "element")


class SparkCrawlClient:
    def __init__(
        self,
        spark: SparkSession,
        documents: DataFrame | None = None,
        transport=None,
        out_dir: str = ".",
        timeout_s: float = 20.0,
    ):
        if (documents is None) == (transport is None):
            raise ValueError("exactly one of documents= (corpus) or transport=")
        self.spark = spark
        self.documents = documents
        self.transport = transport
        self.out_dir = out_dir
        self.timeout_s = timeout_s
        self._active = False
        self.current_url: str | None = None
        self._raw_spans: list[dict] = []
        self.scanned_elements: list[dict] = []
        self.headers: dict = {}
        self.status: int | None = None

    # -- lifecycle (docrawl_client.py:182-197, 289) -------------------------
    def run_spider(self, driver: str = "Spark", in_browser: bool = False,
                   proxy: dict | None = None) -> None:
        self._active = True

    def restart_browser(self, **kw) -> None:
        self.current_url = None
        self._raw_spans = []
        self.scanned_elements = []
        self._active = True

    def close_browser(self, timeout: float = 10) -> None:
        self._active = False
        if self.transport is not None:
            from docrawl_spark.operators.transport import close_pool

            close_pool()

    def is_browser_active(self) -> bool:
        return self._active

    # -- navigation (docrawl_client.py:199-208) -----------------------------
    def load_website(self, url: str, timeout: float | None = None) -> None:
        """The seed quirk applies exactly like the reference: prepend
        ``http://`` when 'http' is not a substring (docrawl_client.py:
        200-201)."""
        if not self._active:
            raise RuntimeError("run_spider() first (browser not active)")
        url = normalize_seed(url)
        if self.documents is not None:
            row = self.documents.where(F.col("doc_id") == url).select(
                "doc_id", "spans"
            ).first()
            if row is None:
                self.status, self._raw_spans, self.headers = 404, [], {
                    "content-type": "text/plain"
                }
            else:
                self.status = 200
                self.headers = {"content-type": "text/html; charset=utf-8"}
                self._raw_spans = [
                    {"kind": s["kind"], "text": s["text"],
                     "media_ref": s["media_ref"], "offset": s["offset"]}
                    for s in row["spans"]
                ]
        else:
            from docrawl_spark.operators.htmlparse import html_to_spans

            resp = self.transport(url, timeout or self.timeout_s, 0)
            self.status = resp["status"]
            self.headers = dict(resp.get("headers") or {})
            body = resp.get("content") or b""
            html = body.decode("utf-8", errors="replace") if isinstance(
                body, (bytes, bytearray)
            ) else str(body)
            self._raw_spans = html_to_spans(html) if self.status == 200 else []
        self.current_url = url

    def get_current_url(self, filename: str | None = None,
                        timeout: float = 20) -> str:
        if filename:
            with open(os.path.join(self.out_dir, filename), "w",
                      encoding="utf-8") as f:
                f.write(self.current_url or "")
        return self.current_url or ""

    def refresh_page_source(self, timeout: float = 30) -> None:
        if self.current_url is not None:
            self.load_website(self.current_url)

    # -- current page as a one-row frame ------------------------------------
    def _page_df(self, clean: bool = True) -> DataFrame:
        spans = clean_spans(self._raw_spans) if clean else self._raw_spans
        rows = [(
            self.current_url or "",
            [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans],
        )]
        return self.spark.createDataFrame(rows, DOCUMENTS_SCHEMA)

    # -- scan (docrawl_client.py:235-265) -----------------------------------
    def scan_web_page(self, incl_tables=False, incl_bullets=False,
                      incl_texts=False, incl_headlines=False, incl_links=False,
                      incl_images=False, incl_buttons=False, incl_input=True,
                      by_xpath=None, context_xpath=None, cookies_xpath=None,
                      output_folder=None, timeout: float = 20) -> list[dict]:
        want = set()
        for flag, kind in [
            (incl_input, "input"), (incl_tables, "table"),
            (incl_bullets, "bullet"), (incl_texts, "text"),
            (incl_headlines, "headline"), (incl_links, "link"),
            (incl_images, "image"), (incl_buttons, "button"),
        ]:
            if flag:
                want.add(kind)
        if by_xpath:
            for xp in str(by_xpath).split(";"):
                if xp:
                    want.add(classify_xpath(xp))
        if context_xpath:
            want.add("context")
        if cookies_xpath:
            want.add("cookies")
        cleaned = clean_spans(self._raw_spans)
        self.scanned_elements = [s for s in cleaned if s["kind"] in want]
        return self.scanned_elements

    def get_browser_scanned_elements(self) -> list[dict]:
        return self.scanned_elements

    def get_browser_headers(self) -> dict:
        return self.headers

    # -- extraction commands (docrawl_client.py:224-356) --------------------
    def extract_page_source(self, filename: str, timeout: float = 20) -> None:
        from docrawl_spark.operators.commands import raw_pages

        fetched = self._page_df(clean=False).select(
            F.col("doc_id").alias("url"), "spans"
        )
        raw = raw_pages(fetched).first()["raw"]
        with open(os.path.join(self.out_dir, filename), "w", encoding="utf-8") as f:
            f.write(raw)

    def extract_xpath(self, xpath: str, filename: str,
                      write_in_file_mode: str = "w+", timeout: float = 20) -> None:
        from docrawl_spark.operators.artifacts import render_kind_txt
        from docrawl_spark.operators.extract import extract_kind

        kind = classify_xpath(xpath)
        row = render_kind_txt(extract_kind(self._page_df(), kind)).first()
        mode = "a" if write_in_file_mode.startswith("a") else "w"
        with open(os.path.join(self.out_dir, filename), mode,
                  encoding="utf-8") as f:
            f.write(row["txt"] if row else "None\n")

    def extract_multiple_xpath(self, xpaths: list[str],
                               filename: str = "extracted_data.xlsx",
                               timeout: float = 20) -> None:
        from docrawl_spark.operators.artifacts import render_multi_txt
        from docrawl_spark.operators.commands import extract_multiple_kinds

        kinds = [classify_xpath(x) for x in xpaths]
        # the reference takes the filename sans-.txt as the xlsx stem
        # (docrawl_core.py:941); its client default passes .xlsx
        stem = filename.split(".txt")[0].split(".xlsx")[0]
        long = extract_multiple_kinds(self._page_df(), kinds)
        row = render_multi_txt(long).first()
        with open(os.path.join(self.out_dir, stem + ".txt"), "w",
                  encoding="utf-8") as f:
            f.write(row["txt"] if row else "None")
        try:
            import openpyxl  # noqa: F401
            import pandas as pd

            per_kind = {k: [] for k in range(len(kinds))}
            for r in long.collect():
                per_kind[r["kind_idx"]].append((r["line_no"], r["line"]))
            result = [
                [line for _, line in sorted(per_kind[i])]
                for i in range(len(kinds))
            ]
            pd.DataFrame(result).to_excel(
                os.path.join(self.out_dir, stem + ".xlsx")
            )
        except ImportError:
            pass

    def extract_table_xpath(self, xpath_row: str, xpath_col: str,
                            first_row_header: bool = False,
                            filename: str = "extracted_data.xlsx",
                            timeout: float = 20):
        from docrawl_spark.operators.artifacts import table_frames
        from docrawl_spark.operators.extract import extract_tables, tables_to_json

        cells = extract_tables(
            self._page_df(), first_row_header=first_row_header,
            drop_first_row=False, strip_cells=True,
        )
        try:
            import openpyxl  # noqa: F401

            stem = filename.split(".xlsx")[0].split(".pickle")[0]
            for _, table_id, df in table_frames(cells):
                df.to_excel(os.path.join(self.out_dir, f"{stem}_{table_id}.xlsx"))
        except ImportError:
            pass
        # the reference also stashes the frame in its KV store
        # (docrawl_core.py:1009); here: the long form + JSON view
        return tables_to_json(cells)

    def download_images(self, image_xpath: str, filename: str,
                        timeout: float = 20) -> list[str]:
        """O17: discover media refs from image spans; with a real
        transport, also fetch the bytes (extension from URL sans
        ?query, docrawl_core.py:809,829)."""
        from docrawl_spark.datapipe.multimodal import media_from_spans

        refs = [
            r["media_ref"]
            for r in media_from_spans(self._page_df()).collect()
        ]
        saved = []
        for i, ref in enumerate(refs):
            try:
                target = build_abs_url(ref, self.current_url or "")
            except ValueError:
                continue
            ext = os.path.splitext(target.split("?")[0])[1] or ".bin"
            name = filename if len(refs) == 1 else f"{filename}_{i}"
            path = os.path.join(self.out_dir, f"{name}{ext}")
            if self.transport is not None:
                resp = self.transport(target, self.timeout_s, 0)
                if resp["status"] == 200:
                    with open(path, "wb") as f:
                        f.write(resp["content"] or b"")
                    saved.append(path)
            else:
                saved.append(target)  # corpus mode: the queue, no bytes
        return saved

    # -- clicks (docrawl_client.py:358-370) ---------------------------------
    def click_xpath(self, xpath: str, timeout: float = 20) -> None:
        self._click(kind=classify_xpath(xpath))

    def click_name(self, text: str, timeout: float = 20) -> None:
        """Documented By.LINK_TEXT intent (the reference's own dispatch
        bug is not reproduced, SURVEY.md §7)."""
        self._click(kind="link", text_equals=text)

    def _click(self, kind: str, text_equals: str | None = None) -> None:
        for s in clean_spans(self._raw_spans):
            if s["kind"] != kind or not s["media_ref"]:
                continue
            if text_equals is not None and s["text"] != text_equals:
                continue
            try:
                target = build_abs_url(s["media_ref"], self.current_url or "")
            except ValueError:
                continue
            self.load_website(target)
            return
        raise LookupError(f"no clickable {kind} span matched")

    # -- dropped commands ----------------------------------------------------
    def __getattr__(self, name: str):
        if name in _DROPPED:
            def _raises(*a, **k):
                raise NotImplementedError(f"{name}: {_DROPPED[name]}")

            return _raises
        raise AttributeError(name)

