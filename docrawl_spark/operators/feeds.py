"""RSS/Atom feed ingestion — syndication feeds into the frontier.

Feeds are the OTHER per-host URL-discovery channel next to sitemaps
(operators/sitemap): blogs/news hosts publish new URLs in RSS 2.0
(<rss><channel><item><link>…) or Atom (<feed><entry><link href=…/>)
long before sitemaps regenerate, so a freshness-oriented crawler polls
feeds for candidate URLs. Parsed JVM-side with Spark 4's native
``from_xml`` (no Python in the path); a feed that doesn't match a
format's schema parses to NULL, so format dispatch is a plain
``coalesce`` of the two normalized parses — no per-row sniffing.

Scale shape: column expressions over the feed-corpus scan (feeds are a
host-dim-sized corpus, tiny next to the frontier) + explode into
entries; no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RSS_SCHEMA = T.StructType(
    [
        T.StructField(
            "channel",
            T.StructType(
                [
                    T.StructField(
                        "item",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("link", T.StringType()),
                                    T.StructField("title", T.StringType()),
                                    T.StructField("pubDate", T.StringType()),
                                    T.StructField("guid", T.StringType()),
                                ]
                            )
                        ),
                    )
                ]
            ),
        )
    ]
)

# Atom <link> carries the URL as an ATTRIBUTE (href=…); from_xml maps
# attributes with the default "_" prefix, hence the nested _href field.
ATOM_SCHEMA = T.StructType(
    [
        T.StructField(
            "entry",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "link",
                            T.StructType(
                                [T.StructField("_href", T.StringType())]
                            ),
                        ),
                        T.StructField("title", T.StringType()),
                        T.StructField("updated", T.StringType()),
                        T.StructField("id", T.StringType()),
                    ]
                )
            ),
        )
    ]
)


def parse_rss_col(xml: Column) -> Column:
    """RSS 2.0 document → array<struct<link,title,pubDate,guid>> in
    document order; NULL if the document isn't RSS-shaped."""
    return F.from_xml(xml, RSS_SCHEMA).getField("channel").getField("item")


def parse_atom_col(xml: Column) -> Column:
    """Atom document → array<struct<link:struct<_href>,title,updated,id>>
    in document order; NULL if the document isn't Atom-shaped."""
    return F.from_xml(xml, ATOM_SCHEMA).getField("entry")


def feed_entries(
    df: DataFrame, xml_col: str = "feed_xml", keep_cols: list[str] | None = None
) -> DataFrame:
    """Explode a feed corpus into one row per entry, format-normalized:
    (*keep_cols, entry_order, link, title, published, entry_id,
    feed_kind) where published is the raw pubDate/updated string (RSS
    keeps RFC-822 dates, Atom ISO-8601 — downstream freshness parsing
    is format-aware) and feed_kind ∈ {'rss','atom'}. Entries without a
    link are dropped; a document parseable as neither format yields no
    rows."""
    keep = keep_cols or []
    xml = F.col(xml_col)
    rss = F.transform(
        parse_rss_col(xml),
        lambda it: F.struct(
            F.trim(it.getField("link")).alias("link"),
            it.getField("title").alias("title"),
            it.getField("pubDate").alias("published"),
            it.getField("guid").alias("entry_id"),
            F.lit("rss").alias("feed_kind"),
        ),
    )
    atom = F.transform(
        parse_atom_col(xml),
        lambda e: F.struct(
            F.trim(e.getField("link").getField("_href")).alias("link"),
            e.getField("title").alias("title"),
            e.getField("updated").alias("published"),
            e.getField("id").alias("entry_id"),
            F.lit("atom").alias("feed_kind"),
        ),
    )
    # posexplode of a NULL array (neither format parsed) yields no rows.
    out = df.select(
        *keep, F.posexplode(F.coalesce(rss, atom)).alias("entry_order", "_e")
    ).select(
        *keep,
        "entry_order",
        F.col("_e.link").alias("link"),
        F.col("_e.title").alias("title"),
        F.col("_e.published").alias("published"),
        F.col("_e.entry_id").alias("entry_id"),
        F.col("_e.feed_kind").alias("feed_kind"),
    )
    return out.where(F.col("link").isNotNull() & (F.col("link") != ""))
