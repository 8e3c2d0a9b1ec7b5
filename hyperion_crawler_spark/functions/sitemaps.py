"""Sitemap discovery — the third URL source next to link expansion
(plans/round.py) and operator seed drops (streaming/seed_ingest.py).

Two pure-Catalyst extractors (regexp over text payloads — both mirror
1:1 into the DuckDB oracle) plus a seed-frame adapter that feeds the
extracted URLs straight into the streaming/bootstrap ingest path.

RFC 9309 §2.4 allows ``Sitemap:`` lines anywhere in robots.txt; loc
extraction follows sitemaps.org §XML (whitespace inside ``<loc>`` is
trimmed). A real crawl fetches the sitemap documents themselves
through the normal fetch path; these kernels only parse payloads
already in hand — no network, same as the rest of the engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sitemap_urls_from_robots(txt: Column) -> Column:
    """Array of sitemap URLs declared in a robots.txt body
    (``Sitemap: <url>`` lines, case-insensitive, one per line).
    Horizontal whitespace only after the colon: a newline-crossing
    whitespace class would make a bare ``Sitemap:`` line capture the
    first token of the NEXT line as a URL (r5 review); an empty-value
    record is simply ignored."""
    return F.regexp_extract_all(txt, F.lit(r"(?mi)^sitemap:[ \t]*(\S+)"), 1)


def urls_from_sitemap_xml(xml: Column) -> Column:
    """Array of ``<loc>`` URLs from a sitemap XML body (whitespace
    around the URL trimmed, per sitemaps.org; CDATA-wrapped values —
    a common real-world form — unwrap transparently). Mirrored 1:1 by
    the q44 oracle SQL."""
    return F.regexp_extract_all(
        xml,
        F.lit(r"<loc>\s*(?:<!\[CDATA\[)?\s*([^<\s][^<]*?)\s*(?:\]\]>)?\s*</loc>"),
        1)


def seeds_from_sitemap_xml(df: DataFrame, xml_col: str,
                           priority: float = 0.5) -> DataFrame:
    """Explode sitemap payloads into seed rows ``(url, image_id,
    priority)`` — the exact schema ``streaming/seed_ingest.py`` and
    ``init_frontier`` consume. ``image_id`` is derived as the URL's
    last path segment (the synthetic-corpus convention used across the
    fixtures; a production mapping would join a manifest instead)."""
    url = F.explode(urls_from_sitemap_xml(F.col(xml_col))).alias("url")
    out = df.select(url)
    # strip any fragment first, accept a trailing slash, and DROP rows
    # whose URL has no path segment at all (bare host): an empty
    # image_id joins nothing in the corpus but would still be marked
    # seen forever, permanently poisoning the URL (r5 review)
    base = F.regexp_replace(F.col("url"), r"#.*$", "")
    path = F.regexp_extract(base, r"://[^/?#]+([^?#]*)", 1)
    iid = F.regexp_extract(path, r"/([^/]+)/?$", 1)
    return (out.select("url", iid.alias("image_id"),
                       F.lit(priority).alias("priority"))
            .filter(F.col("image_id") != ""))
