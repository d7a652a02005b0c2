"""URL structure operators for the web-extraction tier: link parsing
and domain-level aggregation over the crawl link graph.

All JVM-side column expressions (``parse_url`` + array ops) — no
Python in the path, so parsing a 10^12-link graph is a pure map stage.
The registrable-domain heuristic is a deliberately small embedded rule
(last two host labels, or three when the second-to-last label is a
common second-level registry like ``co``/``ac``): the full public
suffix list is an external artifact; the heuristic is deterministic,
documented, and mirrored exactly by the SQL oracle.
"""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Second-level labels that commonly sit under a ccTLD (bbc.co.uk →
#: registrable domain bbc.co.uk, not co.uk).
SECOND_LEVEL_REGISTRIES = ("co", "com", "ac", "gov", "org", "net", "edu")


def host_col(href: Column) -> Column:
    return F.parse_url(href, F.lit("HOST"))


def registrable_domain_col(host: Column) -> Column:
    """Heuristic eTLD+1: last 2 labels, last 3 when the 2nd-to-last is
    a known second-level registry and there are >= 3 labels. Hosts with
    fewer than 2 labels (e.g. ``localhost``) pass through unchanged."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    second = F.element_at(labels, n - 1)  # 2nd-to-last (1-based from end)
    take3 = (n >= 3) & second.isin(*SECOND_LEVEL_REGISTRIES)
    last2 = F.array_join(F.slice(labels, n - 1, 2), ".")
    last3 = F.array_join(F.slice(labels, n - 2, 3), ".")
    return F.when(take3, last3).otherwise(F.when(n >= 2, last2).otherwise(host))


def parse_links(links: DataFrame) -> DataFrame:
    """(doc_id, offset, href, ...) -> + (scheme, host, domain, path).
    Narrow projection; inherits input partitioning."""
    host = host_col(F.col("href"))
    return links.select(
        "doc_id",
        "offset",
        "href",
        F.parse_url(F.col("href"), F.lit("PROTOCOL")).alias("scheme"),
        host.alias("host"),
        registrable_domain_col(host).alias("domain"),
        F.parse_url(F.col("href"), F.lit("PATH")).alias("path"),
    )


def domain_inlinks(parsed: DataFrame) -> DataFrame:
    """Link-graph rollup: per registrable domain, total in-links,
    distinct linking documents, distinct hosts. One shuffle keyed by
    domain; partial aggregation is map-side, so a hot domain (every
    page links the same CDN) costs bandwidth proportional to the
    partial-aggregate count, not the raw link count."""
    return parsed.groupBy("domain").agg(
        F.count("*").alias("n_links"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.countDistinct("host").alias("n_hosts"),
    )
