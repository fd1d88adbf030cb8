"""Crawl-stage operators (SURVEY.md S1-S5, S9, F1, F5, G8) as pure
DataFrame transforms with an injected transport.

The reference couples crawling to asyncio + httpx + a Playwright
sidecar (``crawler/utils.py``, ``crawler/playwright_server.py``). On
Spark the unit of parallelism is the partition: URL DataFrames fan
out over executors, and each ``mapInPandas`` island drives an
injectable ``transport: Callable[[str], TransportResult]`` — a real
HTTP client in production (one session per executor, connection
pooling, retry/backoff — the same techniques the reference hand-rolls
at ``crawler/download.py:40-47,111-117``), a canned fake in tests.
No network code lives in this module.

Known reference bugs NOT replicated (SURVEY §2.11): HEAD-ing the book
page instead of each mp3 URL, and the inverted empty-list validity
check at ``crawler/utils.py:363-377``.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class TransportResult:
    """What a fetch returns: status + body (+ optional resolved URLs
    for dynamic pages)."""

    status: int = 200
    body: str = ""
    urls: list[str] = field(default_factory=list)


Transport = Callable[[str], TransportResult]

# ---------------------------------------------------------------------------
# S2 — pagination probe (pure expression)
# ---------------------------------------------------------------------------

def page_count(html_col) -> "F.Column":
    """Parse "Trang 1 trong X" → X (reference
    ``crawler/utils.py:205-220``); 1 when absent."""
    n = F.regexp_extract(html_col, r"Trang\s+\d+\s+trong\s+(\d+)", 1)
    return F.when(n == "", 1).otherwise(n.cast("int"))


# ---------------------------------------------------------------------------
# S3/S5 — fetch + validate via mapInPandas
# ---------------------------------------------------------------------------

FETCH_SCHEMA = "url string, status int, body string"


def fetch_pages(
    urls: DataFrame, transport: Transport, url_col: str = "url",
    partitions: int | None = None,
) -> DataFrame:
    """S3: fetch each URL's HTML. One transport call per row, batched
    per partition (per-executor client reuse = the reference's
    connection pooling). ``partitions`` caps fan-out the way the
    reference's semaphores cap concurrency (30,
    ``constants.py:41-42``)."""
    src = urls.repartition(partitions) if partitions else urls

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = [transport(u) for u in pdf[url_col]]
            yield pd.DataFrame(
                {
                    "url": list(pdf[url_col]),
                    "status": [r.status for r in res],
                    "body": [r.body for r in res],
                }
            )

    return src.mapInPandas(_fetch, schema=FETCH_SCHEMA)


VALIDATE_SCHEMA = "url string, status_code int, valid boolean"


def validate_urls(
    urls: DataFrame, transport: Transport, url_col: str = "url"
) -> DataFrame:
    """S5: HEAD-check each URL; status < 400 ⇒ valid (reference
    ``crawler/utils.py:245-301``). Unlike the reference, validates
    the *download* URLs themselves, not the page URL (§2.11 fix)."""

    def _head(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = [transport(u) for u in pdf[url_col]]
            yield pd.DataFrame(
                {
                    "url": list(pdf[url_col]),
                    "status_code": [r.status for r in res],
                    "valid": [r.status < 400 for r in res],
                }
            )

    return urls.mapInPandas(_head, schema=VALIDATE_SCHEMA)


# ---------------------------------------------------------------------------
# S1 — category crawl: seeds → pages → book links
# ---------------------------------------------------------------------------

_HREF_RE = re.compile(r'<a[^>]+href="([^"]+)"')


def extract_hrefs(html: str, container_class: str = "poster") -> list[str]:
    """Pull hrefs out of ``div.<container_class> a`` blocks (the
    reference uses selectolax CSS ``div.poster a``,
    ``crawler/utils.py:304-392``; a scoped regex keeps this
    dependency-free)."""
    out = []
    for block in re.split(r"<div[^>]*class=\"[^\"]*" + container_class, html)[1:]:
        chunk = block.split("</div>")[0]
        out.extend(_HREF_RE.findall(chunk))
    return out


def discover_book_urls(
    spark,
    category_urls: list[str],
    transport: Transport,
    pages_per_category: int | None = None,
) -> DataFrame:
    """S1: two-wave crawl as DataFrames — (1) fetch category page 1,
    read the page count (S2), fan out page URLs; (2) fetch every page,
    extract book links. The seed list is tiny driver-side data; all
    fetching happens on executors."""
    seeds = spark.createDataFrame([(u,) for u in category_urls], ["url"])
    first = fetch_pages(seeds, transport)
    pages = first.select(
        "url", page_count(F.col("body")).alias("n_pages")
    )
    if pages_per_category is not None:
        pages = pages.withColumn(
            "n_pages", F.least(F.col("n_pages"), F.lit(pages_per_category))
        )
    page_urls = pages.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("n_pages")),
                lambda i: F.concat(F.col("url"), F.lit("?page="), i.cast("string")),
            )
        ).alias("url")
    )

    fetched = fetch_pages(page_urls, transport)

    @F.udf("array<string>")
    def _hrefs(body: str) -> list[str]:
        return extract_hrefs(body or "")

    return (
        fetched.select(F.explode(_hrefs(F.col("body"))).alias("book_url"))
        .dropDuplicates(["book_url"])  # R5: dedup across categories
    )


# ---------------------------------------------------------------------------
# S4 — dynamic scrape (browser sidecar seam)
# ---------------------------------------------------------------------------

SCRAPE_SCHEMA = "url string, audio_download_url array<string>"


def scrape_part_urls(
    pages: DataFrame, transport: Transport, url_col: str = "url"
) -> DataFrame:
    """S4: resolve per-book mp3 part URLs. The reference drives a
    Playwright server over websocket (``crawler/utils.py:395-416``);
    here the transport IS that seam — inject a browser-backed
    callable in production, a canned resolver in tests. Result column
    is a real array<string> (one URL per part, O3-ready)."""

    def _scrape(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = [transport(u) for u in pdf[url_col]]
            yield pd.DataFrame(
                {
                    "url": list(pdf[url_col]),
                    "audio_download_url": [r.urls for r in res],
                }
            )

    return pages.mapInPandas(_scrape, schema=SCRAPE_SCHEMA)


# ---------------------------------------------------------------------------
# S9 — bulk download via foreachPartition-style mapInPandas
# ---------------------------------------------------------------------------

DOWNLOAD_SCHEMA = "url string, path string, nbytes long, ok boolean, error string"


def download_files(
    urls: DataFrame,
    fetch_binary: Callable[[str, str], tuple[int, str | None]],
    dest_col: str = "dest_path",
    url_col: str = "url",
) -> DataFrame:
    """S9: streaming downloads. ``fetch_binary(url, dest) ->
    (nbytes, error)`` is injected — production wraps an HTTP client
    with chunked writes, retry + exponential backoff and cleanup-on-
    failure (the reference's ``crawler/download.py:62-117,180-187``);
    Spark's task retry (``spark.task.maxFailures``) adds a second
    safety layer the reference lacks."""

    def _dl(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for u, dest in zip(pdf[url_col], pdf[dest_col]):
                try:
                    nbytes, err = fetch_binary(u, dest)
                except Exception as e:  # noqa: BLE001 — record, don't kill task
                    nbytes, err = 0, str(e)
                rows.append(
                    {
                        "url": u,
                        "path": dest,
                        "nbytes": nbytes,
                        "ok": err is None,
                        "error": err or "",
                    }
                )
            yield pd.DataFrame(rows)

    return urls.mapInPandas(_dl, schema=DOWNLOAD_SCHEMA)
