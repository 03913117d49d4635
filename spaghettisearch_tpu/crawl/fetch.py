"""HTTP fetching for the crawler.

Async fetcher with the reference's client behavior (reference:
cmd/crawl/start_crawl.go:34-44, crawler/crawler.go:119-126): 15 s timeout,
TLS verification disabled, Accept/Accept-Language headers, Last-Modified and
Content-Length capture. The fetcher is injectable so crawls are testable
offline against fixture corpora (SURVEY §4).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone
from email.utils import parsedate_to_datetime

from ..config import CRAWL_TIMEOUT_S

HEADERS = {
    "Accept": "text/html, application/xhtml+xml, application/xml;q=0.9",
    "Accept-Language": "en",
}


@dataclass
class FetchResult:
    url: str
    body: bytes
    last_modified: datetime
    content_length: int | None  # from header; None when absent


def parse_last_modified(value: str | None) -> datetime:
    """Header value -> aware UTC datetime; absent/invalid -> now (reference:
    crawler/crawler.go:136-141)."""
    if value:
        try:
            dt = parsedate_to_datetime(value)
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=timezone.utc)
            return dt.astimezone(timezone.utc)
        except (TypeError, ValueError):
            pass
    return datetime.now(timezone.utc)


class AiohttpFetcher:
    """Production fetcher over a shared aiohttp session."""

    def __init__(self, timeout_s: float = CRAWL_TIMEOUT_S) -> None:
        self._timeout_s = timeout_s
        self._session = None

    async def __aenter__(self) -> "AiohttpFetcher":
        import aiohttp

        self._session = aiohttp.ClientSession(
            timeout=aiohttp.ClientTimeout(total=self._timeout_s),
            connector=aiohttp.TCPConnector(ssl=False, limit=0),
            headers=HEADERS,
        )
        return self

    async def __aexit__(self, *exc) -> None:
        await self._session.close()

    async def __call__(self, url: str) -> FetchResult:
        async with self._session.get(url) as resp:
            # deliberate fix vs the reference: treat HTTP errors as fetch
            # failures (budget re-credit) instead of indexing 404/5xx bodies
            # as documents (crawler.go:119-126 never checks StatusCode)
            resp.raise_for_status()
            body = await resp.read()
            cl = resp.headers.get("Content-Length")
            return FetchResult(
                url=url,
                body=body,
                last_modified=parse_last_modified(resp.headers.get("Last-Modified")),
                content_length=int(cl) if cl else None,
            )


class DictFetcher:
    """Offline fetcher over an in-memory {url: html} site (for tests)."""

    def __init__(self, pages: dict[str, bytes], last_modified: datetime | None = None):
        self.pages = pages
        self.last_modified = last_modified or datetime.now(timezone.utc)
        self.fetched: list[str] = []

    async def __call__(self, url: str) -> FetchResult:
        if url not in self.pages:
            raise KeyError(f"404: {url}")
        self.fetched.append(url)
        body = self.pages[url]
        return FetchResult(
            url=url,
            body=body,
            last_modified=self.last_modified,
            content_length=len(body),
        )
