"""URL canonicalization + SHA-1 keys.

Reference semantics: Scrapy resolves relative URLs with ``response.urljoin``
(reference: goto_eat_scrapy/spiders/tochigi.py:67, gifu.py:37) and several
spiders strip volatile query params for diff-stable output
(hyogo.py:38-41, shimane.py:42-46).  The canonical form here is the dedup /
partition key of the whole engine:

    canonicalize(base, href) -> absolute URL with lowercased scheme+host,
    default ports removed, fragment dropped, configured volatile query params
    stripped, remaining query params sorted.

``url_sha1(canonical)`` is the 20-byte key of the seen set; ``host_of`` is
the politeness / partition key.  All functions are pure and vectorized over
Python lists (the hot path calls them per Arrow batch, not per row via Ray).
"""

from __future__ import annotations

import hashlib
from urllib.parse import parse_qsl, urlencode, urljoin, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}

# Query params stripped everywhere (reference strips per-site; we keep a
# global volatile list + allow per-call extras).
VOLATILE_PARAMS = frozenset({"utm_source", "utm_medium", "utm_campaign", "sessionid", "phpsessid"})


def canonicalize(url: str, base: str | None = None, strip_params: frozenset[str] = VOLATILE_PARAMS) -> str:
    """Resolve + normalize one URL. Pure function."""
    if base:
        url = urljoin(base, url)
    scheme, netloc, path, query, _frag = urlsplit(url.strip())
    scheme = scheme.lower()
    netloc = netloc.lower()
    if "@" in netloc:  # drop userinfo
        netloc = netloc.rsplit("@", 1)[1]
    host, _, port = netloc.partition(":")
    if port and _DEFAULT_PORTS.get(scheme) == port:
        netloc = host
    if not path:
        path = "/"
    if query:
        kept = sorted((k, v) for k, v in parse_qsl(query, keep_blank_values=True) if k not in strip_params)
        query = urlencode(kept)
    return urlunsplit((scheme, netloc, path, query, ""))


def url_sha1(canonical_url: str) -> bytes:
    """20-byte SHA-1 of the canonical URL (the seen-set key)."""
    return hashlib.sha1(canonical_url.encode("utf-8")).digest()


def host_of(canonical_url: str) -> str:
    return urlsplit(canonical_url).netloc


def canonicalize_batch(urls: list[str], bases: list[str] | None = None) -> tuple[list[str], list[bytes], list[str]]:
    """Vectorized-per-batch canonicalization: (canonical, sha1, host) lists."""
    if bases is None:
        canon = [canonicalize(u) for u in urls]
    else:
        canon = [canonicalize(u, b) for u, b in zip(urls, bases)]
    sha = [hashlib.sha1(c.encode("utf-8")).digest() for c in canon]
    hosts = [urlsplit(c).netloc for c in canon]
    return canon, sha, hosts
