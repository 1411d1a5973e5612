"""Concrete per-site extractor configurations (SURVEY.md §2.9).

The engine ships generic parser *families*; the reference's practical value
is the per-prefecture quirk tables — area lists, genre code tables, seed
URL sets, DOM paths.  Each module here ports ONE reference spider's
configuration as a ``ParserSpec``: the quirk data verbatim-equivalent
(cited), the extraction re-expressed over the repo's HTML-tree selector
engine (functions/htmlsel.py) instead of Scrapy XPath.

``reference_sites_registry()`` returns a registry with the builtin
families PLUS these concrete sites — pass it to ``CrawlEngine(...,
registry=...)`` or use ``SITE_SPECS`` directly.
"""

from __future__ import annotations

from ..registry import ParserRegistry, ParserSpec, builtin_registry
from . import (
    aichi,
    akita,
    aomori,
    ehime,
    fukui,
    fukuoka,
    fukushima,
    gifu,
    gunma,
    hiroshima,
    hokkaido,
    hyogo,
    ibaraki,
    ishikawa,
    iwate,
    kagawa,
    kagoshima,
    kochi,
    kumamoto,
    kyoto,
    liny,
    mie,
    miyazaki,
    nagano,
    okayama,
    okinawa,
    saga,
    shimane,
    shizuoka,
    shizuoka_blue,
    miyagi,
    nagasaki,
    nara,
    niigata,
    oita,
    osaka,
    saitama,
    tochigi,
    tokushima,
    tokyo,
    tokyo_gnavi,
    tottori,
    toyama,
    wakayama,
    yamagata,
    yamaguchi,
    yamanashi,
)

SITE_SPECS: tuple[ParserSpec, ...] = (
    tochigi.SPEC,
    niigata.SPEC,
    fukuoka.SPEC,
    yamagata.SPEC,
    miyagi.SPEC,
    saitama.SPEC,
    osaka.SPEC,
    gunma.SPEC,
    akita.SPEC,
    nara.SPEC,
    tokyo.SPEC,
    nagasaki.SPEC,
    hokkaido.SPEC,
    oita.SPEC,
    kyoto.SPEC,
    kagawa.SPEC,
    aichi.SPEC,
    hyogo.SPEC,
    liny.CHIBA_SPEC,
    liny.KANAGAWA_SPEC,
    liny.SHIGA_SPEC,
    kochi.SPEC,
    shimane.SPEC,
    toyama.SPEC,
    tottori.SPEC,
    aomori.SPEC,
    fukui.SPEC,
    ehime.SPEC,
    fukushima.SPEC,
    gifu.SPEC,
    hiroshima.SPEC,
    ibaraki.SPEC,
    ishikawa.SPEC,
    iwate.SPEC,
    kagoshima.SPEC,
    kumamoto.SPEC,
    mie.SPEC,
    miyazaki.SPEC,
    nagano.SPEC,
    okayama.SPEC,
    okinawa.SPEC,
    saga.SPEC,
    tokushima.SPEC,
    shizuoka.SPEC,
    shizuoka_blue.SPEC,
    wakayama.SPEC,
    yamanashi.SPEC,
    yamaguchi.SPEC,
    tokyo_gnavi.SPEC,
)


def reference_sites_registry() -> ParserRegistry:
    reg = builtin_registry()
    for spec in SITE_SPECS:
        reg.register(spec)
    return reg


# Reference main.py:29-72 VERBATIM default-exclusion table: `python main.py`
# with no target runs every spider NOT in this list.  The principled
# exclusions are tokyo_gnavi (commercial host, courtesy — main.py:30),
# tokushima (no-reproduction notice — main.py:31) and kochi (robots.txt
# Disallow — main.py:32); the rest are campaign-end retirements the
# reference accumulated over time (each dated in main.py).
DEFAULT_IGNORES: tuple[str, ...] = (
    "tokyo_gnavi",
    "tokushima",
    "kochi",
    "yamanashi",
    "kagoshima",
    "fukushima",
    "miyazaki",
    "tottori",
    "aomori",
    "wakayama",
    "niigata",
    "yamaguchi",
    "mie",
    "toyama",
    "ehime",
    "akita",
    "yamagata",
    "gunma",
    "shizuoka",
    "shizuoka_blue",
    "iwate",
    "ibaraki",
    "shiga",
    "fukui",
    "okayama",
    "saga",
    "saitama",
    "nara",
    "shimane",
    "miyagi",
    "kumamoto",
    "gifu",
    "hyogo",
    "aichi",
    "fukuoka",
    "tochigi",
    "kyoto",
    "ishikawa",
    "chiba",
    "kanagawa",
)


def select_sites(target: str | None = None) -> list[str]:
    """Reference main.py:25-74 target semantics: an explicit comma list
    wins verbatim (and may include default-ignored sites — the reference
    lets ``--target tokushima`` run it); no target -> every registered
    crawler minus :data:`DEFAULT_IGNORES`."""
    names = [s.name for s in SITE_SPECS]
    if target:
        chosen = [t.strip() for t in target.split(",") if t.strip()]
        unknown = sorted(set(chosen) - set(names))
        if unknown:
            raise KeyError(f"unknown site(s) {unknown}; known: {sorted(names)}")
        return chosen
    return [n for n in names if n not in DEFAULT_IGNORES]
