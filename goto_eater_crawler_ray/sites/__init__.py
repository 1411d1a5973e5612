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
