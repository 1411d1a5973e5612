"""ParserSpec registry — the engine's user-extension surface (SURVEY.md §2.8).

The reference's plugin model is "subclass AbstractSpider, declare name /
allowed_domains / start_urls, implement parse()" (reference:
goto_eat_scrapy/spiders/abstract.py:8-37; family bases like
abstract_liny.py:36-66 parametrize by base_url + mesh geojson only).

Here, adding a site = registering one ``ParserSpec`` and passing the
registry to ``CrawlEngine(..., registry=reg)`` — the engine's parse
dispatch then goes through ``registry.parse`` (politeness budgets remain
the authority of the per-host politeness table). Everything else —
frontier, seen set, scheduling, normalize, writers, resume — is shared
engine. The 49 reference crawlers collapse to ~7 parser
*families* × per-site extractor configuration (SURVEY.md §7.0), which is
exactly how the built-in specs below are organized.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from .stages.parse import PARSERS, ParseResult, family_of


@dataclass(frozen=True)
class ParserSpec:
    """One crawl source: seeds + parser callbacks + politeness overrides."""

    name: str  # prefecture / source name (e.g. 'tochigi', 'paginated3')
    family: str  # parser family key (dispatch namespace)
    allowed_domains: tuple[str, ...] = ()
    seeds: Callable[[], list[dict]] | None = None  # -> frontier seed rows
    callbacks: dict[str, Callable] = field(default_factory=dict)  # callback name -> parse fn
    crawl_delay_s: float | None = None  # politeness override (reference custom_settings)
    is_mega_host: bool = False  # salted-partition skew treatment


class ParserRegistry:
    def __init__(self):
        self._specs: dict[str, ParserSpec] = {}
        self._own_families: set[str] = set()

    def register(self, spec: ParserSpec) -> ParserSpec:
        if spec.name in self._specs:
            raise ValueError(f"duplicate parser spec: {spec.name}")
        for cb_name, fn in spec.callbacks.items():
            key = (spec.family, cb_name)
            if key in PARSERS and PARSERS[key] is not fn and spec.family not in self._own_families:
                raise ValueError(f"callback {key} would shadow a built-in parser; pick a distinct family name")
        self._specs[spec.name] = spec
        self._own_families.add(spec.family)
        # callbacks are INSTANCE-local: dispatch goes through self.parse();
        # the module-global PARSERS is never mutated (a registration must
        # not change behavior of other registries or concurrent engines)
        return spec

    def get(self, name: str) -> ParserSpec | None:
        return self._specs.get(name) or self._specs.get(family_of(name))

    def names(self) -> list[str]:
        return sorted(self._specs)

    def parse(self, prefecture: str, callback: str, url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
        spec = self.get(prefecture)
        fn = (spec.callbacks.get(callback) if spec else None) or PARSERS.get((family_of(prefecture), callback))
        if fn is None:
            return ParseResult()
        return fn(url, body, meta, depth)


def builtin_registry() -> ParserRegistry:
    """The built-in family specs (one per reference family, SURVEY.md §2.9)."""
    from .stages import parse as P

    reg = ParserRegistry()
    fam_specs = [
        # (family, callbacks, delay, mega) — delays mirror reference custom_settings values
        ("paginated", {"parse": P.parse_paginated}, 3.0, False),
        ("pagesynth", {"parse": P.parse_pagesynth}, 1.0, False),
        ("listdetail", {"parse": P.parse_listdetail, "detail": P.parse_listdetail_detail}, 1.2, False),
        ("areafanout", {"parse": P.parse_areafanout}, 3.0, False),
        ("mesh", {"parse": P.parse_mesh}, 1.5, True),
        ("jsonapi", {"parse": P.parse_jsonapi}, 3.0, False),
        ("jsmap", {"parse": P.parse_jsmap}, 3.0, False),
        ("browser", {"parse": P.parse_browser}, 2.0, False),
        ("tagclass", {"parse": P.parse_tagclass}, 3.0, False),
        ("jsonhtml", {"parse": P.parse_jsonhtml}, 3.0, False),
        (
            "filetab",
            {
                "parse": P.parse_files_index,
                "file_csv": P.parse_file_csv,
                "file_csv_coded": P.parse_file_csv_coded,
                "file_xlsx": P.parse_file_xlsx,
                "file_pdf": P.parse_file_pdf,
            },
            3.0,
            False,
        ),
        ("scripted", {"parse": P.parse_scripted}, 2.0, False),
    ]
    for fam, callbacks, delay, mega in fam_specs:
        reg.register(ParserSpec(name=fam, family=fam, callbacks=callbacks, crawl_delay_s=delay, is_mega_host=mega))
    return reg
