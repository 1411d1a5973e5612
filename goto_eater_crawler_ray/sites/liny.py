"""liny family — GeoJSON 1-km-mesh bbox seeds over a JSON map API, as
three concrete configs: chiba, kanagawa, shiga.

Reference configuration ported (abstract_liny.py:36-66 + chiba.py:4-17,
kanagawa.py:4-16, shiga.py:4-16):
  * every spider is base_url + mesh_geojson_name + DOWNLOAD_DELAY over
    the shared liny machinery: each GeoJSON feature's polygon ring
    reduces to (lat_min, lat_max, lng_min, lng_max) = the API's
    x1/x2/y1/y2 bbox query (functions/geomesh.py implements the
    reduction with the reference's own self-test vector)
  * responses are JSON: ``data`` is a record list with name / address /
    tel / url / eigyo_jikan (free-form hours+closing mixed — the
    reference keeps it all in opening_hours) / latlng.{lat,lng} (site-
    provided coordinates used verbatim, no geocoding)
    (abstract_liny.py:50-66)
  * delays: chiba 1.25 s (502s under load, chiba.py:15-17),
    kanagawa 1.5 s, shiga 1.5 s

The reference ships each prefecture's real 1-km mesh file
(spiders/1km_mesh/*.geojson); here a deterministic 2-cell grid fixture
per prefecture exercises the same shape (the mesh file is input data,
not engine config).  liny hosts are the mega-host case: thousands of
bbox URLs on one domain — ``is_mega_host`` routes them through the
engine's salted-partition skew treatment.
"""

from __future__ import annotations

import json

from ..functions.geomesh import mesh_seed_rows
from ..registry import ParserSpec
from ..stages.parse import _EMPTY_ITEM, ParseResult


def _fixture_geojson(lat0: float, lng0: float) -> dict:
    """Two 1-km-ish mesh cells shaped like the reference files: closed
    5-point rings, [lng, lat] point order."""

    def cell(lat, lng):
        dlat, dlng = 0.0083333333333333, 0.0125  # the 1km mesh pitch (abstract_liny.py:69-77)
        # round the derived corners so seed-URL float reprs stay grid-clean
        lat2, lng2 = round(lat + dlat, 10), round(lng + dlng, 10)
        return {
            "type": "Feature",
            "geometry": {
                "type": "Polygon",
                "coordinates": [[[lng, lat], [lng2, lat], [lng2, lat2], [lng, lat2], [lng, lat]]],
            },
        }

    return {"type": "FeatureCollection", "features": [cell(lat0, lng0), cell(round(lat0 + 0.0083333333333333, 10), lng0)]}


_CONFIGS = {
    # name -> (base_url, fixture grid origin, delay_s)
    "chiba": ("https://gotoeat-chiba.liny.jp/map/api/data.json", (35.5416666666667, 140.1125), 1.25),
    "kanagawa": ("https://gotoeat-kanagawa.liny.jp/map/api/data.json", (35.4416666666667, 139.6125), 1.5),
    "shiga": ("https://gotoeat-shiga.liny.jp/map/api/data.json", (35.0083333333333, 135.8625), 1.5),
}


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    res = ParseResult()
    for article in json.loads(body.decode("utf-8", "replace"))["data"]:
        item = dict(_EMPTY_ITEM)
        item["shop_name"] = article["name"]
        item["address"] = article["address"]
        item["tel"] = article["tel"] or None
        item["official_page"] = article["url"] or None
        item["opening_hours"] = article["eigyo_jikan"] or None  # hours+closing mixed (abstract_liny.py:58-60)
        latlng = article.get("latlng") or {}
        if latlng.get("lat") is not None:
            item["provided_lat"], item["provided_lng"] = str(latlng["lat"]), str(latlng["lng"])
        res.items.append(item)
        res.spans.append(("text", (item["shop_name"] or "").strip(), ""))
        res.spans.append(("text", (item["address"] or "").strip(), ""))
    return res


def _make_spec(name: str) -> ParserSpec:
    base_url, (lat0, lng0), delay = _CONFIGS[name]

    def seeds() -> list[dict]:
        return mesh_seed_rows(_fixture_geojson(lat0, lng0), base_url, prefecture=name)

    return ParserSpec(
        name=name,
        family=f"site_{name}",
        allowed_domains=("liny.jp",),  # shared platform domain (abstract_liny.py:37)
        seeds=seeds,
        callbacks={"parse": parse},
        crawl_delay_s=delay,
        is_mega_host=True,  # one host serves every mesh cell
    )


CHIBA_SPEC = _make_spec("chiba")
KANAGAWA_SPEC = _make_spec("kanagawa")
SHIGA_SPEC = _make_spec("shiga")
