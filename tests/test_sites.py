"""Golden tests for the concrete per-site extractor configurations
(sites/): each reference spider's quirk behavior on a reference-DOM-shaped
fixture page, plus the HTML-tree selector engine itself."""

import pytest

from goto_eater_crawler_ray.sites import SITE_SPECS, fixtures, reference_sites_registry


def _parse(site: str, page_idx: int = 0):
    import goto_eater_crawler_ray.sites as s

    mod = getattr(s, site)
    url, body = fixtures.pages()[site][page_idx]
    return mod.parse(url, body, {}, 0)


class TestHtmlSelector:
    def test_basics(self):
        from goto_eater_crawler_ray.functions.htmlsel import contains_text, parse_html, sel, sel_one

        doc = parse_html(
            '<div id="a" class="x y"><p class="k">t1<span>t2</span></p><p>t3</p>'
            '<a href="/u">Link&amp;Go</a></div>'
        )
        assert len(sel(doc, "div#a > p")) == 2
        assert sel_one(doc, "p.k").itext() == "t1"
        assert sel_one(doc, "p.k").text() == "t1t2"
        assert sel_one(doc, "div.x.y") is not None
        assert sel_one(doc, "a").attr("href") == "/u"
        assert sel_one(doc, "a").text() == "Link&Go"  # entity decode
        assert contains_text(sel(doc, "a"), "Go")

    def test_sibling_autoclose_and_void(self):
        from goto_eater_crawler_ray.functions.htmlsel import parse_html, sel

        doc = parse_html("<ul><li>a<li>b<li>c</ul><p>x<br>y</p>")
        lis = sel(doc, "ul > li")
        assert [li.itext() for li in lis] == ["a", "b", "c"]
        assert sel(doc, "p")[0].text() == "xy"

    def test_attr_substring(self):
        from goto_eater_crawler_ray.functions.htmlsel import parse_html, sel_one

        doc = parse_html('<span class="genre gen2">g</span>')
        assert sel_one(doc, "span[class*=genre]") is not None
        assert sel_one(doc, "span[class*=nope]") is None


class TestTochigi:
    def test_golden_page1(self):
        res = _parse("tochigi", 0)
        assert len(res.items) == 2
        a, b = res.items
        assert (a["shop_name"], a["zip_code"], a["genre_name"]) == ("鳥料理とちの木", "320-0033", "和食")
        assert (a["provided_lat"], a["provided_lng"]) == ("36.5658", "139.8836")
        assert a["official_page"] == "http://tochinoki.example"
        # zip-less card (tochigi.py:38-40); .com link without /data -> no latlng
        assert (b["zip_code"], b["address"]) == (None, "宇都宮市駅前通り2-2")
        assert b["provided_lat"] is None
        assert [l["url"] for l in res.links] == ["/merchant/index.php?page=2"]

    def test_last_page_stops(self):
        res = _parse("tochigi", 1)
        assert res.links == []
        assert res.items[0]["genre_name"] == "カフェ"


class TestNiigata:
    def test_golden_page1(self):
        res = _parse("niigata", 0)
        a, b = res.items
        assert a["shop_name"] == "へぎそば処 つばめ庵"  # h4 text + linked part
        assert a["area_name"] == "新潟市中央区"
        assert a["genre_name"] == "和食|そば"  # multi-genre join (niigata.py:89)
        assert (a["provided_lat"], a["provided_lng"]) == ("37.9161", "139.0364")
        assert (b["zip_code"], b["address"]) == (None, "長岡市今朝白9-9")  # no-zip quirk
        assert [l["url"] for l in res.links] == ["https://niigata-gte.com/shop/?p=2"]

    def test_area_list_is_the_reference_table(self):
        from goto_eater_crawler_ray.sites.niigata import AREA_LIST

        assert len(AREA_LIST) == 37  # niigata.py:19-57
        assert AREA_LIST[0] == "新潟市北区" and AREA_LIST[-1] == "粟島浦村"

    def test_last_page_stops(self):
        assert _parse("niigata", 1).links == []


class TestFukuoka:
    def test_genre_code_mapping(self):
        res = _parse("fukuoka")
        assert [i["genre_name"] for i in res.items] == ["和食・寿司", "中華料理", "うどん・そば・丼"]
        assert res.items[0]["address"] == "福岡市博多区博多駅前1-1駅前ビル2F"  # 3-col concat
        assert res.items[1]["official_page"] is None  # fillna("") -> None

    def test_code_table_is_the_reference_table(self):
        from goto_eater_crawler_ray.sites.fukuoka import GENRE_LIST

        assert len(GENRE_LIST) == 16  # [0] placeholder + codes 1..15 (fukuoka.py:20-37)
        assert GENRE_LIST[1] == "和食・寿司" and GENRE_LIST[15] == "その他"


class TestYamagata:
    def test_golden_page1(self):
        res = _parse("yamagata", 0)
        a, b = res.items
        assert (a["shop_name"], a["area_name"], a["genre_name"]) == ("和食ふじ乃", "鶴岡市", "和食・寿司・天ぷら")
        assert (a["zip_code"], a["address"]) == ("997-0034", "山形県鶴岡市本町2-15")
        assert a["tel"] == "0235-800-1111"  # "TEL : " label stripped
        assert b["official_page"] == "http://ramen-zao.example"
        # next POST page carries the form (yamagata.py:142-143)
        assert res.links[0]["method"] == "POST"
        assert res.links[0]["form"] == {"text": "", "page": "2"}

    def test_pager_stop_rule(self):
        # active == 次へ target -> finished (yamagata.py:137-139)
        assert _parse("yamagata", 1).links == []

    def test_area_list_is_the_reference_table(self):
        from goto_eater_crawler_ray.sites.yamagata import AREA_LIST

        assert len(AREA_LIST) == 35  # yamagata.py:21-57
        assert "鶴岡市" in AREA_LIST and "遊佐町" in AREA_LIST


class TestMiyagi:
    def test_join_cases(self):
        res = _parse("miyagi")
        by_name = {i["shop_name"]: i for i in res.items}
        # unique match -> latlng copied (miyagi.py:113-115); marker address
        # contains an apostrophe, so this also guards the JS decode
        assert by_name["牛たん仙臺屋"]["provided_lat"] == "38.2601"
        assert by_name["定食のまるよし"]["provided_lng"] == "140.8754"
        # two markers match name+substring -> null (miyagi.py:116-117)
        assert by_name["カフェ青葉"]["provided_lat"] is None
        # zero markers -> null (miyagi.py:118-119)
        assert by_name["未掲載食堂"]["provided_lat"] is None
        # area from the [ ... ] h2 bracket (miyagi.py:67-69)
        assert all(i["area_name"] == "仙台市青葉区" for i in res.items)
        # span.url TEXT not href (miyagi.py:103-104)
        assert by_name["牛たん仙臺屋"]["official_page"] == "http://sendaiya.example"
        assert by_name["定食のまるよし"]["official_page"] is None

    def test_seed_fan_out(self):
        from goto_eater_crawler_ray.sites.miyagi import seeds

        rows = seeds()
        assert len(rows) == 7  # miyagi.py:26-57
        assert all(r["method"] == "POST" for r in rows)
        assert rows[0]["form"]["area"] == "仙台市青葉区"


class TestSaitama:
    def test_golden(self):
        res = _parse("saitama")
        assert len(res.items) == 3
        by_name = {i["shop_name"]: i for i in res.items}
        # genre comes from the surrounding tab, area from the page name
        assert by_name["川越亭"]["genre_name"] == "和食"
        assert by_name["喫茶ひばり"]["genre_name"] == "カフェ"
        assert all(i["area_name"] == "川越市" for i in res.items)
        # positional span fields (saitama.py:109-114)
        assert by_name["川越亭"]["zip_code"] == "350-0041"
        assert by_name["川越亭"]["official_page"] == "http://kawagoetei.example"
        assert by_name["うなぎ藤棚"]["official_page"] is None

    def test_area_list_is_the_reference_table(self):
        from goto_eater_crawler_ray.sites.saitama import AREA_LIST, seeds

        assert len(AREA_LIST) == 73  # saitama.py:16-90
        rows = seeds()
        assert len(rows) == 73
        assert rows[0]["url"].endswith("/store/さいたま市西区.html")
        assert rows[0]["meta"]["area_name"] == "さいたま市西区"


class TestRegistryIntegration:
    def test_registry_builds_and_dispatches(self):
        reg = reference_sites_registry()
        for spec in SITE_SPECS:
            assert reg.get(spec.name) is spec
        url, body = fixtures.pages()["tochigi"][0]
        res = reg.parse("tochigi", "parse", url, body, {}, 0)
        assert len(res.items) == 2

    def test_span_invariant_shape(self):
        # every site emits (kind, text, media_ref) spans for the documents
        # table (BASELINE.json input_hint)
        for spec in SITE_SPECS:
            for url, body in fixtures.pages()[spec.name]:
                res = spec.callbacks["parse"](url, body, {}, 0)
                for kind, text, ref in res.spans:
                    assert kind in ("text", "link")
                    assert isinstance(text, str) and isinstance(ref, str)


@pytest.mark.usefixtures("ray_session")
class TestSiteItemsQuery:
    def test_site_items_query(self):
        from goto_eater_crawler_ray.pipelines.queries import q_site_items

        out = q_site_items("unused").to_pandas()
        assert len(out) == 2 + 1 + 2 + 1 + 3 + 2 + 1 + 4 + 3  # all fixture items
        assert set(out["prefecture"]) == {"tochigi", "niigata", "fukuoka", "yamagata", "miyagi", "saitama"}
        assert out[out["prefecture"] == "miyagi"]["provided_lat"].notna().sum() == 2
