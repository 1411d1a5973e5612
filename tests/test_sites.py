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
        # two markers match name+substring -> FIRST marker wins: the
        # reference's `if match:` copies match[0] and its `elif 1 <
        # len(match)` branch is dead code (miyagi.py:113-119 BEHAVIOR)
        assert by_name["カフェ青葉"]["provided_lat"] == "38.25"
        assert by_name["カフェ青葉"]["provided_lng"] == "140.87"
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


class TestOsaka:
    def test_golden_page1(self):
        res = _parse("osaka", 0)
        a, b = res.items
        assert (a["shop_name"], a["area_name"]) == ("たこ焼き道頓堀 総本店", "ミナミ")
        assert a["genre_name"] == "たこ焼き|粉もん"  # multi-genre join (osaka.py:70)
        assert (a["zip_code"], a["address"]) == ("〒542-0071", "大阪市中央区道頓堀1-1")  # \s squeezed
        assert (a["tel"], a["opening_hours"], a["closing_day"]) == ("06-900-1111", "11:00-22:00", "水曜")
        assert a["detail_page"] == "https://goto-eat.weare.osaka-info.jp/shop/1111/"
        # nameless card -> the reference's hard-coded fallback (osaka.py:56-60)
        assert b["shop_name"] == "珉珉上新庄駅前店"
        assert (b["area_name"], b["genre_name"]) == ("キタ", "中華料理")
        assert [l["url"] for l in res.links] == ["https://goto-eat.weare.osaka-info.jp/gotoeat/page/2/"]

    def test_last_page_stops(self):
        res = _parse("osaka", 1)
        assert res.links == []
        assert res.items[0]["area_name"] == "泉州"

    def test_area_list_is_the_reference_table(self):
        from goto_eater_crawler_ray.sites.osaka import AREA_LIST

        assert len(AREA_LIST) == 10  # osaka.py:25-36
        assert AREA_LIST[0] == "キタ" and AREA_LIST[-1] == "泉州"


class TestGunma:
    def test_golden_page1(self):
        res = _parse("gunma", 0)
        a, b = res.items
        assert (a["shop_name"], a["area_name"], a["genre_name"]) == ("原嶋屋総本家", "前橋市", "焼きまんじゅう")
        assert a["zip_code"] == "371-0025"  # leading 〒 stripped via [1:] (gunma.py:32)
        assert a["address"] == "前橋市紅雲町2-2"  # direct text, zip span excluded
        assert a["tel"] == "027-900-1111"  # "TEL." prefix stripped (gunma.py:36-37)
        assert a["official_page"] == "http://harashimaya.example"  # shopinfo a[2]
        # optional genre/tel absent; single shopinfo link -> no official page
        assert (b["genre_name"], b["tel"], b["official_page"]) == (None, None, None)
        assert [l["url"] for l in res.links] == ["https://gunma-gotoeat-campaign.com/shop/page/2/?s=&post_type=shop"]

    def test_last_page_stops(self):
        assert _parse("gunma", 1).links == []


class TestAkita:
    def test_golden(self):
        res = _parse("akita")
        assert len(res.items) == 2  # empty-所在地 row dropped (akita.py:39-40)
        a, b = res.items
        # furigana comment kept in the name — normalize strips it later,
        # like the reference's item pipeline (akita.py:34-36)
        assert a["shop_name"] == "きりたんぽ亭<!--きりたんぽてい-->"
        assert (a["area_name"], a["address"], a["tel"]) == ("秋田市", "秋田市中通1-1", "018-900-1111")
        assert a["official_page"] == "http://kiritanpo.example"
        # address comment markers stripped INLINE (akita.py:42-44); short
        # row fillna -> no official page; no genre for akita (akita.py:50)
        assert b["address"] == "湯沢市稲庭町乾1-1"
        assert (b["official_page"], b["genre_name"]) == (None, None)

    def test_normalize_strips_furigana_comment(self):
        from goto_eater_crawler_ray.stages.normalize import normalize_text

        assert normalize_text("きりたんぽ亭<!--きりたんぽてい-->") == "きりたんぽ亭"


class TestNara:
    def test_golden(self):
        res = _parse("nara")
        a, b = res.items
        assert (a["area_name"], a["genre_name"], a["address"]) == ("奈良市", "和食", "奈良市角振町5-5")  # stripped
        assert a["official_page"] == "http://kakinoha.example"
        assert (b["tel"], b["official_page"]) == (None, None)  # fillna (nara.py:31)

    def test_malformed_xlsx_zip_is_explicit(self):
        import zipfile

        import pytest as _pytest

        from goto_eater_crawler_ray.sites.nara import parse

        with _pytest.raises((NotImplementedError, zipfile.BadZipFile)):
            parse("https://premium-gift.jp/x.xlsx", b"PK\x03\x04junk", {}, 0)

    def test_real_xlsx_decode_stdlib(self):
        # REAL zip-container xlsx (built with stdlib zipfile) decodes
        # through nara's column mapping with no openpyxl — the seam is
        # closed per reference nara.py:31 (sheet リスト, dtype=str)
        from goto_eater_crawler_ray.sites.nara import parse
        from tests.test_parse_golden import _build_real_xlsx

        body = _build_real_xlsx(
            "リスト",
            [
                ["エリア", "店舗名称", "カテゴリー", "住所", "電話番号", "URL"],
                ["奈良市 ", "柿の葉すし", " 和食", " 奈良市角振町5-5 ", "0742-00-0001", "http://kakinoha.example"],
            ],
        )
        res = parse("https://premium-gift.jp/x.xlsx", body, {}, 0)
        a = res.items[0]
        assert (a["area_name"], a["genre_name"], a["address"]) == ("奈良市", "和食", "奈良市角振町5-5")
        assert a["shop_name"] == "柿の葉すし"
        assert a["official_page"] == "http://kakinoha.example"


class TestTokyo:
    def test_index_fans_out_to_pdfs(self):
        res = _parse("tokyo", 0)
        assert res.items == []
        assert [l["url"] for l in res.links] == [
            "https://pr.gnavi.co.jp/promo/gotoeat-tokyo/pdf/shop1.pdf",
            "https://pr.gnavi.co.jp/promo/gotoeat-tokyo/pdf/shop4.pdf",
        ]
        assert all(l["callback"] == "file_pdf" for l in res.links)  # per-PDF fan-out (tokyo.py:27-31)

    def test_pdf_repair_branches(self):
        res = _parse("tokyo", 1)
        by_name = {i["shop_name"]: i for i in res.items}
        assert set(by_name) == {"銀座すし勘", "洋食キムラヤ", "神田やぶそば", "権八西麻布"}
        # normal header page: named-column selection incl 紙/電子 skip
        assert by_name["銀座すし勘"]["official_page"] == "http://sushikan.example"
        assert by_name["洋食キムラヤ"]["official_page"] is None
        # headerless 7-column page -> forced column names (tokyo.py:71-74)
        assert (by_name["神田やぶそば"]["address"], by_name["神田やぶそば"]["genre_name"]) == ("千代田区神田3-3", "そば")
        # URL-column-less page -> fill "" (tokyo.py:76-78); header echo +
        # blank-address rows dropped (tokyo.py:85-90)
        assert by_name["権八西麻布"]["official_page"] is None
        assert "もんじゃ浜膳" not in by_name

    def test_real_pdf_decode_stdlib(self):
        # REAL multi-page PDF (stdlib-built: xref + FlateDecode +
        # Tm/Td/Tj/TJ/hex) decodes through tokyo's named-column repair
        # with no pdfplumber — the codec seam is closed (tokyo.py:48-98)
        from goto_eater_crawler_ray.sites.tokyo import parse
        from tests.test_parse_golden import _build_real_pdf

        body = _build_real_pdf(
            [
                [
                    ["紙", "電子", "飲食店名", "店舗住所", "店舗電話番号", "URL", "業態"],
                    ["○", "", "銀座すし勘", "中央区銀座1-1", "03-1111-0001", "http://sushikan.example", "寿司"],
                    ["", "○", "飲食店名", "店舗住所", "店舗電話番号", "URL", "業態"],  # header echo -> dropped
                ],
                [
                    ["紙", "電子", "飲食店名", "店舗住所", "店舗電話番号", "URL", "業態"],
                    ["○", "○", "神田やぶそば", "千代田区神田3-3", "03-1111-0003", "", "そば"],
                ],
            ]
        )
        res = parse("https://pr.gnavi.co.jp/promo/gotoeat-tokyo/pdf/shop9.pdf", body, {}, 0)
        by_name = {i["shop_name"]: i for i in res.items}
        assert set(by_name) == {"銀座すし勘", "神田やぶそば"}
        assert by_name["銀座すし勘"]["official_page"] == "http://sushikan.example"
        assert by_name["神田やぶそば"]["address"] == "千代田区神田3-3"


class TestNagasaki:
    def test_golden_page1(self):
        res = _parse("nagasaki", 0)
        a, b = res.items
        assert a["shop_name"] == "卓袱浜勝"
        # area/genre join ALL text chunks around inner markup (nagasaki.py:23-27)
        assert (a["area_name"], a["genre_name"]) == ("長崎市内", "和食・卓袱")
        assert a["tel"] == "095-900-1111"  # raw, reference doesn't strip
        assert a["official_page"] == "http://hamakatsu.example"
        assert (b["tel"], b["official_page"]) == (None, None)
        assert [l["url"] for l in res.links] == ["https://www.gotoeat-nagasaki.jp/merchant-list/page/2/"]

    def test_last_page_stops(self):
        assert _parse("nagasaki", 1).links == []


class TestHokkaido:
    def test_token_page_fans_out_posts(self):
        res = _parse("hokkaido", 0)
        assert res.items == []
        assert len(res.links) == 4  # one POST per area (hokkaido.py:126)
        assert [l["form"]["store_area"] for l in res.links] == ["道央", "道北", "道南", "道東"]
        assert all(l["method"] == "POST" and l["callback"] == "search" for l in res.links)
        assert all(l["form"]["_token"] == "tok-hokkaido-123" for l in res.links)  # CSRF token carried
        assert res.links[0]["meta"] == {"area_name": "道央"}

    def test_result_page_carries_area_and_paginates(self):
        from goto_eater_crawler_ray.sites.hokkaido import parse_search

        url, body = fixtures.pages()["hokkaido"][1]
        res = parse_search(url, body, {"area_name": "道央"}, 1)
        a, b = res.items
        assert (a["shop_name"], a["area_name"]) == ("スープカレー奥芝", "道央")
        assert (a["address"], a["genre_name"], a["tel"]) == ("札幌市中央区南1条1-1", "スープカレー", "011-900-1111")
        assert b["tel"] is None  # optional (hokkaido.py:118-119)
        # GET pagination keeps the area meta (hokkaido.py:84-106)
        assert res.links[0]["method"] == "GET"
        assert res.links[0]["meta"] == {"area_name": "道央"}

    def test_last_page_stops(self):
        from goto_eater_crawler_ray.sites.hokkaido import parse_search

        url, body = fixtures.pages()["hokkaido"][2]
        assert parse_search(url, body, {"area_name": "道南"}, 2).links == []


class TestOita:
    def test_golden_accumulated_page(self):
        res = _parse("oita")
        a, b = res.items
        assert (a["shop_name"], a["area_name"]) == ("とり天発祥の店", "大分市")
        assert a["genre_name"] == "とり天|定食"  # multi-genre join (oita.py:60-61)
        assert a["tel"] == "097-900-1111"
        assert a["official_page"] == "http://toriten.example"  # stripped (oita.py:68-69)
        assert (b["tel"], b["official_page"]) == (None, None)
        assert res.links == []  # scroll accumulation happens in the fetch stage

    def test_seed_requests_browser_fetch(self):
        from goto_eater_crawler_ray.sites.oita import seeds

        assert seeds()[0]["meta"] == {"browser": True}


class TestKyoto:
    def test_list_fans_out_details(self):
        res = _parse("kyoto", 0)
        assert res.items == []
        # first href urljoin'd against the page URL + stripped (kyoto.py:27)
        assert [l["url"] for l in res.links[:2]] == [
            "https://kyoto-gotoeat.com/store/101/",
            "https://kyoto-gotoeat.com/store/102/",
        ]
        assert all(l["callback"] == "detail" for l in res.links[:2])
        assert res.links[2]["url"] == "https://kyoto-gotoeat.com/page/2/?s="
        assert res.links[2]["callback"] == "parse"

    def test_detail_label_table(self):
        res = _parse("kyoto", 1)  # content-routed through parse()
        (a,) = res.items
        assert a["shop_name"] == "湯豆腐 嵯峨乃"
        assert (a["genre_name"], a["area_name"], a["address"]) == ("和食", "右京区", "京都市右京区嵯峨天龍寺1-1")
        assert a["tel"] is None  # empty td, never stripped-to-something (kyoto.py:68-73)
        assert a["opening_hours"] == "11:00-17:00"
        assert a["official_page"] == "http://sagano.example"  # "U R L" spaced label
        assert (a["provided_lat"], a["provided_lng"]) == ("35.0156", "135.6739")  # iframe q= (kyoto.py:85-89)


class TestKagawa:
    def test_golden_page1(self):
        res = _parse("kagawa", 0)
        a, b = res.items
        assert (a["shop_name"], a["area_name"]) == ("骨付鳥 一鶴", "丸亀市")
        assert a["genre_name"] == "鶏料理|居酒屋"  # full-width ｜ -> | (kagawa.py:27-31)
        assert (a["tel"], a["address"]) == ("0877-900-1111", "丸亀市浜町1-1")
        assert b["genre_name"] == "うどん"
        # urljoin'd next (kagawa.py:55)
        assert [l["url"] for l in res.links] == [
            "https://www.kagawa-gotoeat.com/gtes/store-list?fstr=&mode=only&page=2"
        ]

    def test_last_page_stops(self):
        assert _parse("kagawa", 1).links == []


class TestAichi:
    def test_golden_page1(self):
        res = _parse("aichi", 0)
        a, b = res.items
        assert (a["shop_name"], a["genre_name"], a["area_name"]) == ("味噌煮込みの山本屋", "和食", "名古屋市中区")
        # 〒 with optional whitespace before the zip (aichi.py:34)
        assert (a["zip_code"], a["address"]) == ("460-0008", "名古屋市中区栄1-1")
        assert a["tel"] == "tel:0529001111"  # the HREF, verbatim (aichi.py:37)
        assert a["official_page"] == "http://yamamotoya.example"
        assert (b["area_name"], b["tel"], b["official_page"]) == (None, None, None)
        # urljoin'd next (aichi.py:49)
        assert [l["url"] for l in res.links] == ["https://www.gotoeat-aichi-shop.jp/shop/page/2/"]

    def test_last_page_stops(self):
        assert _parse("aichi", 1).links == []


class TestHyogo:
    def test_golden_page1(self):
        res = _parse("hyogo", 0)
        a, b = res.items
        assert a["shop_name"] == "神戸ビーフ吉祥"
        assert a["zip_code"] == "650-0001"  # stripped + 〒 removed (hyogo.py:28)
        assert a["address"] == "神戸市中央区加納町1-1"  # all whitespace squeezed (hyogo.py:27)
        assert a["tel"] == "078-900-1111"
        assert a["genre_name"] is None  # structurally unavailable (hyogo.py:32-36)
        # ?page=xx echo stripped from the detail URL (hyogo.py:38-41)
        assert a["detail_page"] == "https://gotoeat-hyogo.com/store/detail/501"
        assert b["tel"] is None
        # pagination: sibling AFTER current (hyogo.py:46-48)
        assert [l["url"] for l in res.links] == ["https://gotoeat-hyogo.com/search/result?keyword=&page=4"]

    def test_last_page_stops(self):
        # current is the LAST page number -> no next sibling -> stop
        assert _parse("hyogo", 1).links == []


class TestLiny:
    def test_mesh_seeds_from_geojson(self):
        from goto_eater_crawler_ray.sites.liny import CHIBA_SPEC

        rows = CHIBA_SPEC.seeds()
        assert len(rows) == 2  # one URL per mesh cell (abstract_liny.py:39-47)
        # the reference's own self-test bbox (abstract_liny.py:69-87)
        assert rows[0]["url"] == (
            "https://gotoeat-chiba.liny.jp/map/api/data.json"
            "?x1=35.5416666666667&x2=35.55&y1=140.1125&y2=140.125"
        )
        assert CHIBA_SPEC.is_mega_host  # all cells on one host -> salted partitions

    def test_json_api_parse(self):
        from goto_eater_crawler_ray.sites import liny

        url, body = fixtures.pages()["chiba"][0]
        res = liny.parse(url, body, {}, 0)
        a, b = res.items
        assert (a["shop_name"], a["address"]) == ("房総海鮮まるとみ", "千葉市中央区富士見1-1")
        assert a["opening_hours"] == "11:00〜21:00 (水曜定休)"  # hours+closing mixed
        assert (a["provided_lat"], a["provided_lng"]) == ("35.545", "140.115")  # site latlng verbatim
        assert (b["tel"], b["official_page"], b["provided_lat"]) == (None, None, None)

    def test_three_configs(self):
        from goto_eater_crawler_ray.sites.liny import KANAGAWA_SPEC, SHIGA_SPEC

        assert KANAGAWA_SPEC.crawl_delay_s == 1.5 and SHIGA_SPEC.crawl_delay_s == 1.5
        assert KANAGAWA_SPEC.seeds()[0]["url"].startswith("https://gotoeat-kanagawa.liny.jp/")
        assert SHIGA_SPEC.seeds()[0]["url"].startswith("https://gotoeat-shiga.liny.jp/")


class TestKochi:
    def test_positional_json_and_bracket_name(self):
        res = _parse("kochi")
        a, b, c = res.items
        assert (a["area_name"], a["genre_name"], a["shop_name"]) == ("高知市", "居酒屋", "藁焼き龍馬亭")
        assert (a["address"], a["tel"]) == ("高知市帯屋町1-1", "088-900-1111")
        # the one legitimate angle-bracket name, protected from the HTML
        # strip exactly like the reference (kochi.py:41-46)
        assert b["shop_name"] == "　きてみいや"
        assert c["tel"] is None


class TestShimane:
    def test_list_fans_out_details(self):
        res = _parse("shimane", 0)
        assert res.items == []
        assert [l["url"] for l in res.links[:2]] == [
            "https://www.gotoeat-shimane.jp/inshokuten/detail/801?page=2",
            "https://www.gotoeat-shimane.jp/inshokuten/detail/802?page=2",
        ]
        assert all(l["callback"] == "detail" for l in res.links[:2])
        assert res.links[2]["url"] == "https://www.gotoeat-shimane.jp/inshokuten/page/3"

    def test_detail_quirks(self):
        res = _parse("shimane", 1)  # content-routed through parse()
        (a,) = res.items
        assert a["shop_name"] == "出雲そば処 献上亭"
        assert a["area_name"] == "出雲"
        # ?page=2 echo stripped (shimane.py:43-47)
        assert a["detail_page"] == "https://www.gotoeat-shimane.jp/inshokuten/detail/801"
        assert a["official_page"] == "http://kenjotei.example"  # TEXT not href
        assert a["genre_name"] == "そば和食"  # ALL whitespace squeezed (shimane.py:60-61)
        assert a["tel"] == "0853-900-1111"


class TestToyama:
    def test_synthesized_next_url(self):
        res = _parse("toyama", 0)
        a, b = res.items
        assert (a["genre_name"], a["shop_name"]) == ("寿司", "氷見きときと寿し")
        assert a["address"] == "氷見市伊勢大町1-1"  # only address stripped
        assert (a["tel"], a["opening_hours"], a["closing_day"]) == ("0766-900-1111", "10:00-21:00", "火曜")
        assert (b["tel"], b["opening_hours"]) == (None, None)
        # URL synthesized from the page counter, not scraped (toyama.py:41-51)
        assert [l["url"] for l in res.links] == [
            "https://www.toyamagotoeat.jp/shop/page/2?area=all&type=&search="
        ]

    def test_counter_derives_from_url_and_stops(self):
        res = _parse("toyama", 1)  # /shop/page/2... with NO probe link
        assert res.links == []
        from goto_eater_crawler_ray.sites import fixtures as fx
        from goto_eater_crawler_ray.sites.toyama import parse

        # same body WITH a probe, fetched at page 2 -> synthesizes page 3
        url = "https://www.toyamagotoeat.jp/shop/page/2?area=all&type=&search="
        res2 = parse(url, fx.TOYAMA_PAGE_1.encode(), {}, 1)
        assert res2.links[0]["url"].endswith("/shop/page/3?area=all&type=&search=")


class TestTottori:
    def test_golden_page1(self):
        res = _parse("tottori", 0)
        a, b = res.items
        assert (a["shop_name"], a["area_name"]) == ("すなば珈琲 本店", "鳥取市")
        assert a["genre_name"] == "カフェ|喫茶"  # icon-genre join (tottori.py:34-35)
        assert a["tel"] == "0857900111"  # tel: scheme stripped (tottori.py:28-29)
        assert a["official_page"] == "http://sunaba.example"  # target=_blank link
        assert (b["tel"], b["official_page"]) == (None, None)
        assert [l["url"] for l in res.links] == ["https://tottori-gotoeat.jp/store_list/page/2/"]

    def test_last_page_stops(self):
        assert _parse("tottori", 1).links == []


class TestAomori:
    def test_golden_page1(self):
        res = _parse("aomori", 0)
        a, b = res.items
        assert a["shop_name"] == "大間の まぐろ食堂"  # " ".join of title chunks (aomori.py:23)
        assert (a["genre_name"], a["zip_code"], a["address"]) == ("海鮮", "039-4601", "下北郡大間町大間1-1")
        assert a["official_page"] == "http://oma-maguro.example"
        assert a["detail_page"] == "https://premium-gift.jp/aomori/use_store/detail?id=901"
        assert b["tel"] is None  # "-" means none (aomori.py:40)
        # javascript pager arg -> synthesized URL (aomori.py:55-59)
        assert [l["url"] for l in res.links] == [
            "https://premium-gift.jp/aomori/use_store?events=page&id=2&store=&addr=&industry="
        ]

    def test_last_page_stops(self):
        assert _parse("aomori", 1).links == []


class TestFukui:
    def test_post_seed_and_search_fanout(self):
        from goto_eater_crawler_ray.sites.fukui import seeds

        (seed,) = seeds()
        assert seed["method"] == "POST"
        assert seed["form"] == {"Keyword": "", "Action": "text_search"}  # fukui.py:25-27

        res = _parse("fukui", 0)
        assert res.items == []
        assert [l["url"] for l in res.links] == [
            "https://gotoeat-fukui.com/shop/?id=180001",
            "https://gotoeat-fukui.com/shop/?id=180097",
        ]
        assert all(l["callback"] == "detail" for l in res.links)  # no pagination (fukui.py:31)

    def test_detail_quirks(self):
        res = _parse("fukui", 1)  # content-routed through parse()
        (a,) = res.items
        assert (a["shop_name"], a["area_name"]) == ("ヨーロッパ軒 総本店", "福井市")
        assert a["genre_name"] == "洋食|カツ丼"  # 、 -> | (fukui.py:56)
        assert a["tel"] == "0776-900-1111"
        assert a["address"] == "福井市順化1-1"
        assert (a["provided_lat"], a["provided_lng"]) == ("36.0652", "136.2189")  # a.gmap q= (fukui.py:66-71)
        assert a["official_page"] == "http://yo-roppaken.example"  # dd TEXT
        assert a["detail_page"] == "https://gotoeat-fukui.com/shop/?id=180001"


class TestEhime:
    def test_golden_page1(self):
        res = _parse("ehime", 0)
        a, b = res.items
        assert (a["shop_name"], a["genre_name"], a["address"]) == ("鯛めし丸水", "郷土料理", "松山市大街道1-1")
        assert a["tel"] == "089-900-1111"  # a.tel_link text (ehime.py:28)
        assert a["detail_page"] == "https://www.goto-eat-ehime.com/shop/1001/"  # stripped
        assert (b["tel"], b["area_name"]) == (None, None)  # area is search-only (ehime.py:31-32)
        assert [l["url"] for l in res.links] == ["https://www.goto-eat-ehime.com/shop_list/page/2/"]

    def test_last_page_stops(self):
        assert _parse("ehime", 1).links == []


class TestFukushima:
    def test_inline_modal_detail(self):
        res = _parse("fukushima", 0)
        a, b = res.items
        assert (a["shop_name"], a["address"], a["genre_name"]) == ("円盤餃子のふくしま亭", "福島市栄町1-1", "餃子")
        # all detail fields from the hidden modal, no extra request
        assert (a["tel"], a["opening_hours"], a["closing_day"]) == ("024-900-1111", "17:00-23:00", "月曜")
        assert a["official_page"] == "http://enban-gyoza.example"
        assert (a["provided_lat"], a["provided_lng"]) == ("37.7608", "140.4733")  # iframe q=
        assert (b["opening_hours"], b["provided_lat"]) == (None, None)
        assert [l["url"] for l in res.links] == ["https://gotoeat-fukushima.jp/shop/page/2/?s="]

    def test_last_page_stops(self):
        assert _parse("fukushima", 1).links == []


class TestGifu:
    def test_list_fans_out_and_pages(self):
        res = _parse("gifu", 0)
        assert res.items == []
        assert [l["url"] for l in res.links[:2]] == [
            "https://area34.smp.ne.jp/area/card/26960/abc1/M",
            "https://area34.smp.ne.jp/area/card/26960/abc2/M",
        ]
        assert all(l["callback"] == "detail" for l in res.links[:2])
        # sibling AFTER td.smp-current-page (gifu.py:40-42)
        assert res.links[2]["url"] == "https://area34.smp.ne.jp/area/table/26960/ADtah6/M?page=2"

    def test_detail_card_table(self):
        res = _parse("gifu", 1)  # content-routed through parse()
        (a,) = res.items
        assert (a["shop_name"], a["genre_name"], a["area_name"]) == ("飛騨牛まる明", "焼肉", "飛騨")
        assert a["official_page"] == "http://maruaki.example"
        assert a["zip_code"] == "506-0011"
        # embedded shop name stripped from the address (gifu.py:69)
        assert a["address"] == "高山市本町4-4  ビル1F"
        assert a["tel"] == "0577-900-1111"

    def test_platform_courtesy_delay(self):
        from goto_eater_crawler_ray.sites.gifu import SPEC

        assert SPEC.crawl_delay_s == 1.7  # shared SaaS host (gifu.py:23-29)


class TestHiroshima:
    def test_linked_and_plain_names(self):
        res = _parse("hiroshima", 0)
        a, b = res.items
        # linked name -> text from the a + official page (hiroshima.py:24-29)
        assert (a["shop_name"], a["official_page"]) == ("お好み村 八昌", "http://okonomi-mura.example")
        assert (a["genre_name"], a["address"]) == ("お好み焼", "広島市中区新天地1-1")
        # plain name -> h3's own text, no official page
        assert (b["shop_name"], b["official_page"]) == ("きさく 本店", None)
        assert [l["url"] for l in res.links] == ["https://gotoeat.hiroshima.jp/page/2/?s"]

    def test_last_page_stops(self):
        assert _parse("hiroshima", 1).links == []


class TestIbaraki:
    def test_positional_columns_and_pager(self):
        res = _parse("ibaraki", 0)
        a, b = res.items
        assert (a["genre_name"], a["shop_name"]) == ("そば", "蕎麦処 常陸庵")
        assert a["detail_page"] == "https://area34.smp.ne.jp/area/card/27130/x1/M"
        assert a["address"] == "水戸市 南町1-1"  # td4 + " " + td5 (ibaraki.py:42-44)
        assert b["tel"] is None
        assert [l["url"] for l in res.links] == [
            "https://area34.smp.ne.jp/area/table/27130/3jFZ4A/M?_page_27130=2"
        ]

    def test_last_page_stops(self):
        assert _parse("ibaraki", 1).links == []


class TestIshikawa:
    def test_golden_page1(self):
        res = _parse("ishikawa", 0)
        a, b = res.items
        assert (a["genre_name"], a["area_name"], a["shop_name"]) == ("寿司", "金沢市", "近江町市場寿し")
        assert a["zip_code"] == "920-0907"  # 〒 stripped
        assert a["address"] == "金沢市青草町 88番地"  # normalize-space (ishikawa.py:32)
        assert a["tel"] == "076-900-1111"  # TEL. stripped
        assert b["tel"] is None
        assert res.links[0]["url"].startswith("https://ishikawa-gotoeat-cpn.com/page/2/")

    def test_last_page_stops(self):
        assert _parse("ishikawa", 1).links == []


class TestIwate:
    def test_area_post_fanout(self):
        from goto_eater_crawler_ray.sites.iwate import AREA_LIST, seeds

        assert len(AREA_LIST) == 33  # iwate.py:19-54
        rows = seeds()
        assert len(rows) == 33
        assert all(r["method"] == "POST" for r in rows)
        assert rows[0]["form"] == {"k": "", "area": "盛岡市"}

    def test_tel_regex_extraction(self):
        res = _parse("iwate")
        a, b = res.items
        assert (a["shop_name"], a["area_name"]) == ("わんこそば東家", "盛岡市")
        assert a["tel"] == "019-900-1111"  # extracted from free text (iwate.py:74-76)
        assert b["tel"] is None  # no number in the line
        assert b["genre_name"] == "イカの唐揚げ"  # free-form genre survives


class TestKagoshima:
    def test_index_whitelist(self):
        res = _parse("kagoshima", 0)
        assert res.items == []
        # only the two whitelisted areas; districts + ticket link skipped
        assert [l["url"] for l in res.links] == [
            "http://www.kagoshima-cci.or.jp/area/zeniki.html",
            "http://www.kagoshima-cci.or.jp/area/sonota.html",
        ]
        assert res.links[0]["meta"] == {"area_name": "鹿児島市全域"}

    def test_area_rows_and_city_prefix(self):
        from goto_eater_crawler_ray.sites import fixtures as fx
        from goto_eater_crawler_ray.sites.kagoshima import parse_from_area_html

        url = "http://www.kagoshima-cci.or.jp/area/zeniki.html"
        res = parse_from_area_html(url, fx.KAGOSHIMA_AREA_PAGE.encode(), {"area_name": "鹿児島市全域"}, 1)
        a, b = res.items
        # 検索-marked rows only; header row skipped (kagoshima.py:68)
        assert a["shop_name"] == "黒豚料理あぢもり"
        assert a["address"] == "鹿児島市千日町1-1"  # city prefix re-attached (kagoshima.py:72-73)
        assert b["address"] == "鹿児島市金生町2-2"
        # other areas keep the address as-is
        res2 = parse_from_area_html(url, fx.KAGOSHIMA_AREA_PAGE.encode(), {"area_name": "〇その他地域"}, 1)
        assert res2.items[0]["address"] == "千日町1-1"


class TestKumamoto:
    def test_golden_page1(self):
        res = _parse("kumamoto", 0)
        a, b = res.items
        assert (a["shop_name"], a["area_name"]) == ("馬刺しの菅乃屋", "熊本市")
        assert (a["zip_code"], a["address"]) == ("860-0808", "熊本市中央区手取本町1-1")
        assert a["official_page"] == "http://suganoya.example"  # p[3]/a (kumamoto.py:31)
        assert (a["genre_name"], b["official_page"]) == (None, None)  # no genre dimension
        assert [l["url"] for l in res.links] == ["https://gotoeat-kumamoto.jp/shop/page/2"]

    def test_last_page_stops(self):
        assert _parse("kumamoto", 1).links == []


class TestMie:
    def test_list_and_pager(self):
        res = _parse("mie", 0)
        assert res.items == []
        assert res.links[0]["url"] == "https://area34.smp.ne.jp/area/card/26722/m1/M"
        assert res.links[1]["url"] == "https://area34.smp.ne.jp/area/table/26722/AikX5e/M?page=2"

    def test_detail_with_broken_tel_row(self):
        res = _parse("mie", 1)  # content-routed
        (a,) = res.items
        assert a["shop_name"] == "伊勢うどん奥野家"
        assert (a["zip_code"], a["address"]) == ("516-0025", "伊勢市宇治今在家町4-4")
        # the platform's tr-less 電話番号 row still resolves (mie.py:70-71)
        assert a["tel"] == "0596-900-1111"
        assert (a["area_name"], a["genre_name"]) == ("伊勢志摩", "うどん")
        assert a["official_page"] == "http://okunoya.example"

    def test_nagoya_leak_filtered(self):
        from goto_eater_crawler_ray.sites import fixtures as fx
        from goto_eater_crawler_ray.sites.mie import detail

        res = detail("https://area34.smp.ne.jp/area/card/26722/m9/M", fx.MIE_DETAIL_NAGOYA_PAGE.encode(), {}, 1)
        assert res.items == []  # 愛知県 rows dropped (mie.py:66-68)


class TestMiyazaki:
    def test_genre_in_name_split(self):
        res = _parse("miyazaki", 0)
        a, b = res.items
        # "/"-separated title splits into name + genre (miyazaki.py:24-28)
        assert (a["shop_name"], a["genre_name"]) == ("地鶏炭火焼ぐんけい", "居酒屋")
        assert (a["zip_code"], a["address"]) == ("880-0001", "宮崎市橘通西1-1")
        assert a["official_page"] == "http://gunkei.example"
        # plain title -> whole text, no genre; "-" tel -> none
        assert (b["shop_name"], b["genre_name"], b["tel"]) == ("チキン南蛮おぐら", None, None)
        assert [l["url"] for l in res.links] == [
            "https://premium-gift.jp/gotoeatmiyazaki/use_store?events=page&id=2&store=&addr=&industry="
        ]

    def test_last_page_stops(self):
        assert _parse("miyazaki", 1).links == []


class TestNagano:
    def test_golden_page1(self):
        res = _parse("nagano", 0)
        assert len(res.items) == 2  # nameless grid-padding block skipped
        a, b = res.items
        assert (a["shop_name"], a["area_name"], a["genre_name"]) == ("信州そば処みよ田", "松本市", "そば")
        assert a["address"] == "松本市深志1-1"  # SECOND p.shop_address, 住所： stripped
        assert (a["tel"], a["official_page"]) == ("0263-900-1111", "http://miyota.example")
        assert b["official_page"] is None
        # URL synthesized from the page counter (nagano.py:39-47)
        assert [l["url"] for l in res.links] == ["https://shinshu-premium.jp/riyou.php?p=2#search-result"]

    def test_counter_and_stop(self):
        res = _parse("nagano", 1)
        assert res.links == []
        from goto_eater_crawler_ray.sites import fixtures as fx
        from goto_eater_crawler_ray.sites.nagano import parse

        res2 = parse("https://shinshu-premium.jp/riyou.php?p=2#search-result", fx.NAGANO_PAGE_1.encode(), {}, 1)
        assert res2.links[0]["url"] == "https://shinshu-premium.jp/riyou.php?p=3#search-result"


class TestOkayama:
    def test_post_seed_and_golden(self):
        from goto_eater_crawler_ray.sites.okayama import seeds

        (seed,) = seeds()
        assert seed["method"] == "POST"
        assert seed["form"] == {"c": "list", "keyword": "", "AREA": "", "BUSINESS": ""}

        res = _parse("okayama", 0)
        a, b = res.items
        assert (a["shop_name"], a["area_name"], a["genre_name"]) == ("千屋牛焼肉けんちゃん", "新見市", "焼肉")
        assert a["tel"] == "0867-900-1111"  # a.tellink text
        assert a["official_page"] == "http://kenchan.example"
        assert (b["tel"], b["official_page"]) == (None, None)
        # ">>" pager urljoin'd against the POST URL (okayama.py:47-52)
        assert [l["url"] for l in res.links] == ["https://gotoeat-okayama.com/shop/index.cgi?c=list&pic=2"]

    def test_last_page_stops(self):
        assert _parse("okayama", 1).links == []


class TestOkinawa:
    def test_golden_page1(self):
        res = _parse("okinawa", 0)
        a, b = res.items
        assert (a["area_name"], a["genre_name"], a["shop_name"]) == ("那覇市", "沖縄料理", "首里そば本家")
        assert a["tel"] == "098-900-1111"  # TEL: stripped (okinawa.py:26-27)
        assert a["official_page"] == "http://shurisoba.example"
        assert (b["tel"], b["official_page"]) == (None, None)
        # li after the aria-current page (okinawa.py:35-37)
        assert [l["url"] for l in res.links] == ["https://gotoeat.okinawa.jp/restaurant/page/2/"]

    def test_last_page_stops(self):
        assert _parse("okinawa", 1).links == []


class TestSaga:
    def test_positional_dls(self):
        res = _parse("saga", 0)
        a, b = res.items
        assert (a["shop_name"], a["genre_name"]) == ("呼子いか本家", "海鮮")
        assert a["address"] == "唐津市呼子町呼子1-1"  # dd chunks joined (saga.py:24)
        assert (a["tel"], a["opening_hours"], a["closing_day"]) == ("0955-900-1111", "11:00-20:00", "水曜")
        assert a["official_page"] == "http://ikahonke.example"  # dl[5] a[rel*=noopener]
        assert (b["tel"], b["area_name"]) == (None, None)  # area is search-only
        assert [l["url"] for l in res.links] == [
            "https://www.sagaoishi-to.com/consumer/shop.php?name=&page=2#search_result"
        ]

    def test_last_page_stops(self):
        assert _parse("saga", 1).links == []


class TestTokushima:
    def test_header_genre_split(self):
        res = _parse("tokushima", 0)
        a, b = res.items
        assert a["shop_name"] == "阿波尾鶏一徹"
        assert a["genre_name"] == "焼鳥|和食"  # header text comma split (tokushima.py:24-28)
        assert a["address"] == "徳島市紺屋町1-1"
        assert (a["closing_day"], a["opening_hours"], a["tel"]) == ("月曜", "17:00-23:00", "088-900-1111")
        assert (b["genre_name"], b["tel"]) == ("その他", None)
        assert [l["url"] for l in res.links] == ["https://gotoeat.tokushima.jp/page/2/?s="]

    def test_last_page_stops(self):
        assert _parse("tokushima", 1).links == []


class TestShizuoka:
    def test_js_jumppage_synthesis(self):
        res = _parse("shizuoka", 0)
        a, b = res.items
        assert (a["shop_name"], a["genre_name"]) == ("さわやかハンバーグ", "ハンバーグ")
        # no-space zip tolerated (shizuoka.py:30-35)
        assert (a["zip_code"], a["address"]) == ("422-8006", "静岡市駿河区曲金1-1")
        assert (a["tel"], a["official_page"]) == ("054-900-1111", "http://sawayaka.example")
        assert a["detail_page"] == "https://gotoeat.s-reserve.com/index/118009601.html"
        assert (b["zip_code"], b["address"]) == ("426-0061", " 藤枝市田沼2-2")  # spaced variant
        # javascript:jumppage(2) -> synthesized URL (shizuoka.py:56-60)
        assert [l["url"] for l in res.links] == [
            "https://gotoeat.s-reserve.com/index.html?freeword=&area=&genre=&pgn=2#shopsearch"
        ]

    def test_last_page_stops(self):
        assert _parse("shizuoka", 1).links == []


class TestShizuokaBlue:
    def test_accordion_cards(self):
        res = _parse("shizuoka_blue", 0)
        a, b = res.items
        assert a["shop_name"] == "浜松餃子むつぎく"
        assert a["area_name"] == "西部"  # 【】 stripped (shizuoka_blue.py:28-29)
        assert a["genre_name"] == "餃子|中華"
        assert a["zip_code"] == "430-0926"
        assert a["address"] == "浜松市中区砂山町1-1"  # chunks stripped + joined
        assert (a["tel"], a["opening_hours"], a["closing_day"]) == ("053-900-1111", "11:30-21:00", "月曜")
        assert a["official_page"] == "http://mutsugiku.example"
        assert (b["tel"], b["official_page"]) == (None, None)
        assert [l["url"] for l in res.links] == ["https://gotoeat-shizuoka.com/shop/page/2/"]

    def test_last_page_stops(self):
        assert _parse("shizuoka_blue", 1).links == []


class TestWakayama:
    def test_form_action_pagination(self):
        res = _parse("wakayama", 0)
        a, b = res.items
        assert (a["shop_name"], a["genre_name"], a["area_name"]) == ("和歌山ラーメン井出商店", "ラーメン", "和歌山市")
        assert (a["zip_code"], a["address"]) == ("640-8331", "和歌山市田中町1-1")
        assert (a["tel"], a["official_page"]) == ("073-900-1111", "http://ide-shoten.example")
        assert (b["tel"], b["official_page"]) == (None, None)
        # form @action of the li after the active page button (wakayama.py:45-47)
        assert [l["url"] for l in res.links] == ["https://gotoeat-wakayama.com/search/?page=2"]

    def test_last_page_stops(self):
        assert _parse("wakayama", 1).links == []


class TestYamanashi:
    def test_single_page_sections(self):
        res = _parse("yamanashi")
        assert len(res.items) == 3  # header rows skipped per section
        a, b, c = res.items
        assert (a["area_name"], a["shop_name"], a["genre_name"]) == ("甲府市", "ほうとう小作", "郷土料理")
        assert (a["address"], a["tel"]) == ("甲府市丸の内1-1", "055-900-1111")
        assert b["shop_name"] == "鳥もつ煮奥藤"
        # second section's area carried onto its rows
        assert (c["area_name"], c["tel"]) == ("富士吉田市", None)
        assert res.links == []  # no pagination (yamanashi.py:14-15)


class TestYamaguchi:
    def test_area_seeds_and_strong_labels(self):
        from goto_eater_crawler_ray.sites.yamaguchi import AREA_LIST, seeds

        assert len(AREA_LIST) == 8  # yamaguchi.py:17-26
        rows = seeds()
        assert rows[0]["url"].endswith("cat_area%5B%5D=01-shop-area")
        assert rows[0]["meta"] == {"area_name": "岩国エリア"}

        url, body = fixtures.pages()["yamaguchi"][0]
        from goto_eater_crawler_ray.sites.yamaguchi import parse

        res = parse(url, body, {"area_name": "下関エリア"}, 0)
        a, b = res.items
        assert (a["shop_name"], a["area_name"]) == ("瓦そば本店たかせ", "下関エリア")
        assert a["genre_name"] == "そば|郷土料理"  # ● stripped (yamaguchi.py:41-42)
        assert (a["address"], a["opening_hours"], a["closing_day"]) == ("下関市豊浦町川棚1-1", "11:00-20:00", "木曜")
        assert a["tel"] == "083-900-1111"
        assert a["official_page"] == "http://takase.example"  # first rink only
        assert b["official_page"] is None
        # pagination keeps the area meta (yamaguchi.py:71)
        assert res.links[0]["meta"] == {"area_name": "下関エリア"}

    def test_last_page_stops(self):
        assert _parse("yamaguchi", 1).links == []


class TestTokyoGnavi:
    def test_list_fans_out(self):
        res = _parse("tokyo_gnavi", 0)
        assert res.items == []
        assert [l["url"] for l in res.links[:2]] == [
            "https://r.gnavi.co.jp/g0001/",
            "https://r.gnavi.co.jp/g0002/",
        ]
        assert all(l["callback"] == "detail" for l in res.links[:2])
        assert res.links[2]["url"].endswith("&p=2")

    def test_detail_data_o_and_breadcrumb(self):
        res = _parse("tokyo_gnavi", 1)  # content-routed
        (a,) = res.items
        assert a["shop_name"] == "江戸前寿司つきじ宮川"
        assert a["area_name"] == "銀座・有楽町・築地"  # breadcrumb after 東京
        assert a["tel"] == "03-900-1111"
        # data-o JSON {"a": host, "b": scheme} -> b://a (tokyo_gnavi.py:105-111)
        assert a["official_page"] == "https://miyagawa.example/sushi"
        assert (a["zip_code"], a["address"]) == ("104-0045", "東京都中央区築地1-1")
        assert a["opening_hours"] == "11:00-22:00"
        assert a["closing_day"] == "月曜\n第3火曜"  # newline-joined
        assert a["genre_name"] == "寿司|海鮮"

    def test_commercial_courtesy_delay(self):
        from goto_eater_crawler_ray.sites.tokyo_gnavi import SPEC

        assert SPEC.crawl_delay_s == 1.0  # tokyo_gnavi.py:21-28


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
            for url, body in fixtures.pages().get(spec.name, []):
                res = spec.callbacks["parse"](url, body, {}, 0)
                for kind, text, ref in res.spans:
                    assert kind in ("text", "link", "pdf")
                    assert isinstance(text, str) and isinstance(ref, str)


@pytest.mark.usefixtures("ray_session")
class TestSiteItemsQuery:
    def test_site_items_query(self):
        from goto_eater_crawler_ray.pipelines.queries import q_site_items

        out = q_site_items("unused").to_pandas()
        # tochigi 2+1, niigata 2+1, fukuoka 3, yamagata 2+1, miyagi 4,
        # saitama 3, osaka 2+1, gunma 2+1, akita 2, nara 2, tokyo 0+4,
        # nagasaki 2+1, hokkaido 0+2+1, oita 2, kyoto 0+1, kagawa 2+1,
        # aichi 2+1, hyogo 2+1, chiba (liny) 2, kochi 3, shimane 0+1,
        # toyama 2+1, tottori 2+1
        # ... aomori 2+1, fukui 0+1, ehime 2+1, fukushima 2+1, gifu 0+1,
        # hiroshima 2+1, ibaraki 2+1, ishikawa 2+1, iwate 2, kagoshima 0+2,
        # kumamoto 2+1, mie 0+1, miyazaki 2+1, nagano 2+1, okayama 2+1,
        # okinawa 2+1, saga 2+1, tokushima 2+1, shizuoka 2+1,
        # shizuoka_blue 2+1, wakayama 2+1, yamanashi 3, yamaguchi 2+1,
        # tokyo_gnavi 0+1
        assert len(out) == (
            2 + 1 + 2 + 1 + 3 + 2 + 1 + 4 + 3 + 2 + 1 + 2 + 1 + 2 + 2 + 4 + 3 + 3 + 2 + 1 + 3 + 3 + 3 + 2
            + 3 + 1 + 3 + 3 + 3 + 1 + 3 + 3 + 1 + 3 + 3 + 3 + 2 + 2 + 3 + 1 + 3 + 3 + 3 + 3 + 3 + 3
            + 3 + 3 + 3 + 3 + 3 + 1
        )
        assert set(out["prefecture"]) == {
            "tochigi", "niigata", "fukuoka", "yamagata", "miyagi", "saitama",
            "osaka", "gunma", "akita", "nara", "tokyo", "nagasaki", "hokkaido",
            "oita", "kyoto", "kagawa", "aichi", "hyogo", "chiba", "kochi",
            "shimane", "toyama", "tottori", "aomori", "fukui", "ehime",
            "fukushima", "gifu", "hiroshima", "ibaraki", "ishikawa", "iwate",
            "kagoshima", "kumamoto", "mie", "miyazaki", "nagano", "okayama",
            "okinawa", "saga", "tokushima", "shizuoka", "shizuoka_blue",
            "wakayama", "yamanashi", "yamaguchi", "tokyo_gnavi",
        }
        # 3 latlng rows: unique-match x2 + the 2-marker card (first marker
        # wins, reference miyagi.py:113-119 behavior)
        assert out[out["prefecture"] == "miyagi"]["provided_lat"].notna().sum() == 3
