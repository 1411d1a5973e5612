"""Unit vectors for every scalar extractor family (SURVEY.md §2.3),
including the reference's quirk cases cited there."""

import pytest

from goto_eater_crawler_ray.functions.extract import (
    classify_tag,
    decode_js_object,
    extract_latlng,
    join_genres,
    map_code,
    normalize_tel,
    scrub_whitespace,
    split_name_genre,
    split_zip_address,
)


class TestZipAddress:
    def test_spaced(self):
        # tochigi.py:32-40 family
        assert split_zip_address("〒320-0806 宇都宮市中央1-1") == ("320-0806", "宇都宮市中央1-1")

    def test_space_after_mark(self):
        # aichi.py:33-36 `〒\s*`
        assert split_zip_address("〒 460-0008 名古屋市中区栄") == ("460-0008", "名古屋市中区栄")

    def test_zero_space(self):
        # shizuoka.py:30-34 zero-space variant
        assert split_zip_address("〒420-0853静岡市葵区追手町") == ("420-0853", "静岡市葵区追手町")

    def test_no_zip_fallback(self):
        # tochigi.py:38-40 no-zip rows
        assert split_zip_address("宇都宮市中央1-1") == (None, "宇都宮市中央1-1")

    def test_none(self):
        assert split_zip_address(None) == (None, None)
        assert split_zip_address("") == (None, None)


class TestTel:
    @pytest.mark.parametrize(
        "raw",
        [
            "028-123-4567",
            "TEL:028-123-4567",  # okinawa.py:27
            "TEL.028-123-4567",  # gunma.py:37
            "tel:028-123-4567",  # tottori.py:29
            "TEL : 028-123-4567",  # yamagata.py:100
        ],
    )
    def test_prefix_strip(self, raw):
        assert normalize_tel(raw) == "028-123-4567"

    def test_regex_extract_from_noise(self):
        # iwate.py:73-75 regex extract from surrounding text
        assert normalize_tel("電話 019-624-1234 (代表)") == "019-624-1234"

    def test_none(self):
        assert normalize_tel(None) is None
        assert normalize_tel("") is None


class TestGenres:
    def test_ja_comma(self):
        # fukui.py:54 、 -> |
        assert join_genres("寿司、カフェ") == "寿司|カフェ"

    def test_fullwidth_pipe(self):
        # kagawa.py:28-33 ｜ -> |
        assert join_genres("寿司｜カフェ") == "寿司|カフェ"

    def test_comma_split_rejoin(self):
        # tokushima.py:24-28
        assert join_genres("寿司, カフェ ,定食") == "寿司|カフェ|定食"

    def test_bullet_strip(self):
        # yamaguchi.py:40-41 ●-strip
        assert join_genres("●寿司、●カフェ") == "寿司|カフェ"

    def test_empty(self):
        assert join_genres("") is None
        assert join_genres("、、") is None


class TestLatLng:
    def test_at_form(self):
        # tochigi.py:47-54 /@lat,lng,zoom
        assert extract_latlng("https://maps.example.com/maps/@36.5,139.8,15z/data=x") == ("36.5", "139.8")

    def test_q_form(self):
        # kyoto.py:84-88 q=lat,lng
        assert extract_latlng("https://maps.example.com/maps?q=35.01,135.76") == ("35.01", "135.76")

    def test_marker_form(self):
        # tokyo_gnavi.py:145-149 static-map markers
        assert extract_latlng("https://maps.example.com/staticmap?markers=35.6,139.7&zoom=1") == ("35.6", "139.7")

    def test_no_match(self):
        assert extract_latlng("https://example.com/") == (None, None)
        assert extract_latlng(None) == (None, None)


class TestNameGenre:
    def test_fullwidth_slash(self):
        # miyazaki.py:24-28
        assert split_name_genre("居酒屋ほたる／居酒屋") == ("居酒屋ほたる", "居酒屋")

    def test_plain_slash(self):
        assert split_name_genre("Cafe Mocha/カフェ") == ("Cafe Mocha", "カフェ")

    def test_no_slash(self):
        assert split_name_genre("そのまま店名") == ("そのまま店名", None)


class TestMisc:
    def test_scrub_whitespace(self):
        # osaka.py:73, hyogo.py:27
        assert scrub_whitespace("大阪市 北区\t梅田 1-1") == "大阪市北区梅田1-1"

    def test_classify_tag(self):
        # niigata.py:78-89 area-vs-genre membership
        areas = frozenset({"新潟市", "長岡市"})
        assert classify_tag("新潟市", areas) == ("新潟市", None)
        assert classify_tag("ラーメン", areas) == (None, "ラーメン")
        assert classify_tag(None, areas) == (None, None)

    def test_map_code(self):
        # fukuoka.py:20-37,65
        table = ["和食", "洋食", "中華"]
        assert map_code(1, table) == "洋食"
        assert map_code("2", table) == "中華"
        assert map_code(99, table) is None
        assert map_code("x", table) is None

    def test_decode_js_object(self):
        # miyagi.py:71-86 demjson-style tolerant decode
        src = "[{name: 'A店', address: '仙台市青葉区', lat: 38.26, lng: 140.87,}, {name: 'B', address: 'X', lat: 1, lng: 2}]"
        out = decode_js_object(src)
        assert out[0]["name"] == "A店"
        assert out[0]["lat"] == 38.26
        assert len(out) == 2

    def test_decode_js_object_apostrophes_survive(self):
        # the reference uses demjson precisely because real pages contain
        # apostrophes inside strings; a naive global quote swap corrupts them
        src = "{name: 'Bob''s diner', note: \"it's fine\", alt: 'say \"hi\"',}".replace("''", "\\'")
        out = decode_js_object(src)
        assert out["name"] == "Bob's diner"
        assert out["note"] == "it's fine"
        assert out["alt"] == 'say "hi"'

    def test_decode_js_object_braces_inside_strings(self):
        # key-quoting / trailing-comma regexes must not fire inside strings
        src = "{tpl: '{x: 1,}', n: 2}"
        out = decode_js_object(src)
        assert out["tpl"] == "{x: 1,}"
        assert out["n"] == 2


class TestGeoMesh:
    # the reference's own self-test ring (abstract_liny.py:69-87)
    REF_RING = [
        [
            [140.1125, 35.5416666666667],
            [140.125, 35.5416666666667],
            [140.125, 35.55],
            [140.1125, 35.55],
            [140.1125, 35.5416666666667],
        ]
    ]

    def test_reference_vector(self):
        from goto_eater_crawler_ray.functions.geomesh import mesh_bbox

        x1, x2, y1, y2 = mesh_bbox(self.REF_RING)
        assert x1 == 35.5416666666667
        assert x2 == 35.55
        assert y1 == 140.1125
        assert y2 == 140.125

    def test_seed_rows_from_geojson(self):
        from goto_eater_crawler_ray.functions.geomesh import mesh_seed_rows

        geojson = {
            "type": "FeatureCollection",
            "features": [
                {"id": 7, "geometry": {"type": "Polygon", "coordinates": self.REF_RING}},
                {
                    "id": 8,
                    "geometry": {
                        "type": "Polygon",
                        "coordinates": [[[139.0, 36.0], [139.0125, 36.0], [139.0125, 36.0083], [139.0, 36.0083], [139.0, 36.0]]],
                    },
                },
            ],
        }
        rows = mesh_seed_rows(geojson, "https://liny.example/api/shops")
        assert len(rows) == 2
        assert rows[0]["url"] == "https://liny.example/api/shops?x1=35.5416666666667&x2=35.55&y1=140.1125&y2=140.125"
        assert rows[1]["meta"]["mesh_id"] == "8"

    def test_batch_form(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.geomesh import mesh_seeds_batch

        ds = rd.from_items([{"coordinates": self.REF_RING}] * 3)
        out = ds.map_batches(mesh_seeds_batch("https://liny.example/api"), batch_format="pyarrow").to_pandas()
        assert len(out) == 3
        assert out["url"].str.contains("x1=35.5416666666667").all()


class TestRegistry:
    def test_builtin_families(self):
        from goto_eater_crawler_ray.registry import builtin_registry

        reg = builtin_registry()
        assert "paginated" in reg.names()
        assert reg.get("paginated7") is not None  # per-site name -> family spec
        assert reg.get("mesh").is_mega_host

    def test_register_custom_site(self):
        from goto_eater_crawler_ray.registry import ParserRegistry, ParserSpec
        from goto_eater_crawler_ray.stages.parse import ParseResult

        def my_parse(url, body, meta, depth):
            res = ParseResult()
            res.items.append({"shop_name": body.decode()})
            return res

        reg = ParserRegistry()
        reg.register(ParserSpec(name="mysite", family="mysite", callbacks={"parse": my_parse}, crawl_delay_s=1.5))
        out = reg.parse("mysite", "parse", "http://x/", b"hello", {}, 0)
        assert out.items[0]["shop_name"] == "hello"

    def test_duplicate_rejected(self):
        from goto_eater_crawler_ray.registry import ParserRegistry, ParserSpec

        reg = ParserRegistry()
        reg.register(ParserSpec(name="a", family="a"))
        import pytest as _pytest

        with _pytest.raises(ValueError):
            reg.register(ParserSpec(name="a", family="a"))


class TestOverrides:
    def test_rule_shapes(self):
        import pyarrow as pa

        from goto_eater_crawler_ray.functions.overrides import OverrideRule, apply_overrides

        tbl = pa.table(
            {
                "prefecture": ["src1", "src1", "src2", "src1"],
                "shop_name": ["<broken>", "", "keep", None],
                "address": ["中央1-1", "鹿児島市旭町2", "x", "y"],
            }
        )
        rules = (
            OverrideRule(source="src1", field="shop_name", match="<broken>", replace="fixed"),
            OverrideRule(source="src1", field="shop_name", match=None, replace="filled"),
            OverrideRule(source="src1", field="address", prefix="鹿児島市"),
        )
        out = apply_overrides(tbl, rules).to_pylist()
        assert out[0]["shop_name"] == "fixed"
        assert out[1]["shop_name"] == ""  # match="" not in rules -> untouched
        assert out[2]["shop_name"] == "keep"  # other source untouched
        assert out[3]["shop_name"] == "filled"  # null matched
        assert out[0]["address"] == "鹿児島市中央1-1"
        assert out[1]["address"] == "鹿児島市旭町2"  # already prefixed
        assert out[2]["address"] == "x"  # other source

    def test_missing_columns_noop(self):
        import pyarrow as pa

        from goto_eater_crawler_ray.functions.overrides import apply_overrides

        t = pa.table({"a": [1]})
        assert apply_overrides(t).equals(t)
