"""Deterministic reference-DOM-shaped fixture pages for the concrete site
specs.  Content is synthetic; STRUCTURE mirrors each reference spider's
page (cited per site module).  Used by the per-site golden pytest and the
``site_items`` query entry — both must see every quirk branch:
zip-present/absent, genre-absent, multi-genre tags, latlng present/absent,
and the miyagi 0/1/2-marker-match join cases.
"""

from __future__ import annotations

TOCHIGI_PAGE_1 = """
<html><body><div id="contents">
<ul class="serch_result">
  <li>
    <p class="name">鳥料理とちの木 <span class="genre">和食</span></p>
    <div class="add"><p>〒320-0033 宇都宮市本町1-1</p><p><a href="tel:0286001111">028-600-1111</a></p></div>
    <ul class="hp"><li><a href="http://tochinoki.example">ホームページ</a></li>
        <li><a href="https://www.google.co.jp/maps/place/x/@36.5658,139.8836,17z/data=!3m1">GoogleMap</a></li></ul>
  </li>
  <li>
    <p class="name">日本海庄や 宇都宮本店</p>
    <div class="add"><p>宇都宮市駅前通り2-2</p><p><a>028-600-2222</a></p></div>
    <ul class="hp"><li><a href="https://www.google.com/maps/@36.5,139.9,15z/datax">GoogleMap</a></li></ul>
  </li>
</ul>
<ul><li class="next"><a href="/merchant/index.php?page=2">次の一覧</a></li></ul>
</div></body></html>
"""

TOCHIGI_PAGE_LAST = """
<html><body><div id="contents">
<ul class="serch_result">
  <li>
    <p class="name">カフェ・ド・餃子 <span class="genre g2">カフェ</span></p>
    <div class="add"><p>〒321-0953 宇都宮市東宿郷3-3</p><p><a href="tel:0286003333">028-600-3333</a></p></div>
    <ul class="hp"></ul>
  </li>
</ul>
</div></body></html>
"""

NIIGATA_PAGE_1 = """
<html><body><div id="result">
  <div class="cont">
    <h4>へぎそば処 <a href="http://hegisoba.example">つばめ庵</a></h4>
    <p class="add">〒950-0088 新潟市中央区万代1-1<span><a href="https://maps.example/@37.9161,139.0364,17z">地図</a></span></p>
    <p class="tel">025-700-1111</p>
    <div class="tag"><span>新潟市中央区</span><span>和食</span><span>そば</span></div>
  </div>
  <div class="cont">
    <h4>ジョリーパスタ長岡今朝白店</h4>
    <p class="add">長岡市今朝白9-9</p>
    <p class="tel">0258-700-2222</p>
    <div class="tag"><span>長岡市</span><span>イタリアン</span></div>
  </div>
</div>
<div id="pagination"><ul><li class="prev"><a onclick="mySubmit('https://niigata-gte.com/shop/?p=0');">前へ</a></li>
<li class="next"><a onclick="mySubmit('https://niigata-gte.com/shop/?p=2');">次へ</a></li></ul></div>
</body></html>
"""

NIIGATA_PAGE_LAST = """
<html><body><div id="result">
  <div class="cont">
    <h4>佐渡の磯亭</h4>
    <p class="add">〒952-0011 佐渡市両津夷5-5</p>
    <p class="tel">0259-700-3333</p>
    <div class="tag"><span>佐渡市</span><span>海鮮</span></div>
  </div>
</div>
<div id="pagination"><ul><li class="prev"><a onclick="mySubmit('https://niigata-gte.com/shop/?p=1');">前へ</a></li></ul></div>
</body></html>
"""

FUKUOKA_CSV = (
    "﻿11.店舗情報：店舗名,13.店舗情報ジャンル,14.店舗住所：郵便番号,16.店舗住所：市町村,"
    "17.店舗住所：町域、番地,18.店舗住所：建物名,19.店舗情報：電話番号,20.店舗ホームページ\n"
    "博多やまもと亭,1,812-0011,福岡市博多区,博多駅前1-1,駅前ビル2F,092-800-1111,http://yamamototei.example\n"
    "中華楼はかた,3,812-0012,福岡市博多区,住吉2-2,,092-800-2222,\n"
    "うどん平助,14,810-0001,福岡市中央区,天神3-3,,092-800-3333,http://heisuke.example\n"
)

YAMAGATA_PAGE_1 = {
    "html": (
        '<li><ul class="search__result__tag"><li>鶴岡市</li><li>和食・寿司・天ぷら</li></ul>'
        "<h2>和食ふじ乃</h2><div>997-0034 山形県鶴岡市本町2-15</div><div>TEL : 0235-800-1111</div></li>"
        '<li><ul class="search__result__tag"><li>山形市</li><li>ラーメン</li></ul>'
        '<h2><a href="http://ramen-zao.example">らーめん蔵王</a></h2><div>990-0039 山形県山形市香澄町4-4</div><div>TEL : 023-800-2222</div></li>'
    ),
    "pager": (
        '<div class="search__pager"><div class="search__pager__link seach__pager__small" data-page="1">最初へ</div>'
        '<div class="search__pager__link seach__pager__btn" data-page="1">前へ</div>'
        '<ul><li class="search__pager__link active" data-page="1">1</li><li class="search__pager__link" data-page="2">2</li></ul>'
        '<div class="search__pager__link search__pager__btn" data-page="2">次へ</div>'
        '<div class="search__pager__link seach__pager__small" data-page="2">最後へ</div></div>'
    ),
}

YAMAGATA_PAGE_LAST = {
    "html": (
        '<li><ul class="search__result__tag"><li>酒田市</li><li>カフェ</li></ul>'
        "<h2>エノテーカ</h2><div>山形県酒田市中町1-1</div><div>TEL : 0234-800-3333</div></li>"
    ),
    "pager": (
        '<div class="search__pager"><ul><li class="search__pager__link active" data-page="2">2</li></ul>'
        '<div class="search__pager__link search__pager__btn" data-page="2">次へ</div></div>'
    ),
}

MIYAGI_PAGE = """
<html><body>
<div class="wrap"><div class="cont"><h2><span>利用可能店舗 [ 仙台市青葉区 ]</span></h2></div></div>
<script>
const data = [
  {name: '牛たん仙臺屋', content: '〒980-0021 仙台市青葉区中央1-1 Bob\\'s ビル1F', lat: 38.2601, lng: 140.8821},
  {name: '定食のまるよし', content: '〒980-0022 仙台市青葉区五橋2-2', lat: 38.2533, lng: 140.8754},
  {name: 'カフェ青葉', content: '〒980-0023 仙台市青葉区北目町3-3', lat: 38.25, lng: 140.87},
  {name: 'カフェ青葉', content: '〒980-0024 仙台市青葉区土樋4-9 カフェ青葉支店', lat: 38.24, lng: 140.86},
];
</script>
<div class="SLCont">
  <dl class="shopList"><dt>牛たん仙臺屋</dt>
    <dd><span>ジャンル:</span><span>焼肉</span></dd>
    <dd><span>住所:</span><span>〒980-0021 仙台市青葉区中央1-1</span></dd>
    <dd><span>TEL:</span><span>022-900-1111</span></dd>
    <dd><span>URL:</span><span class="url">http://sendaiya.example</span></dd></dl>
  <dl class="shopList"><dt>定食のまるよし</dt>
    <dd><span>ジャンル:</span><span>定食</span></dd>
    <dd><span>住所:</span><span>〒980-0022 仙台市青葉区五橋2-2</span></dd>
    <dd><span>TEL:</span><span>022-900-2222</span></dd>
    <dd><span>URL:</span><span class="url"></span></dd></dl>
  <dl class="shopList"><dt>カフェ青葉</dt>
    <dd><span>ジャンル:</span><span>カフェ</span></dd>
    <dd><span>住所:</span><span>〒980-0023 仙台市青葉区</span></dd>
    <dd><span>TEL:</span><span>022-900-3333</span></dd>
    <dd><span>URL:</span><span class="url"></span></dd></dl>
  <dl class="shopList"><dt>未掲載食堂</dt>
    <dd><span>ジャンル:</span><span>食堂</span></dd>
    <dd><span>住所:</span><span>〒980-0025 仙台市青葉区花京院5-5</span></dd>
    <dd><span>TEL:</span><span>022-900-4444</span></dd>
    <dd><span>URL:</span><span class="url"></span></dd></dl>
</div>
</body></html>
"""


SAITAMA_PAGE = """
<html><body>
<div class="tab_content">
  <div class="aria_genre">和食</div>
  <div class="aria_store_content">
    <div class="storebox"><span>川越亭</span><span></span><span>350-0041</span><span>川越市六軒町1-1</span><span>049-900-1111</span><span><a href="http://kawagoetei.example">HP</a></span></div>
    <div class="storebox"><span>うなぎ藤棚</span><span></span><span>350-0043</span><span>川越市新富町2-2</span><span>049-900-2222</span><span></span></div>
  </div>
</div>
<div class="tab_content">
  <div class="aria_genre">カフェ</div>
  <div class="aria_store_content">
    <div class="storebox"><span>喫茶ひばり</span><span></span><span>350-0045</span><span>川越市南通町3-3</span><span>049-900-3333</span><span></span></div>
  </div>
</div>
</body></html>
"""


def pages() -> dict[str, list[tuple[str, bytes]]]:
    """site name -> [(url, body bytes), ...] in crawl order."""
    import json

    return {
        "tochigi": [
            ("https://www.gotoeat-tochigi.jp/merchant/index.php", TOCHIGI_PAGE_1.encode()),
            ("https://www.gotoeat-tochigi.jp/merchant/index.php?page=2", TOCHIGI_PAGE_LAST.encode()),
        ],
        "niigata": [
            ("https://niigata-gte.com/shop/", NIIGATA_PAGE_1.encode()),
            ("https://niigata-gte.com/shop/?p=2", NIIGATA_PAGE_LAST.encode()),
        ],
        "fukuoka": [("https://gotoeat-fukuoka.jp/csv/fk_gotoeat_UTF-8.csv", FUKUOKA_CSV.encode())],
        "yamagata": [
            ("https://yamagata-gotoeat.com/wp/wp-content/themes/gotoeat/search.php", json.dumps(YAMAGATA_PAGE_1).encode()),
            ("https://yamagata-gotoeat.com/wp/wp-content/themes/gotoeat/search.php#2", json.dumps(YAMAGATA_PAGE_LAST).encode()),
        ],
        "miyagi": [("https://gte-miyagi.jp/gte/available_aobaku.php", MIYAGI_PAGE.encode())],
        "saitama": [("https://saitama-goto-eat.com/store/川越市.html", SAITAMA_PAGE.encode())],
    }
