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


OSAKA_PAGE_1 = """
<html><body>
<div class="search_result_box"><ul>
  <li>
    <p class="name">たこ焼き道頓堀 総本店</p>
    <ul class="tag_list"><li>ミナミ</li><li>たこ焼き</li><li>粉もん</li></ul>
    <table>
      <tr><td>〒542-0071<br>大阪市中央区 道頓堀1-1</td></tr>
      <tr><td>06-900-1111</td></tr>
      <tr><td>11:00-22:00</td></tr>
      <tr><td>水曜</td></tr>
    </table>
    <a href="https://goto-eat.weare.osaka-info.jp/shop/1111/"> 詳しく見る </a>
  </li>
  <li>
    <p class="name"></p>
    <ul class="tag_list"><li>キタ</li><li>中華料理</li></ul>
    <table>
      <tr><td>〒530-0001<br>大阪市北区梅田2-2</td></tr>
      <tr><td>06-900-2222</td></tr>
    </table>
  </li>
</ul></div>
<div role="navigation"><a rel="next" href="https://goto-eat.weare.osaka-info.jp/gotoeat/page/2/">&gt;</a></div>
</body></html>
"""

OSAKA_PAGE_LAST = """
<html><body>
<div class="search_result_box"><ul>
  <li>
    <p class="name">串かつ 泉州屋</p>
    <ul class="tag_list"><li>泉州</li><li>串かつ</li></ul>
    <table>
      <tr><td>〒598-0007<br>泉佐野市上町3-3</td></tr>
      <tr><td>072-900-3333</td></tr>
    </table>
  </li>
</ul></div>
<div role="navigation"></div>
</body></html>
"""

GUNMA_PAGE_1 = """
<html><body><section id="result">
  <article>
    <div><span>前橋市</span></div>
    <div><span class="shopcat">焼きまんじゅう</span><h3>原嶋屋総本家</h3>
      <p class="shopadr"><span>〒371-0025</span>前橋市紅雲町2-2</p>
      <p class="shoptel">TEL.027-900-1111</p>
      <div class="shopinfo"><a href="/shop/1/">詳細</a><a href="http://harashimaya.example">公式</a></div></div>
  </article>
  <article>
    <div><span>高崎市</span></div>
    <div><h3>登利平 本店</h3>
      <p class="shopadr"><span>〒370-0827</span>高崎市鞘町3-3</p>
      <div class="shopinfo"><a href="/shop/2/">詳細</a></div></div>
  </article>
</section>
<div id="search_page_outer"><a class="next page-numbers" href="https://gunma-gotoeat-campaign.com/shop/page/2/?s=&amp;post_type=shop">&gt;</a></div>
</body></html>
"""

GUNMA_PAGE_LAST = """
<html><body><section id="result">
  <article>
    <div><span>桐生市</span></div>
    <div><span class="shopcat">ひもかわ</span><h3>ふる川 暮六つ</h3>
      <p class="shopadr"><span>〒376-0031</span>桐生市本町4-4</p>
      <p class="shoptel">TEL.0277-900-3333</p>
      <div class="shopinfo"><a href="/shop/3/">詳細</a></div></div>
  </article>
</section>
<div id="search_page_outer"></div>
</body></html>
"""

# akita list.csv: NO header; 店舗名,市町村,所在地,電話番号,公式ホームページ —
# furigana comments in names, backfilled-comment addresses, an
# empty-address row that must drop, and short rows that fillna to ""
AKITA_CSV = (
    "きりたんぽ亭<!--きりたんぽてい-->,秋田市,秋田市中通1-1,018-900-1111,http://kiritanpo.example\n"
    "比内やきとり,大館市,,0186-900-2222,\n"
    "稲庭うどん乾,湯沢市,<!--湯沢市稲庭町乾1-1-->,0183-900-3333\n"
)

# nara 利用店舗一覧.xlsx: FAKE-XLSX TSV fake WITH the reference's header
# row (sheet リスト); a name with an embedded newline marker and blank
# tel/URL cells that fillna to ""
NARA_XLSX = (
    "FAKE-XLSX sheet=リスト\n"
    "エリア\t店舗名称\tカテゴリー\t住所\t電話番号\tURL\n"
    "奈良市 \t柿の葉すし本舗\t和食 \t奈良市角振町5-5 \t0742-900-1111\thttp://kakinoha.example\n"
    "橿原市\t大和鶏白湯めん処\tラーメン\t橿原市内膳町6-6\t\t\n"
)

TOKYO_INDEX_PAGE = """
<html><body><section id="c-search__pdf"><ul>
  <li><a href="https://pr.gnavi.co.jp/promo/gotoeat-tokyo/pdf/shop1.pdf"> 加盟店一覧1 </a></li>
  <li><a href="https://pr.gnavi.co.jp/promo/gotoeat-tokyo/pdf/shop4.pdf">加盟店一覧4</a></li>
</ul></section></body></html>
"""

# fake PDF: form-feed-separated per-page tables exercising every repair
# branch — normal header page, headerless 7-column page, URL-less page
# with a header echo row and a blank-name row
TOKYO_PDF_SHOP1 = (
    "紙,電子,飲食店名,店舗住所,店舗電話番号,URL,業態\n"
    "○,○,銀座すし勘,中央区銀座1-1,03-900-1111,http://sushikan.example,寿司\n"
    "○,,洋食キムラヤ,台東区上野2-2,03-900-2222,,洋食\n"
    "\f"
    "○,○,神田やぶそば,千代田区神田3-3,03-900-3333,http://yabu.example,そば\n"
    ",,,,,,\n"
    "\f"
    "飲食店名,店舗住所,店舗電話番号,業態\n"
    "飲食店名,店舗住所,店舗電話番号,業態\n"
    "権八西麻布,港区西麻布4-4,03-900-4444,居酒屋\n"
    "もんじゃ浜膳,,03-900-5555,もんじゃ\n"
)


NAGASAKI_PAGE_1 = """
<html><body><section id="shop-list">
  <div class="shop-list-content">
    <div class="shop-list-content-name"> 卓袱浜勝 </div>
    <div class="shop-list-content-area">長崎<wbr>市内</div>
    <div class="shop-list-content-cat">和食・<wbr>卓袱</div>
    <div class="shop-list-content-add-002"> 長崎市鍛冶屋町1-1 </div>
    <div class="shop-list-content-tel-002">095-900-1111</div>
    <div class="shop-list-content-url"><a href="http://hamakatsu.example">WEB</a></div>
  </div>
  <div class="shop-list-content">
    <div class="shop-list-content-name">トルコライス赤迫亭</div>
    <div class="shop-list-content-area">長崎市内</div>
    <div class="shop-list-content-cat">洋食</div>
    <div class="shop-list-content-add-002">長崎市赤迫2-2</div>
  </div>
</section>
<div class="pagination"><a class="next" href="https://www.gotoeat-nagasaki.jp/merchant-list/page/2/">&gt;</a></div>
</body></html>
"""

NAGASAKI_PAGE_LAST = """
<html><body><section id="shop-list">
  <div class="shop-list-content">
    <div class="shop-list-content-name">五島うどん庵</div>
    <div class="shop-list-content-area">五島</div>
    <div class="shop-list-content-cat">うどん</div>
    <div class="shop-list-content-add-002">五島市福江町3-3</div>
    <div class="shop-list-content-tel-002">0959-900-3333</div>
  </div>
</section>
<div class="pagination"></div>
</body></html>
"""

HOKKAIDO_TOKEN_PAGE = """
<html><body><form action="/general/particStores/search" method="post">
<p class="buttons"><input type="hidden" name="_token" value="tok-hokkaido-123"><input type="submit" value="検索する"></p>
</form></body></html>
"""

HOKKAIDO_RESULT_PAGE_1 = """
<html><body><div id="contents"><div class="results"><ul>
  <li><div class="left"><h4 class="results-tit"> スープカレー奥芝 </h4><p class="results-txt01"> 札幌市中央区南1条1-1 </p></div>
      <div class="right"><p class="results-txt02"> スープカレー </p><p class="results-txt03"> 011-900-1111 </p></div></li>
  <li><div class="left"><h4 class="results-tit">小樽なると屋</h4><p class="results-txt01">小樽市稲穂2-2</p></div>
      <div class="right"><p class="results-txt02">鶏料理</p></div></li>
</ul></div></div>
<ul role="navigation"><li><a rel="next" href="https://gotoeat-hokkaido.jp/general/particStores/search?page=2">次</a></li></ul>
</body></html>
"""

HOKKAIDO_RESULT_PAGE_LAST = """
<html><body><div id="contents"><div class="results"><ul>
  <li><div class="left"><h4 class="results-tit">函館ラッキー食堂</h4><p class="results-txt01">函館市若松町3-3</p></div>
      <div class="right"><p class="results-txt02">食堂</p><p class="results-txt03">0138-900-3333</p></div></li>
</ul></div></div>
<ul role="navigation"></ul>
</body></html>
"""

# the ONE accumulated page the browser scroll loop leaves behind
OITA_PAGE = """
<html><body><ul class="shop-list cf">
  <li class="box-sh cf">
    <div class="tag cf"><p class="area"><span> 大分市 </span></p><p class="genre"><span>とり天</span><span>定食</span></p></div>
    <p class="name"> とり天発祥の店 </p>
    <div class="first"><p class="add"> 大分市中央町1-1 </p><p class="web"><a href=" http://toriten.example "> WEB </a></p></div>
    <div class="second"><p class="s-call"><span class="shoptel"><a href="tel:0979001111">097-900-1111</a></span></p></div>
  </li>
  <li class="box-sh cf">
    <div class="tag cf"><p class="area"><span>別府市</span></p><p class="genre"><span>地獄蒸し</span></p></div>
    <p class="name">地獄蒸し工房 鉄輪</p>
    <div class="first"><p class="add">別府市鉄輪2-2</p></div>
    <div class="second"><p class="s-call"></p></div>
  </li>
</ul></body></html>
"""


KYOTO_LIST_PAGE = """
<html><body><main id="main">
  <div class="store-item"><a class="btnDetail" href="/store/101/ "> 詳細 </a></div>
  <div class="store-item"><a class="btnDetail" href="https://kyoto-gotoeat.com/store/102/">詳細</a></div>
</main>
<div role="navigation"><a rel="next" href="https://kyoto-gotoeat.com/page/2/?s=">&gt;</a></div>
</body></html>
"""

KYOTO_DETAIL_PAGE = """
<html><body><main id="main"><div class="store-detail">
  <div class="name"> 湯豆腐 嵯峨乃 </div>
  <div class="store-cont">
    <table>
      <tr><th>ジャンル</th><td> 和食 </td></tr>
      <tr><th>エリア</th><td> 右京区 </td></tr>
      <tr><th>住所</th><td> 京都市右京区嵯峨天龍寺1-1 </td></tr>
      <tr><th>電話番号</th><td></td></tr>
      <tr><th>営業時間</th><td>11:00-17:00</td></tr>
      <tr><th>定休日</th><td></td></tr>
      <tr><th>U R L</th><td><a href="http://sagano.example">公式</a></td></tr>
    </table>
    <iframe src="https://maps.google.co.jp/maps?q=35.0156,135.6739&amp;output=embed"></iframe>
  </div>
</div></main></body></html>
"""

KAGAWA_PAGE_1 = """
<html><body><div class="container">
  <div class="store-list cf">
    <h4>骨付鳥 一鶴</h4>
    <table>
      <tr><th><span>エリア</span></th><td> 丸亀市 </td></tr>
      <tr><th><span>料理ジャンル</span></th><td>鶏料理｜居酒屋</td></tr>
      <tr><th><span>電話番号</span></th><td>0877-900-1111</td></tr>
      <tr><th><span>住所</span></th><td>丸亀市浜町1-1</td></tr>
    </table>
  </div>
  <div class="store-list cf">
    <h4>うどんバカ一代</h4>
    <table>
      <tr><th><span>エリア</span></th><td>高松市</td></tr>
      <tr><th><span>料理ジャンル</span></th><td>うどん</td></tr>
      <tr><th><span>電話番号</span></th><td>087-900-2222</td></tr>
      <tr><th><span>住所</span></th><td>高松市多賀町2-2</td></tr>
    </table>
  </div>
</div>
<div role="navigation"><a rel="next" href="/gtes/store-list?fstr=&amp;mode=only&amp;page=2">&gt;</a></div>
</body></html>
"""

KAGAWA_PAGE_LAST = """
<html><body><div class="container">
  <div class="store-list cf">
    <h4>和三盆カフェ豆花</h4>
    <table>
      <tr><th><span>エリア</span></th><td>高松市</td></tr>
      <tr><th><span>料理ジャンル</span></th><td>カフェ</td></tr>
      <tr><th><span>電話番号</span></th><td>087-900-3333</td></tr>
      <tr><th><span>住所</span></th><td>高松市花園町3-3</td></tr>
    </table>
  </div>
</div>
<div role="navigation"></div>
</body></html>
"""


AICHI_PAGE_1 = """
<html><body><section class="lcl-sbs__main">
<ul class="lcl-shop">
  <li class="lcl-shop__item">
    <h2 class="lcl-shop__name"> 味噌煮込みの山本屋 </h2>
    <ul class="lcl-shop-tag"><li class="lcl-shop-tag__item lcl-shop-tag__item--cat">和食</li>
        <li class="lcl-shop-tag__item lcl-shop-tag__item--area">名古屋市中区</li></ul>
    <p class="lcl-shop__address">〒 460-0008 名古屋市中区栄1-1</p>
    <a class="lcl-shop__link lcl-shop__link--tel" href="tel:0529001111">電話</a>
    <a class="lcl-shop__link lcl-shop__link--web" href="http://yamamotoya.example">WEB</a>
  </li>
  <li class="lcl-shop__item">
    <h2 class="lcl-shop__name">手羽先の風来坊</h2>
    <ul class="lcl-shop-tag"><li class="lcl-shop-tag__item lcl-shop-tag__item--cat">居酒屋</li></ul>
    <p class="lcl-shop__address">〒456-0002 名古屋市熱田区金山町2-2</p>
  </li>
</ul>
</section>
<nav class="pagination"><a class="pagination-btn pagination-btn--next" href="/shop/page/2/">次へ</a></nav>
</body></html>
"""

AICHI_PAGE_LAST = """
<html><body><section class="lcl-sbs__main">
<ul class="lcl-shop">
  <li class="lcl-shop__item">
    <h2 class="lcl-shop__name">ひつまぶし備長</h2>
    <ul class="lcl-shop-tag"><li class="lcl-shop-tag__item lcl-shop-tag__item--cat">うなぎ</li>
        <li class="lcl-shop-tag__item lcl-shop-tag__item--area">名古屋市中村区</li></ul>
    <p class="lcl-shop__address">〒453-0015 名古屋市中村区椿町3-3</p>
  </li>
</ul>
</section>
<nav class="pagination"></nav>
</body></html>
"""

HYOGO_PAGE_1 = """
<html><body><ul class="search-results-list">
  <li>
    <div><p class="search-results-list-name"> 神戸ビーフ吉祥 </p></div>
    <ul><li><span>住所：</span><span> 〒650-0001 </span><span>神戸市中央区 加納町1-1</span></li>
        <li><span>TEL：</span><span><a href="tel:0789001111">078-900-1111</a></span></li></ul>
    <div><p class="search-results-list-btn"><a href=" https://gotoeat-hyogo.com/store/detail/501?page=3 ">詳細</a></p></div>
  </li>
  <li>
    <div><p class="search-results-list-name">明石焼ふなまち</p></div>
    <ul><li><span>住所：</span><span>〒673-0892</span><span>明石市本町2-2</span></li></ul>
    <div><p class="search-results-list-btn"><a href="https://gotoeat-hyogo.com/store/detail/502?page=3">詳細</a></p></div>
  </li>
</ul>
<div><p class="search-results-num current">3</p><p class="search-results-num"><a href="https://gotoeat-hyogo.com/search/result?keyword=&amp;page=4">4</a></p></div>
</body></html>
"""

HYOGO_PAGE_LAST = """
<html><body><ul class="search-results-list">
  <li>
    <div><p class="search-results-list-name">出石そば城下庵</p></div>
    <ul><li><span>住所：</span><span>〒668-0214</span><span>豊岡市出石町3-3</span></li></ul>
    <div><p class="search-results-list-btn"><a href="https://gotoeat-hyogo.com/store/detail/503?page=4">詳細</a></p></div>
  </li>
</ul>
<div><p class="search-results-num">3</p><p class="search-results-num current">4</p></div>
</body></html>
"""


# one liny mesh-cell API response (chiba): data[] records with the
# reference's fields; empty tel/url, free-form eigyo_jikan, provided latlng
CHIBA_JSON = {
    "data": [
        {
            "name": "房総海鮮まるとみ",
            "address": "千葉市中央区富士見1-1",
            "tel": "043-900-1111",
            "url": "http://marutomi.example",
            "eigyo_jikan": "11:00〜21:00 (水曜定休)",
            "latlng": {"lat": 35.545, "lng": 140.115},
        },
        {
            "name": "勝浦タンタン軒",
            "address": "勝浦市墨名2-2",
            "tel": "",
            "url": "",
            "eigyo_jikan": "",
            "latlng": {"lat": None, "lng": None},
        },
    ]
}


# kochi: bare positional JSON array — 1=area 3=genre 5=name 7=addr 8=tel;
# includes the one angle-bracket shop name
KOCHI_JSON = [
    ["39201", "高知市", "1", "居酒屋", "x", "藁焼き龍馬亭", "わらやきりょうまてい", "高知市帯屋町1-1", "088-900-1111"],
    ["39201", "高知市", "5", "定食", "x", "<きてみいや>", "きてみいや", "高知市はりまや町2-2", "088-900-2222"],
    ["39388", "四万十市", "2", "カフェ", "x", "川のほとり珈琲", "かわのほとりこーひー", "四万十市中村3-3", ""],
]

SHIMANE_LIST_PAGE = """
<html><body><div id="main"><div class="com-location"><ul>
  <li><a href="/inshokuten/detail/801?page=2">出雲亭</a></li>
  <li><a href="https://www.gotoeat-shimane.jp/inshokuten/detail/802?page=2">松江庵</a></li>
</ul></div></div>
<nav class="pagination"><span class="next"><a rel="next" href="/inshokuten/page/3">&gt;</a></span></nav>
</body></html>
"""

SHIMANE_DETAIL_PAGE = """
<html><body>
<div class="com-location loc"><p class="area a1"><span> 出雲 </span></p></div>
<h1 class="title"> 出雲そば処 献上亭 </h1>
<div class="info line addr"><p> 出雲市大社町杵築東1-1 </p></div>
<div class="info line tel"><p> 0853-900-1111 </p></div>
<div class="info line url"><p>http://kenjotei.example</p></div>
<div class="info holidays"><p>水曜</p></div>
<div class="info select genre"><p><span>そば
 和食</span></p></div>
</body></html>
"""

TOYAMA_PAGE_1 = """
<html><body><ul class="list">
  <li class="item">
    <div class="item_header"> 寿司 </div>
    <div class="item_body"><div class="item_body_name"> 氷見きときと寿し </div>
      <div class="item_body_table">
        <div class="place"><div class="lef">住所</div><div class="rig"> 氷見市伊勢大町1-1 </div></div>
        <div class="phone"><div class="lef">電話</div><div class="rig">0766-900-1111</div></div>
        <div class="work"><div class="lef">営業</div><div class="rig">10:00-21:00</div></div>
        <div class="off_day"><div class="lef">定休</div><div class="rig">火曜</div></div>
      </div></div>
  </li>
  <li class="item">
    <div class="item_header">ます寿し</div>
    <div class="item_body"><div class="item_body_name">源 本店</div>
      <div class="item_body_table">
        <div class="place"><div class="lef">住所</div><div class="rig">富山市南央町2-2</div></div>
      </div></div>
  </li>
</ul>
<ul class="pagination_list"><li class="next_post_link"><a rel="prev" href="/shop/page/1">&lt;</a></li></ul>
</body></html>
"""

TOYAMA_PAGE_LAST = """
<html><body><ul class="list">
  <li class="item">
    <div class="item_header">ブラックラーメン</div>
    <div class="item_body"><div class="item_body_name">大喜 西町本店</div>
      <div class="item_body_table">
        <div class="place"><div class="lef">住所</div><div class="rig">富山市太田口通り3-3</div></div>
      </div></div>
  </li>
</ul>
<ul class="pagination_list"></ul>
</body></html>
"""

TOTTORI_PAGE_1 = """
<html><body><div class="row">
  <div class="store-list_v2 col-12">
    <div><p><span class="icon-area"> 鳥取市 </span></p><h2 class="mr-3 mb-1"> すなば珈琲 本店 </h2></div>
    <div><p>鳥取市末広温泉町1-1</p>
      <div class="d-flex"><a class="tel-link btn" href="tel:0857900111">電話</a>
        <a target="_blank" href="http://sunaba.example">HP</a></div></div>
    <p class="mb-0"><span class="icon-genre g1">カフェ</span><span class="icon-genre g2">喫茶</span></p>
  </div>
  <div class="store-list_v2 col-12">
    <div><p><span class="icon-area">米子市</span></p><h2 class="mr-3">かに吉</h2></div>
    <div><p>米子市角盤町2-2</p><div class="d-flex"></div></div>
    <p class="mb-0"><span class="icon-genre g3">海鮮</span></p>
  </div>
</div>
<nav role="navigation"><div class="nav-links"><a class="next page-numbers" href="https://tottori-gotoeat.jp/store_list/page/2/">&gt;</a></div></nav>
</body></html>
"""

TOTTORI_PAGE_LAST = """
<html><body><div class="row">
  <div class="store-list_v2 col-12">
    <div><p><span class="icon-area">倉吉市</span></p><h2 class="mr-3">打吹だんご茶屋</h2></div>
    <div><p>倉吉市魚町3-3</p><div class="d-flex"></div></div>
    <p class="mb-0"><span class="icon-genre g4">甘味</span></p>
  </div>
</div>
<nav role="navigation"><div class="nav-links"></div></nav>
</body></html>
"""


AOMORI_PAGE_1 = """
<html><body><div class="l-store-card">
  <div class="store-card__item">
    <h3 class="store-card__title">大間の<br>まぐろ食堂</h3>
    <p class="store-card__tag">海鮮</p>
    <table><tbody>
      <tr><th>住所：</th><td>〒039-4601 下北郡大間町大間1-1</td></tr>
      <tr><th>電話番号：</th><td>0175-900-1111</td></tr>
      <tr><th>URL：</th><td><a href="http://oma-maguro.example">公式</a></td></tr>
    </tbody></table>
    <a class="store-card__button" href="https://premium-gift.jp/aomori/use_store/detail?id=901">詳細</a>
  </div>
  <div class="store-card__item">
    <h3 class="store-card__title">味噌カレー牛乳ラーメン札幌館</h3>
    <p class="store-card__tag">ラーメン</p>
    <table><tbody>
      <tr><th>住所：</th><td>〒030-0801 青森市新町2-2</td></tr>
      <tr><th>電話番号：</th><td>-</td></tr>
    </tbody></table>
  </div>
</div>
<nav class="pagenation"><a href="javascript:on_events('page',2);">次へ</a></nav>
</body></html>
"""

AOMORI_PAGE_LAST = """
<html><body><div class="l-store-card">
  <div class="store-card__item">
    <h3 class="store-card__title">嶽きみ天ぷら茶屋</h3>
    <p class="store-card__tag">天ぷら</p>
    <table><tbody>
      <tr><th>住所：</th><td>〒036-1505 弘前市百沢東岩木山3-3</td></tr>
      <tr><th>電話番号：</th><td>0172-900-3333</td></tr>
    </tbody></table>
  </div>
</div>
<nav class="pagenation"></nav>
</body></html>
"""

FUKUI_SEARCH_PAGE = """
<html><body><div class="result"><ul>
  <li><a href="/shop/?id=180001 ">ヨーロッパ軒</a></li>
  <li><a href="https://gotoeat-fukui.com/shop/?id=180097">グルメ民宿 はまもと</a></li>
</ul></div></body></html>
"""

FUKUI_DETAIL_PAGE = """
<html><body><div id="contents">
  <h3> ヨーロッパ軒 総本店 </h3>
  <div class="icon"><span class="area"> 福井市 </span></div>
  <dl>
    <dt>ジャンル</dt><dd>洋食、カツ丼</dd>
    <dt>電　　話</dt><dd><a href="tel:0776900111"> 0776-900-1111 </a></dd>
    <dt>住　　所</dt><dd>福井市順化1-1 <a class="gmap" href="https://maps.google.com/?q=36.0652,136.2189 ">地図</a></dd>
    <dt>営業時間</dt><dd>11:00-20:00</dd>
    <dt>定 休 日</dt><dd>火曜</dd>
    <dt>HP・SNS</dt><dd>http://yo-roppaken.example</dd>
  </dl>
</div></body></html>
"""


EHIME_PAGE_1 = """
<html><body><div id="sortable"><ul class="shop_list">
  <li><div><dl><dt> 鯛めし丸水 </dt>
      <dd><ul><li><span>住所</span><span> 松山市大街道1-1 </span></li>
          <li><span><a class="tel_link" href="tel:0899001111">089-900-1111</a></span></li></ul></dd></dl>
      <p><span>郷土料理</span></p></div>
      <p class="btn_link"><a href=" https://www.goto-eat-ehime.com/shop/1001/ ">詳細</a></p></li>
  <li><div><dl><dt>八幡浜ちゃんぽん亭</dt>
      <dd><ul><li><span>住所</span><span>八幡浜市北浜2-2</span></li></ul></dd></dl>
      <p><span>ちゃんぽん</span></p></div>
      <p class="btn_link"><a href="https://www.goto-eat-ehime.com/shop/1002/">詳細</a></p></li>
</ul></div>
<div role="navigation"><a rel="next" href="https://www.goto-eat-ehime.com/shop_list/page/2/">&gt;</a></div>
</body></html>
"""

EHIME_PAGE_LAST = """
<html><body><div id="sortable"><ul class="shop_list">
  <li><div><dl><dt>道後ビール館</dt>
      <dd><ul><li><span>住所</span><span>松山市道後湯之町3-3</span></li></ul></dd></dl>
      <p><span>ビアホール</span></p></div>
      <p class="btn_link"><a href="https://www.goto-eat-ehime.com/shop/1003/">詳細</a></p></li>
</ul></div>
<div role="navigation"></div>
</body></html>
"""

FUKUSHIMA_PAGE_1 = """
<html><body><div class="block_search-result"><ul class="list_search-result">
  <li><a href="#modal1"><h3 class="result-name"><span> 円盤餃子のふくしま亭 </span></h3>
      <p class="result-address"><span> 福島市栄町1-1 </span></p>
      <p class="result-cat"><span> 餃子 </span></p></a>
    <div class="mfp-hide"><ul class="list_store-info">
      <li><span>電話</span><span>024-900-1111</span></li>
      <li><span>営業時間</span><span>17:00-23:00</span></li>
      <li><span>定休日</span><span>月曜</span></li>
      <li><span>URL</span><span><a href="http://enban-gyoza.example">公式</a></span></li>
      <li class="map-box"><iframe src="https://maps.google.com/maps?q=37.7608,140.4733&amp;output=embed"></iframe></li>
    </ul></div></li>
  <li><a href="#modal2"><h3 class="result-name"><span>喜多方ラーメン坂内</span></h3>
      <p class="result-address"><span>喜多方市細田2-2</span></p>
      <p class="result-cat"><span>ラーメン</span></p></a>
    <div class="mfp-hide"><ul class="list_store-info">
      <li><span>電話</span><span>0241-900-2222</span></li>
    </ul></div></li>
</ul></div>
<div role="navigation"><a rel="next" href="https://gotoeat-fukushima.jp/shop/page/2/?s=">NEXT</a></div>
</body></html>
"""

FUKUSHIMA_PAGE_LAST = """
<html><body><div class="block_search-result"><ul class="list_search-result">
  <li><a href="#modal3"><h3 class="result-name"><span>薄皮饅頭茶屋柏屋</span></h3>
      <p class="result-address"><span>郡山市中町3-3</span></p>
      <p class="result-cat"><span>甘味</span></p></a>
    <div class="mfp-hide"><ul class="list_store-info"></ul></div></li>
</ul></div>
<div role="navigation"></div>
</body></html>
"""

GIFU_LIST_PAGE = """
<html><body>
<table id="smp-table-26960">
  <tr class="smp-row-head"><th>No</th><th>エリア</th><th>店舗</th></tr>
  <tr class="smp-row-data"><td class="smp-cell-col-1">1</td><td class="smp-cell-col-2">岐阜</td>
      <td class="smp-cell-col-3"><a target="_self" href="/area/card/26960/abc1/M">飛騨牛まる明</a></td></tr>
  <tr class="smp-row-data"><td class="smp-cell-col-1">2</td><td class="smp-cell-col-2">高山</td>
      <td class="smp-cell-col-3"><a target="_self" href="/area/card/26960/abc2/M">高山ラーメン鍛治橋</a></td></tr>
</table>
<table class="smp-pager"><tr><td class="smp-page smp-current-page">1</td>
    <td class="smp-page"><a href="/area/table/26960/ADtah6/M?page=2">2</a></td></tr></table>
</body></html>
"""

GIFU_DETAIL_PAGE = """
<html><body><table class="smp-card-list">
  <tr><th>店舗名</th><td>飛騨牛まる明</td></tr>
  <tr><th>業態</th><td> 焼肉 </td></tr>
  <tr><th>WEB URL</th><td><a href="http://maruaki.example">HP</a></td></tr>
  <tr><th>店舗エリア</th><td> 飛騨 </td></tr>
  <tr><th>住所情報</th><td>506-0011<br>高山市本町4-4 飛騨牛まる明<br>ビル1F</td></tr>
  <tr><th>電話番号</th><td> 0577-900-1111 </td></tr>
</table></body></html>
"""

HIROSHIMA_PAGE_1 = """
<html><body><div class="result">
  <div class="result__row">
    <ul class="result__cate"><li> お好み焼 </li></ul>
    <div class="result__data"><h3><a href="http://okonomi-mura.example">お好み村 八昌</a></h3>
      <p class="result__address"> 広島市中区新天地1-1 </p></div>
  </div>
  <div class="result__row">
    <ul class="result__cate"><li>汁なし担担麺</li></ul>
    <div class="result__data"><h3>きさく 本店</h3>
      <p class="result__address">広島市中区舟入川口町2-2</p></div>
  </div>
</div>
<div role="navigation"><a rel="next" href="https://gotoeat.hiroshima.jp/page/2/?s">&raquo;</a></div>
</body></html>
"""

HIROSHIMA_PAGE_LAST = """
<html><body><div class="result">
  <div class="result__row">
    <ul class="result__cate"><li>牡蠣</li></ul>
    <div class="result__data"><h3>かき船かなわ</h3>
      <p class="result__address">広島市中区大手町3-3</p></div>
  </div>
</div>
<div role="navigation"></div>
</body></html>
"""


IBARAKI_LIST_PAGE = """
<html><body>
<table id="smp-table-27130">
  <tr class="smp-row-head"><th>ジャンル</th><th>店舗</th><th>TEL</th><th>市</th><th>住所</th></tr>
  <tr class="smp-row-data"><td> そば </td><td><a href="/area/card/27130/x1/M"> 蕎麦処 常陸庵 </a></td>
      <td>029-900-1111</td><td>水戸市</td><td>南町1-1</td></tr>
  <tr class="smp-row-data"><td>海鮮</td><td><a href="/area/card/27130/x2/M">那珂湊おさかな食堂</a></td>
      <td></td><td>ひたちなか市</td><td>湊本町2-2</td></tr>
</table>
<table class="smp-pager"><tr><td class="smp-page smp-current-page">1</td>
    <td class="smp-page"><a href="/area/table/27130/3jFZ4A/M?_page_27130=2">2</a></td></tr></table>
</body></html>
"""

IBARAKI_PAGE_LAST = """
<html><body>
<table id="smp-table-27130">
  <tr class="smp-row-data"><td>レストラン</td><td><a href="/area/card/27130/x3/M">偕楽園茶寮</a></td>
      <td>029-900-3333</td><td>水戸市</td><td>常磐町3-3</td></tr>
</table>
<table class="smp-pager"><tr><td class="smp-page">1</td><td class="smp-page smp-current-page">2</td></tr></table>
</body></html>
"""

ISHIKAWA_PAGE_1 = """
<html><body><div class="baseW"><ul class="member_list">
  <li class="member_item">
    <div class="tag_list"><div class="tag_list_item type"> 寿司 </div><div class="tag_list_item city"> 金沢市 </div></div>
    <h4 class="name"> 近江町市場寿し </h4>
    <div class="address"><div class="post">〒920-0907</div><div class="content"><p>金沢市青草町
   88番地</p></div></div>
    <div class="tel">TEL.076-900-1111</div>
  </li>
  <li class="member_item">
    <div class="tag_list"><div class="tag_list_item type">カフェ</div><div class="tag_list_item city">輪島市</div></div>
    <h4 class="name">朝市カフェ輪島</h4>
    <div class="address"><div class="post">〒928-0001</div><div class="content"><p>輪島市河井町2-2</p></div></div>
  </li>
</ul></div>
<div class="page_nation"><a class="next page-numbers" href="/page/2/?cities=&amp;type=&amp;s=&amp;post_type=member_store">&gt;</a></div>
</body></html>
"""

ISHIKAWA_PAGE_LAST = """
<html><body><div class="baseW"><ul class="member_list">
  <li class="member_item">
    <div class="tag_list"><div class="tag_list_item type">おでん</div><div class="tag_list_item city">金沢市</div></div>
    <h4 class="name">金沢おでん赤玉</h4>
    <div class="address"><div class="post">〒920-0981</div><div class="content"><p>金沢市片町3-3</p></div></div>
    <div class="tel">TEL.076-900-3333</div>
  </li>
</ul></div>
<div class="page_nation"></div>
</body></html>
"""

IWATE_RESULT_PAGE = """
<html><body><section id="search_result">
  <div class="stores_box">
    <h2 class="stores_box_name"> わんこそば東家 </h2>
    <p class="stores_box_cities"> 盛岡市 </p>
    <p class="stores_box_add"> 盛岡市中ノ橋通1-1 </p>
    <p class="stores_box_tel">電話でのご予約は 019-900-1111 まで</p>
    <p class="stores_box_genre"> そば </p>
  </div>
  <div class="stores_box">
    <h2 class="stores_box_name">じゃじゃ麺小吃店</h2>
    <p class="stores_box_cities">盛岡市</p>
    <p class="stores_box_add">盛岡市内丸2-2</p>
    <p class="stores_box_tel">予約不可</p>
    <p class="stores_box_genre">イカの唐揚げ</p>
  </div>
</section></body></html>
"""

KAGOSHIMA_INDEX_PAGE = """
<html><body><div id="second_page">
  <p><a href="http://www.kagoshima-cci.or.jp/area/zeniki.html">鹿児島市全域</a></p>
  <p><a href="http://www.kagoshima-cci.or.jp/area/tenmonkan.html">天文館地区</a></p>
  <p><a href="http://www.kagoshima-cci.or.jp/area/sonota.html">〇その他地域</a></p>
  <p><a href="http://www.kagoshima-cci.or.jp/ticket.html">◇食事券購入情報はこちら</a></p>
  <p>リンクなし段落</p>
</div></body></html>
"""

KAGOSHIMA_AREA_PAGE = """
<html><body><table>
  <tr><td>1</td><td><span>検索</span></td><td>黒豚料理あぢもり</td><td>千日町1-1</td></tr>
  <tr><td>ヘッダ</td><td>区分</td><td>店舗名</td><td>住所</td></tr>
  <tr><td>2</td><td><span>検索</span></td><td>鶏飯ひさ倉分店</td><td>金生町2-2</td></tr>
</table></body></html>
"""


KUMAMOTO_PAGE_1 = """
<html><body><section id="sale-page"><div class="sec-body__inner">
  <article>
    <h3> 馬刺しの菅乃屋 </h3>
    <p class="cat"><a class="tag">熊本市</a></p>
    <p>〒860-0808 熊本市中央区手取本町1-1</p>
    <p>096-900-1111</p>
    <p><a href="http://suganoya.example">公式</a></p>
  </article>
  <article>
    <h3>太平燕の紅蘭亭</h3>
    <p class="cat"><a class="tag">熊本市</a></p>
    <p>〒860-0803 熊本市中央区新市街2-2</p>
    <p>096-900-2222</p>
    <p></p>
  </article>
</div></section>
<div class="pagination"><a class="next page-numbers" href="https://gotoeat-kumamoto.jp/shop/page/2">&gt;</a></div>
</body></html>
"""

KUMAMOTO_PAGE_LAST = """
<html><body><section id="sale-page"><div class="sec-body__inner">
  <article>
    <h3>いきなり団子本舗</h3>
    <p class="cat"><a class="tag">阿蘇市</a></p>
    <p>〒869-2225 阿蘇市黒川3-3</p>
  </article>
</div></section>
<div class="pagination"></div>
</body></html>
"""

MIE_LIST_PAGE = """
<html><body>
<table id="smp-table-26722">
  <tr class="smp-row-data"><td class="smp-cell-col-1">1</td><td class="smp-cell-col-2">伊勢</td>
      <td class="smp-cell-col-3"><a target="_self" href="/area/card/26722/m1/M">伊勢うどん奥野家</a></td></tr>
</table>
<table class="smp-pager"><tr><td class="smp-page smp-current-page">1</td>
    <td class="smp-page"><a href="/area/table/26722/AikX5e/M?page=2">2</a></td></tr></table>
</body></html>
"""

# the platform's broken markup, verbatim shape: the 電話番号 row has NO tr
MIE_DETAIL_PAGE = """
<html><body><table class="smp-card-list">
  <tr><th>店舗名</th><td>伊勢うどん奥野家</td></tr>
  <tr><th>住所情報</th><td>516-0025<br>伊勢市宇治今在家町4-4</td></tr>
  <th>電話番号</th><td> 0596-900-1111 </td>
  <tr><th>店舗エリア</th><td> 伊勢志摩 </td></tr>
  <tr><th>業態</th><td> うどん </td></tr>
  <tr><th>WEB URL</th><td><a href="http://okunoya.example">HP</a></td></tr>
</table></body></html>
"""

MIE_DETAIL_NAGOYA_PAGE = """
<html><body><table class="smp-card-list">
  <tr><th>店舗名</th><td>名古屋まぐろ亭</td></tr>
  <tr><th>住所情報</th><td>460-0008<br>愛知県名古屋市中区栄5-5</td></tr>
  <th>電話番号</th><td>052-900-5555</td>
</table></body></html>
"""

MIYAZAKI_PAGE_1 = """
<html><body><div class="l-store-card">
  <div class="store-card__item">
    <h3 class="store-card__title">地鶏炭火焼ぐんけい／居酒屋</h3>
    <table><tbody>
      <tr><th>住所：</th><td>〒880-0001 宮崎市橘通西1-1</td></tr>
      <tr><th>電話番号：</th><td>0985-900-1111</td></tr>
      <tr><th>URL：</th><td><a href="http://gunkei.example">公式</a></td></tr>
    </tbody></table>
    <a class="store-card__button" href="https://premium-gift.jp/gotoeatmiyazaki/use_store/detail?id=501">詳細</a>
  </div>
  <div class="store-card__item">
    <h3 class="store-card__title">チキン南蛮おぐら</h3>
    <table><tbody>
      <tr><th>住所：</th><td>〒880-0805 宮崎市橘通東2-2</td></tr>
      <tr><th>電話番号：</th><td>-</td></tr>
    </tbody></table>
    <a class="store-card__button" href="https://premium-gift.jp/gotoeatmiyazaki/use_store/detail?id=502">詳細</a>
  </div>
</div>
<nav class="pagenation"><a href="javascript:on_events('page',2);">次へ</a></nav>
</body></html>
"""

MIYAZAKI_PAGE_LAST = """
<html><body><div class="l-store-card">
  <div class="store-card__item">
    <h3 class="store-card__title">日向灘海鮮丸</h3>
    <table><tbody>
      <tr><th>住所：</th><td>〒883-0046 日向市中町3-3</td></tr>
      <tr><th>電話番号：</th><td>0982-900-3333</td></tr>
    </tbody></table>
  </div>
</div>
<nav class="pagenation"></nav>
</body></html>
"""

NAGANO_PAGE_1 = """
<html><body><div class="shop_block">
  <div class="shop">
    <p class="shop_title"> 信州そば処みよ田 </p>
    <p class="shop_type"><span class="shop_shozaichi">松本市</span><span class="shopgenre"> そば </span></p>
    <p class="shop_address">〒390-0815</p>
    <p class="shop_address">住所：松本市深志1-1</p>
    <p class="shop_tel"><span>0263-900-1111</span><a href="http://miyota.example">HP</a></p>
  </div>
  <div class="shop"><p class="shop_title"></p></div>
  <div class="shop">
    <p class="shop_title">野沢菜茶屋やまへい</p>
    <p class="shop_type"><span class="shop_shozaichi">小諸市</span><span class="shopgenre">郷土料理</span></p>
    <p class="shop_address">〒384-0025</p>
    <p class="shop_address">住所：小諸市相生町2-2</p>
    <p class="shop_tel"><span>0267-900-2222</span></p>
  </div>
</div>
<div class="pager"><a href="/riyou.php?p=2#search-result">&gt;&gt;</a></div>
</body></html>
"""

NAGANO_PAGE_LAST = """
<html><body><div class="shop_block">
  <div class="shop">
    <p class="shop_title">りんご園カフェふじ</p>
    <p class="shop_type"><span class="shop_shozaichi">飯田市</span><span class="shopgenre">カフェ</span></p>
    <p class="shop_address">〒395-0044</p>
    <p class="shop_address">住所：飯田市本町3-3</p>
    <p class="shop_tel"><span>0265-900-3333</span></p>
  </div>
</div>
<div class="pager"></div>
</body></html>
"""


OKAYAMA_PAGE_1 = """
<html><body><div id="shop"><div class="container">
  <div class="box">
    <p> 千屋牛焼肉けんちゃん </p>
    <dl><dt>エリア</dt><dd> 新見市 </dd>
        <dt>業種</dt><dd> 焼肉 </dd>
        <dt>電話番号</dt><dd><a class="tellink" href="tel:0867900111">0867-900-1111</a></dd>
        <dt>住所</dt><dd> 新見市高尾1-1 </dd>
        <dt>URL</dt><dd><a href="http://kenchan.example">HP</a></dd></dl>
  </div>
  <div class="box">
    <p>デミカツ丼の味司野村</p>
    <dl><dt>エリア</dt><dd>岡山市北区</dd>
        <dt>業種</dt><dd>丼</dd>
        <dt>住所</dt><dd>岡山市北区平和町2-2</dd></dl>
  </div>
</div></div>
<div id="pager"><ul><li><a href="index.cgi?c=list&amp;pic=2">&gt;&gt;</a></li></ul></div>
</body></html>
"""

OKAYAMA_PAGE_LAST = """
<html><body><div id="shop"><div class="container">
  <div class="box">
    <p>倉敷珈琲館</p>
    <dl><dt>エリア</dt><dd>倉敷市</dd>
        <dt>業種</dt><dd>カフェ</dd>
        <dt>住所</dt><dd>倉敷市本町3-3</dd></dl>
  </div>
</div></div>
<div id="pager"><ul></ul></div>
</body></html>
"""

OKINAWA_PAGE_1 = """
<html><body><div class="search_result">
  <article>
    <p class="category"><a class="areas">那覇市</a><a class="industry">沖縄料理</a></p>
    <h4 class="title"> 首里そば本家 </h4>
    <p class="address"> 那覇市首里赤田町1-1 </p>
    <div class="column"><p class="tel"><a href="tel:0989001111">TEL:098-900-1111</a></p>
      <p class="url"><a rel="noopener" href="http://shurisoba.example">HP</a></p></div>
  </article>
  <article>
    <p class="category"><a class="areas">石垣市</a><a class="industry">海鮮</a></p>
    <h4 class="title">石垣島まぐろ屋</h4>
    <p class="address">石垣市美崎町2-2</p>
    <div class="column"><p class="tel"></p><p class="url"></p></div>
  </article>
</div>
<nav role="navigation"><ul><li><span aria-current="page">1</span></li>
<li><a href="https://gotoeat.okinawa.jp/restaurant/page/2/">2</a></li></ul></nav>
</body></html>
"""

OKINAWA_PAGE_LAST = """
<html><body><div class="search_result">
  <article>
    <p class="category"><a class="areas">宮古島市</a><a class="industry">カフェ</a></p>
    <h4 class="title">砂山ビーチカフェ</h4>
    <p class="address">宮古島市平良荷川取3-3</p>
    <div class="column"><p class="tel"></p><p class="url"></p></div>
  </article>
</div>
<nav role="navigation"><ul><li><a href="https://gotoeat.okinawa.jp/restaurant/page/1/">1</a></li>
<li><span aria-current="page">2</span></li></ul></nav>
</body></html>
"""

SAGA_PAGE_1 = """
<html><body><main id="primary"><div class="shop_info">
  <div class="shop_detail">
    <div class="ttl">呼子いか本家</div>
    <div class="genre"> 海鮮 </div>
    <dl><dt>住所</dt><dd>唐津市呼子町<br>呼子1-1</dd></dl>
    <dl><dt>TEL</dt><dd>0955-900-1111</dd></dl>
    <dl><dt>営業時間</dt><dd>11:00-20:00</dd></dl>
    <dl><dt>定休日</dt><dd>水曜</dd></dl>
    <dl><dt>URL</dt><dd><a rel="noopener noreferrer" href="http://ikahonke.example">HP</a></dd></dl>
  </div>
  <div class="shop_detail">
    <div class="ttl">シシリアンライス喫茶こち</div>
    <div class="genre">喫茶</div>
    <dl><dt>住所</dt><dd>佐賀市駅前中央2-2</dd></dl>
    <dl><dt>TEL</dt><dd></dd></dl>
  </div>
</div></main>
<div class="pagination"><ul><li class="next"><a href="/consumer/shop.php?name=&amp;page=2#search_result">NEXT</a></li></ul></div>
</body></html>
"""

SAGA_PAGE_LAST = """
<html><body><main id="primary"><div class="shop_info">
  <div class="shop_detail">
    <div class="ttl">嬉野温泉湯どうふ亭</div>
    <div class="genre">郷土料理</div>
    <dl><dt>住所</dt><dd>嬉野市嬉野町3-3</dd></dl>
  </div>
</div></main>
<div class="pagination"><ul></ul></div>
</body></html>
"""

TOKUSHIMA_PAGE_1 = """
<html><body><main id="main">
  <article>
    <header><h2> 阿波尾鶏一徹 </h2>ジャンル：焼鳥, 和食</header>
    <div class="entry-content">
      <dl><dt>所在地</dt><dd> 徳島市紺屋町1-1 </dd>
          <dt>定休日</dt><dd>月曜</dd>
          <dt>営業時間</dt><dd>17:00-23:00</dd>
          <dt>電話番号</dt><dd>088-900-1111</dd></dl>
    </div>
  </article>
  <article>
    <header><h2>鳴門鯛めし処うづ乃</h2>ジャンル：その他</header>
    <div class="entry-content">
      <dl><dt>所在地</dt><dd>鳴門市撫養町2-2</dd></dl>
    </div>
  </article>
</main>
<nav role="navigation"><div class="nav-links"><a class="next page-numbers" href="https://gotoeat.tokushima.jp/page/2/?s=">&gt;</a></div></nav>
</body></html>
"""

TOKUSHIMA_PAGE_LAST = """
<html><body><main id="main">
  <article>
    <header><h2>半田そうめん茶屋</h2>ジャンル：麺類</header>
    <div class="entry-content"><dl><dt>所在地</dt><dd>つるぎ町半田3-3</dd></dl></div>
  </article>
</main>
<nav role="navigation"><div class="nav-links"></div></nav>
</body></html>
"""


SHIZUOKA_PAGE_1 = """
<html><body><div class="areaBox">
  <div class="areaBox__item">
    <div class="content__ttl"><h5 class="title"> さわやかハンバーグ </h5><div class="hashTag"><p>ハンバーグ</p></div></div>
    <div class="infoArea__item"><div class="detail"><p>〒422-8006静岡市駿河区曲金1-1</p></div></div>
    <div class="infoArea__item"><div class="detail"><p>054-900-1111</p></div></div>
    <div class="infoArea__item"><div class="detail"><p>http://sawayaka.example</p></div></div>
    <a class="content link" href="/index/118009601.html">詳細</a>
  </div>
  <div class="areaBox__item">
    <div class="content__ttl"><h5 class="title">うなぎ大井川</h5><div class="hashTag"><p>うなぎ</p></div></div>
    <div class="infoArea__item"><div class="detail"><p>〒426-0061 藤枝市田沼2-2</p></div></div>
    <div class="infoArea__item"><div class="detail"><p></p></div></div>
  </div>
</div>
<div class="areaCont"><div class="btnArea pagination"><a class="btn pgt next" href="javascript:jumppage(2);">次の一覧</a></div></div>
</body></html>
"""

SHIZUOKA_PAGE_LAST = """
<html><body><div class="areaBox">
  <div class="areaBox__item">
    <div class="content__ttl"><h5 class="title">おでん横丁青葉</h5><div class="hashTag"><p>おでん</p></div></div>
    <div class="infoArea__item"><div class="detail"><p>〒420-0034 静岡市葵区常磐町3-3</p></div></div>
  </div>
</div>
<div class="areaCont"><div class="btnArea pagination"></div></div>
</body></html>
"""

SHIZUOKA_BLUE_PAGE_1 = """
<html><body><ul id="shop_list">
  <li class="shop_box">
    <h2 class="shop_name"> 浜松餃子むつぎく </h2>
    <span class="shop_area">【西部】</span>
    <span class="shop_genre">餃子</span><span class="shop_genre">中華</span>
    <dl class="accordion">
      <dd><table>
        <tr><th>住所</th><td><span class="shop_zip">〒430-0926</span>浜松市中区砂山町 <br> 1-1</td></tr>
        <tr><th>電話番号</th><td>053-900-1111</td></tr>
        <tr><th>営業時間</th><td>11:30-21:00</td></tr>
        <tr><th>定休日</th><td>月曜</td></tr>
      </table></dd>
      <dd><a class="btn_link btn__shop_link" href="http://mutsugiku.example">公式サイト</a></dd>
    </dl>
  </li>
  <li class="shop_box">
    <h2 class="shop_name">静岡おまち横丁</h2>
    <span class="shop_area">【中部】</span>
    <span class="shop_genre">居酒屋</span>
    <dl class="accordion"><dd><table>
      <tr><th>住所</th><td><span class="shop_zip">〒420-0852</span>静岡市葵区紺屋町2-2</td></tr>
    </table></dd></dl>
  </li>
</ul>
<div role="navigation"><a rel="next" href="https://gotoeat-shizuoka.com/shop/page/2/">&gt;</a></div>
</body></html>
"""

SHIZUOKA_BLUE_PAGE_LAST = """
<html><body><ul id="shop_list">
  <li class="shop_box">
    <h2 class="shop_name">富士宮やきそば庵</h2>
    <span class="shop_area">【東部】</span>
    <span class="shop_genre">やきそば</span>
    <dl class="accordion"><dd><table>
      <tr><th>住所</th><td><span class="shop_zip">〒418-0067</span>富士宮市宮町3-3</td></tr>
    </table></dd></dl>
  </li>
</ul>
<div role="navigation"></div>
</body></html>
"""

WAKAYAMA_PAGE_1 = """
<html><body><ul class="result_list">
  <li>
    <div><h3 class="shop_name"> 和歌山ラーメン井出商店 </h3>
      <ul class="shop_tag flex"><li class="shop_cat">ラーメン</li><li class="shop_area">和歌山市</li></ul></div>
    <div><p class="shop_address">〒640-8331 和歌山市田中町1-1</p>
      <div class="shop_info flex"><p class="shop_tel">073-900-1111</p>
        <p class="shop_web"><a href="http://ide-shoten.example">WEB</a></p></div></div>
  </li>
  <li>
    <div><h3 class="shop_name">めはり寿司二代目</h3>
      <ul class="shop_tag flex"><li class="shop_cat">郷土料理</li><li class="shop_area">新宮市</li></ul></div>
    <div><p class="shop_address">〒647-0011 新宮市下本町2-2</p>
      <div class="shop_info flex"><p class="shop_tel"></p><p class="shop_web"></p></div></div>
  </li>
</ul>
<ul class="pager"><li><span><button class="active">1</button></span></li>
<li><form action="/search/?page=2" method="post"></form></li></ul>
</body></html>
"""

WAKAYAMA_PAGE_LAST = """
<html><body><ul class="result_list">
  <li>
    <div><h3 class="shop_name">クエ鍋本家九絵亭</h3>
      <ul class="shop_tag flex"><li class="shop_cat">鍋</li><li class="shop_area">白浜町</li></ul></div>
    <div><p class="shop_address">〒649-2211 白浜町3-3</p>
      <div class="shop_info flex"><p class="shop_tel"></p></div></div>
  </li>
</ul>
<ul class="pager"><li><span><button class="active">2</button></span></li></ul>
</body></html>
"""

YAMANASHI_PAGE = """
<html><body><div id="shopList">
  <section class="shopInfoSection">
    <h1> 甲府市 </h1>
    <div class="secInnr"><table class="shopTable">
      <tr><th>店名</th><th>住所</th><th>電話</th></tr>
      <tr><td>ほうとう小作 <span class="genre"><a>郷土料理</a></span></td><td> 甲府市丸の内1-1 </td><td> 055-900-1111 </td></tr>
      <tr><td>鳥もつ煮奥藤 <span class="genre"><a>和食</a></span></td><td>甲府市国母2-2</td><td>055-900-2222</td></tr>
    </table></div>
  </section>
  <section class="shopInfoSection">
    <h1>富士吉田市</h1>
    <div class="secInnr"><table class="shopTable">
      <tr><th>店名</th><th>住所</th><th>電話</th></tr>
      <tr><td>吉田のうどん麺許皆伝 <span class="genre"><a>うどん</a></span></td><td>富士吉田市下吉田3-3</td><td></td></tr>
    </table></div>
  </section>
</div></body></html>
"""

YAMAGUCHI_PAGE_1 = """
<html><body><ul id="shop-list">
  <li>
    <div class="left"><h3><a href="/use/shop1/"> 瓦そば本店たかせ </a></h3>
      <p class="type"><a>●そば</a><a>●郷土料理</a></p></div>
    <div class="left break">
      <p><strong>［住所］</strong>下関市豊浦町川棚1-1</p>
      <p><strong>［営業時間］</strong>11:00-20:00</p>
      <p><strong>［定休日］</strong>木曜</p>
      <p><strong>［TEL］</strong>083-900-1111</p>
    </div>
    <div class="rink"><a href="http://takase.example">公式HP</a><a href="http://sns.example/takase">Instagram</a></div>
  </li>
  <li>
    <div class="left"><h3><a href="/use/shop2/">ふぐ処旬楽</a></h3>
      <p class="type"><a>●ふぐ</a></p></div>
    <div class="left break">
      <p><strong>［住所］</strong>下関市唐戸町2-2</p>
    </div>
    <div class="rink"></div>
  </li>
</ul>
<div role="navigation"><a rel="next" href="https://gotoeat-yamaguchi.com/use/page/2/?post_type=post&amp;s=&amp;cat_area%5B%5D=08-shop-area">&gt;</a></div>
</body></html>
"""

YAMAGUCHI_PAGE_LAST = """
<html><body><ul id="shop-list">
  <li>
    <div class="left"><h3><a href="/use/shop3/">岩国寿司三原家</a></h3>
      <p class="type"><a>●寿司</a></p></div>
    <div class="left break"><p><strong>［住所］</strong>岩国市岩国3-3</p></div>
    <div class="rink"></div>
  </li>
</ul>
<div role="navigation"></div>
</body></html>
"""

TOKYO_GNAVI_LIST_PAGE = """
<html><body>
<div class="result-cassette__wrapper result-cassette__wrapper--normal"><ul class="result-cassette__list">
  <li><div class="result-cassette__box"><a class="result-cassette__box-title js-measure" href="https://r.gnavi.co.jp/g0001/">江戸前寿司つきじ宮川</a></div></li>
  <li><div class="result-cassette__box"><a class="result-cassette__box-title js-measure" href="https://r.gnavi.co.jp/g0002/">神田藪蕎麦別館</a></div></li>
</ul></div>
<nav><ul><li class="pagination__arrow-item"><a class="pagination__arrow-item-inner pagination__arrow-item-inner-next" href="https://r.gnavi.co.jp/area/tokyo/kods17214/rs/?gtet_all=1&amp;p=2">&gt;</a></li></ul></nav>
</body></html>
"""

TOKYO_GNAVI_DETAIL_PAGE = """
<html><body>
<header role="banner"><dl><dd id="header-meta-gen-desc"><ol><li><a> 寿司 </a></li><li><a> 海鮮 </a></li></ol></dd></dl></header>
<ol id="gn_info-breadcrumbs-inner"><li><a>グルメ</a></li><li><a>東京</a></li><li><a>銀座・有楽町・築地</a></li></ol>
<div id="info-table"><table><tbody>
  <tr><th>店名</th><td><p id="info-name"> 江戸前寿司つきじ宮川 </p></td></tr>
  <tr><th>電話番号・FAX</th><td><ul><li><span class="number">03-900-1111</span></li></ul></td></tr>
  <tr><th>お店のホームページ</th><td><ul><li><a class="url go-off" data-o='{"a": "miyagawa.example/sushi", "b": "https"}'>HP</a></li></ul></td></tr>
  <tr><th>住所</th><td><p class="adr slink">〒104-0045<span class="region">東京都中央区築地1-1</span></p></td></tr>
  <tr><th>営業時間</th><td><div>11:00-22:00</div></td></tr>
  <tr><th>定休日</th><td><ul><li>月曜</li><li>第3火曜</li></ul></td></tr>
</tbody></table></div>
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
        "osaka": [
            ("https://goto-eat.weare.osaka-info.jp/gotoeat/?csp=search_add", OSAKA_PAGE_1.encode()),
            ("https://goto-eat.weare.osaka-info.jp/gotoeat/page/2/", OSAKA_PAGE_LAST.encode()),
        ],
        "gunma": [
            ("https://gunma-gotoeat-campaign.com/shop/?s=&post_type=shop", GUNMA_PAGE_1.encode()),
            ("https://gunma-gotoeat-campaign.com/shop/page/2/?s=&post_type=shop", GUNMA_PAGE_LAST.encode()),
        ],
        "akita": [("https://gotoeat-akita.com/csv/list.csv", AKITA_CSV.encode())],
        "nara": [("https://premium-gift.jp/files/140/document/1660/利用店舗一覧.xlsx", NARA_XLSX.encode())],
        "tokyo": [
            ("https://r.gnavi.co.jp/plan/campaign/gotoeat-tokyo/", TOKYO_INDEX_PAGE.encode()),
            ("https://pr.gnavi.co.jp/promo/gotoeat-tokyo/pdf/shop1.pdf", TOKYO_PDF_SHOP1.encode()),
        ],
        "nagasaki": [
            ("https://www.gotoeat-nagasaki.jp/merchant-list/", NAGASAKI_PAGE_1.encode()),
            ("https://www.gotoeat-nagasaki.jp/merchant-list/page/2/", NAGASAKI_PAGE_LAST.encode()),
        ],
        "hokkaido": [
            ("https://gotoeat-hokkaido.jp/general/particStores", HOKKAIDO_TOKEN_PAGE.encode()),
            ("https://gotoeat-hokkaido.jp/general/particStores/search", HOKKAIDO_RESULT_PAGE_1.encode()),
            ("https://gotoeat-hokkaido.jp/general/particStores/search?page=2", HOKKAIDO_RESULT_PAGE_LAST.encode()),
        ],
        "oita": [("https://oita-gotoeat.com/shop/", OITA_PAGE.encode())],
        "kyoto": [
            ("https://kyoto-gotoeat.com/?s=", KYOTO_LIST_PAGE.encode()),
            ("https://kyoto-gotoeat.com/store/101/", KYOTO_DETAIL_PAGE.encode()),
        ],
        "kagawa": [
            ("https://www.kagawa-gotoeat.com/gtes/store-list?fstr=&mode=only", KAGAWA_PAGE_1.encode()),
            ("https://www.kagawa-gotoeat.com/gtes/store-list?fstr=&mode=only&page=2", KAGAWA_PAGE_LAST.encode()),
        ],
        "aichi": [
            ("https://www.gotoeat-aichi-shop.jp/shop/", AICHI_PAGE_1.encode()),
            ("https://www.gotoeat-aichi-shop.jp/shop/page/2/", AICHI_PAGE_LAST.encode()),
        ],
        "hyogo": [
            ("https://gotoeat-hyogo.com/search/result?keyword=", HYOGO_PAGE_1.encode()),
            ("https://gotoeat-hyogo.com/search/result?keyword=&page=4", HYOGO_PAGE_LAST.encode()),
        ],
        "chiba": [
            (
                "https://gotoeat-chiba.liny.jp/map/api/data.json?x1=35.5416666666667&x2=35.55&y1=140.1125&y2=140.125",
                json.dumps(CHIBA_JSON).encode(),
            )
        ],
        "kochi": [("https://www.gotoeat-kochi.com/js/shop_list.php", json.dumps(KOCHI_JSON).encode())],
        "shimane": [
            ("https://www.gotoeat-shimane.jp/inshokuten/", SHIMANE_LIST_PAGE.encode()),
            ("https://www.gotoeat-shimane.jp/inshokuten/detail/801?page=2", SHIMANE_DETAIL_PAGE.encode()),
        ],
        "toyama": [
            ("https://www.toyamagotoeat.jp/shop/", TOYAMA_PAGE_1.encode()),
            ("https://www.toyamagotoeat.jp/shop/page/2?area=all&type=&search=", TOYAMA_PAGE_LAST.encode()),
        ],
        "tottori": [
            ("https://tottori-gotoeat.jp/store_list/", TOTTORI_PAGE_1.encode()),
            ("https://tottori-gotoeat.jp/store_list/page/2/", TOTTORI_PAGE_LAST.encode()),
        ],
        "aomori": [
            ("https://premium-gift.jp/aomori/use_store", AOMORI_PAGE_1.encode()),
            ("https://premium-gift.jp/aomori/use_store?events=page&id=2&store=&addr=&industry=", AOMORI_PAGE_LAST.encode()),
        ],
        "fukui": [
            ("https://gotoeat-fukui.com/shop/search.php", FUKUI_SEARCH_PAGE.encode()),
            ("https://gotoeat-fukui.com/shop/?id=180001", FUKUI_DETAIL_PAGE.encode()),
        ],
        "ehime": [
            ("https://www.goto-eat-ehime.com/shop_list/", EHIME_PAGE_1.encode()),
            ("https://www.goto-eat-ehime.com/shop_list/page/2/", EHIME_PAGE_LAST.encode()),
        ],
        "fukushima": [
            ("https://gotoeat-fukushima.jp/shop/?s=", FUKUSHIMA_PAGE_1.encode()),
            ("https://gotoeat-fukushima.jp/shop/page/2/?s=", FUKUSHIMA_PAGE_LAST.encode()),
        ],
        "gifu": [
            ("https://area34.smp.ne.jp/area/table/26960/ADtah6/M?detect=x&S=y&_limit_26960=100", GIFU_LIST_PAGE.encode()),
            ("https://area34.smp.ne.jp/area/card/26960/abc1/M", GIFU_DETAIL_PAGE.encode()),
        ],
        "hiroshima": [
            ("https://gotoeat.hiroshima.jp/?s", HIROSHIMA_PAGE_1.encode()),
            ("https://gotoeat.hiroshima.jp/page/2/?s", HIROSHIMA_PAGE_LAST.encode()),
        ],
        "ibaraki": [
            ("https://area34.smp.ne.jp/area/table/27130/3jFZ4A/M?_page_27130=1", IBARAKI_LIST_PAGE.encode()),
            ("https://area34.smp.ne.jp/area/table/27130/3jFZ4A/M?_page_27130=2", IBARAKI_PAGE_LAST.encode()),
        ],
        "ishikawa": [
            ("https://ishikawa-gotoeat-cpn.com/?cities=&type=&s=&post_type=member_store", ISHIKAWA_PAGE_1.encode()),
            ("https://ishikawa-gotoeat-cpn.com/page/2/?cities=&type=&s=&post_type=member_store", ISHIKAWA_PAGE_LAST.encode()),
        ],
        "iwate": [("https://www.iwate-gotoeat.jp/stores/#search_result", IWATE_RESULT_PAGE.encode())],
        "kagoshima": [
            ("http://www.kagoshima-cci.or.jp/?p=20375", KAGOSHIMA_INDEX_PAGE.encode()),
            ("http://www.kagoshima-cci.or.jp/area/zeniki.html", KAGOSHIMA_AREA_PAGE.encode()),
        ],
        "kumamoto": [
            ("https://gotoeat-kumamoto.jp/shop", KUMAMOTO_PAGE_1.encode()),
            ("https://gotoeat-kumamoto.jp/shop/page/2", KUMAMOTO_PAGE_LAST.encode()),
        ],
        "mie": [
            ("https://area34.smp.ne.jp/area/table/26722/AikX5e/M?x=1", MIE_LIST_PAGE.encode()),
            ("https://area34.smp.ne.jp/area/card/26722/m1/M", MIE_DETAIL_PAGE.encode()),
        ],
        "miyazaki": [
            ("https://premium-gift.jp/gotoeatmiyazaki/use_store", MIYAZAKI_PAGE_1.encode()),
            ("https://premium-gift.jp/gotoeatmiyazaki/use_store?events=page&id=2&store=&addr=&industry=", MIYAZAKI_PAGE_LAST.encode()),
        ],
        "nagano": [
            ("https://shinshu-premium.jp/riyou.php", NAGANO_PAGE_1.encode()),
            ("https://shinshu-premium.jp/riyou.php?p=2#search-result", NAGANO_PAGE_LAST.encode()),
        ],
        "okayama": [
            ("https://gotoeat-okayama.com/shop/index.cgi", OKAYAMA_PAGE_1.encode()),
            ("https://gotoeat-okayama.com/shop/index.cgi?c=list&pic=2", OKAYAMA_PAGE_LAST.encode()),
        ],
        "okinawa": [
            ("https://gotoeat.okinawa.jp/restaurant/", OKINAWA_PAGE_1.encode()),
            ("https://gotoeat.okinawa.jp/restaurant/page/2/", OKINAWA_PAGE_LAST.encode()),
        ],
        "saga": [
            ("https://www.sagaoishi-to.com/consumer/shop.php?name=#search_result", SAGA_PAGE_1.encode()),
            ("https://www.sagaoishi-to.com/consumer/shop.php?name=&page=2#search_result", SAGA_PAGE_LAST.encode()),
        ],
        "tokushima": [
            ("https://gotoeat.tokushima.jp/?s=", TOKUSHIMA_PAGE_1.encode()),
            ("https://gotoeat.tokushima.jp/page/2/?s=", TOKUSHIMA_PAGE_LAST.encode()),
        ],
        "shizuoka": [
            ("https://gotoeat.s-reserve.com/", SHIZUOKA_PAGE_1.encode()),
            ("https://gotoeat.s-reserve.com/index.html?freeword=&area=&genre=&pgn=2#shopsearch", SHIZUOKA_PAGE_LAST.encode()),
        ],
        "shizuoka_blue": [
            ("https://gotoeat-shizuoka.com/shop/", SHIZUOKA_BLUE_PAGE_1.encode()),
            ("https://gotoeat-shizuoka.com/shop/page/2/", SHIZUOKA_BLUE_PAGE_LAST.encode()),
        ],
        "wakayama": [
            ("https://gotoeat-wakayama.com/search/", WAKAYAMA_PAGE_1.encode()),
            ("https://gotoeat-wakayama.com/search/?page=2", WAKAYAMA_PAGE_LAST.encode()),
        ],
        "yamanashi": [("https://www.gotoeat-yamanashi.jp/archives/merchant", YAMANASHI_PAGE.encode())],
        "yamaguchi": [
            ("https://gotoeat-yamaguchi.com/use/?post_type=post&s=&cat_area%5B%5D=08-shop-area", YAMAGUCHI_PAGE_1.encode()),
            ("https://gotoeat-yamaguchi.com/use/page/2/?post_type=post&s=&cat_area%5B%5D=08-shop-area", YAMAGUCHI_PAGE_LAST.encode()),
        ],
        "tokyo_gnavi": [
            ("https://r.gnavi.co.jp/area/tokyo/kods17214/rs/?gtet_all=1&resp=1", TOKYO_GNAVI_LIST_PAGE.encode()),
            ("https://r.gnavi.co.jp/g0001/", TOKYO_GNAVI_DETAIL_PAGE.encode()),
        ],
    }
