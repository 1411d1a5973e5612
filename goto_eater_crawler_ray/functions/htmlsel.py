"""HTML-tree extraction: stdlib ``html.parser`` DOM + a CSS-lite selector
engine covering the XPath subset the reference spiders actually use.

The reference parses every page with Scrapy/parsel XPath Selectors
(tochigi.py:21-62, niigata.py:61-100, yamagata.py:84-121, miyagi.py:67-104).
No lxml/parsel exists in this container, so this module provides a real
HTML *tree* (not regex-over-markup) with the query capabilities those
spiders need:

  selector syntax (CSS-lite):
    ``div#contents ul.serch_result li``   descendant combinator
    ``div.add > p``                       child combinator
    ``span[class*=genre]``                attribute substring (XPath contains())
    ``a[href]``                           attribute presence
    ``li.next``                           class match
  node API:
    ``node.text()``        all descendant text, document order (XPath string())
    ``node.itext()``       direct child text only (XPath text())
    ``node.texts()``       direct child text chunks (XPath text() node-set)
    ``node.attr("href")``  attribute (XPath @href)
    ``node.children_by_tag("dd")``  positional access (XPath dd[2] == [1])
    ``contains_text(nodes, "GoogleMap")`` text filter (XPath contains(text(),..))

Malformed-HTML tolerance: void elements (br/img/...) never take children;
an open <li>/<p>/<tr>/<td> is implicitly closed by a sibling of the same
tag (the two recovery rules real shop pages actually need); unclosed tags
at EOF close silently.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
# tags that auto-close when a sibling of the same tag opens (HTML5 optional
# end tags — the subset needed for tolerant real-page parsing)
_SIBLING_CLOSES = frozenset("li p tr td th dt dd option".split())


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Node | None" = None):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node | str] = []  # element nodes + text chunks, in order
        self.parent = parent

    # --- text ---------------------------------------------------------
    def text(self) -> str:
        """All descendant text in document order (XPath string(.))."""
        out: list[str] = []
        stack: list[Node | str] = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, str):
                out.append(c)
            else:
                stack.extend(reversed(c.children))
        return "".join(out)

    def itext(self) -> str:
        """Direct child text only (XPath ./text(), joined)."""
        return "".join(c for c in self.children if isinstance(c, str))

    def texts(self) -> list[str]:
        """Direct child text chunks (XPath text() node-set)."""
        return [c for c in self.children if isinstance(c, str)]

    def attr(self, name: str, default: str | None = None) -> str | None:
        return self.attrs.get(name, default)

    # --- structure ----------------------------------------------------
    def elements(self) -> list["Node"]:
        return [c for c in self.children if isinstance(c, Node)]

    def children_by_tag(self, tag: str) -> list["Node"]:
        """Positional child access: XPath ``dd[2]`` == children_by_tag("dd")[1]."""
        return [c for c in self.children if isinstance(c, Node) and c.tag == tag]

    def classes(self) -> list[str]:
        return (self.attrs.get("class") or "").split()

    def __repr__(self) -> str:  # debugging aid only
        return f"<Node {self.tag} {self.attrs}>"


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        # optional-end-tag recovery: <li><li> closes the first li
        if tag in _SIBLING_CLOSES and self.stack[-1].tag == tag:
            self.stack.pop()
        node = Node(tag, {k: unescape(v) if v else "" for k, v in attrs}, self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, {k: unescape(v) if v else "" for k, v in attrs}, self.stack[-1])
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        # close the nearest matching open tag; ignore stray end tags
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(text: str) -> Node:
    b = _TreeBuilder()
    b.feed(text)
    b.close()
    return b.root


# --- selector engine --------------------------------------------------------

_STEP = re.compile(
    r"(?P<tag>[a-zA-Z][\w-]*|\*)?"
    r"(?P<id>#[\w-]+)?"
    r"(?P<cls>(?:\.[\w-]+)+)?"
    r"(?P<attr>\[[^\]]+\])?"
)
_ATTR = re.compile(r"\[([\w-]+)(?:(\*?=)([^\]]*))?\]")


def _step_matches(node: Node, step: str) -> bool:
    m = _STEP.fullmatch(step)
    if not m:
        raise ValueError(f"bad selector step: {step!r}")
    tag, id_, cls, attr = m.group("tag"), m.group("id"), m.group("cls"), m.group("attr")
    if tag and tag != "*" and node.tag != tag:
        return False
    if id_ and node.attrs.get("id") != id_[1:]:
        return False
    if cls:
        have = node.classes()
        if any(c not in have for c in cls[1:].split(".")):
            return False
    if attr:
        am = _ATTR.fullmatch(attr)
        if not am:
            raise ValueError(f"bad attribute selector: {attr!r}")
        name, op, val = am.group(1), am.group(2), am.group(3)
        got = node.attrs.get(name)
        if got is None:
            return False
        if op == "=" and got != val:
            return False
        if op == "*=" and val not in got:
            return False
    return True


def _descendants(node: Node):
    stack = list(reversed(node.elements()))
    while stack:
        n = stack.pop()
        yield n
        stack.extend(reversed(n.elements()))


def sel(node: Node, selector: str) -> list[Node]:
    """CSS-lite select: space = descendant, ``>`` = child. Returns nodes in
    document order, deduplicated."""
    # tokenize into steps and combinators
    parts = selector.replace(">", " > ").split()
    current: list[Node] = [node]
    combinator = " "
    for part in parts:
        if part == ">":
            combinator = ">"
            continue
        nxt: list[Node] = []
        seen: set[int] = set()
        for n in current:
            pool = n.elements() if combinator == ">" else _descendants(n)
            for cand in pool:
                if id(cand) not in seen and _step_matches(cand, part):
                    seen.add(id(cand))
                    nxt.append(cand)
        current = nxt
        combinator = " "
    return current


def sel_one(node: Node, selector: str) -> Node | None:
    out = sel(node, selector)
    return out[0] if out else None


def contains_text(nodes: list[Node], needle: str) -> list[Node]:
    """XPath ``a[contains(text(), needle)]`` over a node list."""
    return [n for n in nodes if needle in n.text()]
