"""A tiny DOM on top of stdlib ``html.parser`` — the container ships no
lxml/bs4/selectolax, so the five HTML selector families
(LOCDB-V3/xmlProcessing.py:179-277) run against this tree.

Only what the extractors need: tag, attrs, parent/children, recursive
``find_all`` in document order, class matching, and concatenated text.
"""

from __future__ import annotations

from html.parser import HTMLParser

_VOID = {"br", "img", "hr", "meta", "link", "input", "area", "base",
         "col", "embed", "source", "track", "wbr"}


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str] | None = None,
                 parent: "Node | None" = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list[Node | str] = []
        self.parent = parent

    # -- accessors -------------------------------------------------
    @property
    def classes(self) -> list[str]:
        return self.attrs.get("class", "").split()

    def has_class(self, *names: str) -> bool:
        cs = set(self.classes)
        return all(n in cs for n in names)

    @property
    def text(self) -> str:
        out: list[str] = []
        stack: list[Node | str] = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, str):
                out.append(c)
            else:
                stack.extend(reversed(c.children))
        return "".join(out)

    def element_children(self) -> list["Node"]:
        return [c for c in self.children if isinstance(c, Node)]

    def iter_elements(self):
        """Document-order depth-first traversal of descendant elements."""
        for c in self.children:
            if isinstance(c, Node):
                yield c
                yield from c.iter_elements()

    def find_all(self, tag: str | None = None, cls: str | None = None,
                 attr: tuple[str, str] | None = None) -> list["Node"]:
        out = []
        for n in self.iter_elements():
            if tag is not None and n.tag != tag:
                continue
            if cls is not None and not n.has_class(*cls.split()):
                continue
            if attr is not None and n.attrs.get(attr[0]) != attr[1]:
                continue
            out.append(n)
        return out

    def find(self, tag: str | None = None, cls: str | None = None) -> "Node | None":
        hits = self.find_all(tag, cls)
        return hits[0] if hits else None


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs), self.cur)
        self.cur.children.append(node)
        if tag not in _VOID:
            self.cur = node

    def handle_startendtag(self, tag, attrs):
        self.cur.children.append(Node(tag, dict(attrs), self.cur))

    def handle_endtag(self, tag):
        # close the nearest open ancestor with this tag (tolerates
        # mis-nesting the way browsers roughly do)
        n = self.cur
        while n is not self.root and n.tag != tag:
            n = n.parent
        if n is not self.root:
            self.cur = n.parent

    def handle_data(self, data):
        if data:
            self.cur.children.append(data)


def parse_html(markup: str) -> Node:
    b = _TreeBuilder()
    b.feed(markup)
    b.close()
    return b.root
