"""Stage 2: DOM block segmentation — the layout-segmentation core.

Re-expresses the reference's auto text-region crop
(``pipeline_demo/extractor/enhanced_extractor.py:239-372``: composite
text mask -> contours -> area-filtered boxes -> union bbox) for HTML:
a single streaming parse over the document yields candidate text
blocks in READING ORDER, each with position features (tag_path, depth)
and content features (raw/linked char counts, tag count) that feed the
boilerplate classifier.

Built on stdlib ``html.parser.HTMLParser`` (no external parser is
available in this environment), which is a plus for the byte-identity
invariant: traversal order is the token stream order, there is no
parser-version drift, and malformed markup degrades deterministically
(unmatched end tags are ignored; unclosed tags stay open until an
enclosing close or EOF).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

from bb_ocr_ray.config import DEFAULT_EXTRACT, ExtractConfig
from bb_ocr_ray.kernel.normalize import collapse_ws

# Tags whose entire text content is never page content.
SKIP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "svg", "title", "iframe",
     "object", "canvas", "audio", "video", "map", "datalist"}
)

# Tags that open/close a text block (flush boundary).  Inline tags (a, b,
# i, span, em, strong, code, ...) do NOT flush — their text flows into the
# enclosing block, preserving reading order.
BLOCK_TAGS = frozenset(
    {"p", "div", "section", "article", "main", "li", "ul", "ol", "dl", "dd",
     "dt", "h1", "h2", "h3", "h4", "h5", "h6", "td", "th", "tr", "table",
     "thead", "tbody", "tfoot", "blockquote", "pre", "figure", "figcaption",
     "form", "fieldset", "hr", "nav", "header", "footer", "aside", "body",
     "address", "details", "summary"}
)

# Void elements (never pushed on the stack).
VOID_TAGS = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "source", "track", "wbr", "embed", "param"}
)


@dataclass
class RawBlock:
    """A candidate text block — the web analog of one contour bbox."""

    block_id: int
    tag_path: str          # "/"-joined open-tag stack at block start
    depth: int             # stack depth at block start
    ancestor_dropped: bool  # True if inside nav/header/footer/aside
    runs: list = field(default_factory=list)   # ordered text runs
    raw_chars: int = 0      # non-whitespace chars across runs
    link_chars: int = 0     # of those, chars inside <a>
    n_tags: int = 1         # tags seen while the block was open

    def finalize(self) -> str:
        return collapse_ws("".join(self.runs))


class _Segmenter(HTMLParser):
    def __init__(self, cfg: ExtractConfig):
        super().__init__(convert_charrefs=True)   # entity decode (M1 analog)
        self.cfg = cfg
        self.stack: list = []
        self.skip_depth = 0
        self.link_depth = 0
        self.drop_depth = 0    # nesting inside drop_ancestors subtrees
        self.blocks: list = []
        self.current: RawBlock | None = None
        self._next_id = 0

    # -- block lifecycle ---------------------------------------------------
    def _flush(self) -> None:
        blk = self.current
        self.current = None
        if blk is not None and blk.raw_chars > 0:
            self.blocks.append(blk)

    def _open_block(self) -> None:
        cfg = self.cfg
        path = "/".join(self.stack[: cfg.max_tag_depth])
        self.current = RawBlock(
            block_id=self._next_id,
            tag_path=path,
            depth=len(self.stack),
            ancestor_dropped=self.drop_depth > 0,
        )
        self._next_id += 1

    # -- parser events -----------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in VOID_TAGS:
            if tag in ("br", "hr") and self.current is not None:
                self.current.runs.append("\n")
            if tag == "hr":
                self._flush()
            return
        if tag in SKIP_TAGS:
            self.skip_depth += 1
        if tag == "a":
            self.link_depth += 1
        if tag in self.cfg.drop_ancestors:
            self.drop_depth += 1
        if tag in BLOCK_TAGS:
            self._flush()
        self.stack.append(tag)
        if self.current is not None:
            self.current.n_tags += 1

    def handle_startendtag(self, tag, attrs):
        # <tag/> — treat like a void element; block tags still flush.
        if tag in BLOCK_TAGS:
            self._flush()
        elif tag in ("br", "hr") and self.current is not None:
            self.current.runs.append("\n")

    def handle_endtag(self, tag):
        if tag in VOID_TAGS:
            return
        # Pop up to and including the matching open tag; ignore strays.
        if tag in self.stack:
            while self.stack:
                popped = self.stack.pop()
                if popped in SKIP_TAGS and self.skip_depth > 0:
                    self.skip_depth -= 1
                if popped == "a" and self.link_depth > 0:
                    self.link_depth -= 1
                if popped in self.cfg.drop_ancestors and self.drop_depth > 0:
                    self.drop_depth -= 1
                if popped in BLOCK_TAGS:
                    self._flush()
                if popped == tag:
                    break

    def handle_data(self, data):
        if self.skip_depth > 0:
            return
        stripped_len = len(collapse_ws(data))
        if stripped_len == 0 and self.current is None:
            return   # inter-tag whitespace outside any block
        if self.current is None:
            self._open_block()
        self.current.runs.append(data)
        self.current.raw_chars += stripped_len
        if self.link_depth > 0:
            self.current.link_chars += stripped_len

    def close(self):
        super().close()
        self._flush()


def segment(html_text: str, cfg: ExtractConfig = DEFAULT_EXTRACT) -> list:
    """Parse HTML text into an ordered list of RawBlock candidates."""
    seg = _Segmenter(cfg)
    seg.feed(html_text)
    seg.close()
    return seg.blocks
