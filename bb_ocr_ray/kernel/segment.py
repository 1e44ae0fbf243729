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

The FAST regex front-end (the production default) is the canonical
engine.  It intentionally diverges from html.parser on two sloppy-
markup shapes where the stdlib behavior is worse: ``</script foo>``
closes the script (html.parser stays in CDATA mode and swallows the
rest of the document), and unterminated trailing constructs at EOF
(``<!-- ...``, ``<tag ...``) are swallowed instead of being emitted as
junk text.  Everything else is held identical by differential tests.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from bb_ocr_ray.config import DEFAULT_EXTRACT, ExtractConfig
from bb_ocr_ray.kernel.normalize import collapse_ws

# Tags whose entire text content is never page content.
SKIP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "svg", "title", "iframe",
     "object", "canvas", "audio", "video", "map", "datalist", "textarea"}
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

# Per-tag event bitmasks: ONE dict lookup per tag event instead of five
# frozenset membership tests (start/end handlers are ~2/3 of all
# tokenizer events; measured ~10% whole-kernel win).  The DROP bit
# depends on cfg.drop_ancestors, so masks are memoized per drop set.
_VOID, _SKIP, _LINK, _BLOCK, _DROP = 1, 2, 4, 8, 16
_BASE_MASK: dict = {}
for _t in VOID_TAGS:
    _BASE_MASK[_t] = _BASE_MASK.get(_t, 0) | _VOID
for _t in SKIP_TAGS:
    _BASE_MASK[_t] = _BASE_MASK.get(_t, 0) | _SKIP
for _t in BLOCK_TAGS:
    _BASE_MASK[_t] = _BASE_MASK.get(_t, 0) | _BLOCK
_BASE_MASK["a"] = _BASE_MASK.get("a", 0) | _LINK
_MASK_MEMO: dict = {}


def _mask_for(drop_ancestors) -> dict:
    key = frozenset(drop_ancestors)
    m = _MASK_MEMO.get(key)
    if m is None:
        m = dict(_BASE_MASK)
        for t in key:
            m[t] = m.get(t, 0) | _DROP
        _MASK_MEMO[key] = m
    return m


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


class _SegmenterCore:
    """Event-handling state machine shared by both tokenizer front-ends.

    The SAME handlers process events from the stdlib HTMLParser (the
    reference front-end) and from the fast regex tokenizer below, so
    the two engines can only differ in tokenization, never in
    segmentation semantics — asserted by differential tests."""

    def _init_core(self, cfg: ExtractConfig):
        self.cfg = cfg
        self.stack: list = []
        self._open_counts: dict = {}   # tag -> open count (O(1) membership)
        self._mask = _mask_for(cfg.drop_ancestors)  # memoized per drop set
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
        m = self._mask.get(tag, 0)
        if m & _VOID:
            if self.current is not None and (tag == "br" or tag == "hr"):
                self.current.runs.append("\n")
            if tag == "hr":
                self._flush()
            return
        if m:
            if m & _SKIP:
                self.skip_depth += 1
            if m & _LINK:
                self.link_depth += 1
            if m & _DROP:
                self.drop_depth += 1
            if m & _BLOCK:
                self._flush()
        self.stack.append(tag)
        self._open_counts[tag] = self._open_counts.get(tag, 0) + 1
        if self.current is not None:
            self.current.n_tags += 1

    def handle_startendtag(self, tag, attrs):
        # <tag/> — treat like a void element; block tags still flush.
        if tag in BLOCK_TAGS:
            self._flush()
        elif tag in ("br", "hr") and self.current is not None:
            self.current.runs.append("\n")

    def handle_endtag(self, tag):
        mask = self._mask
        if mask.get(tag, 0) & _VOID:
            return
        # Pop up to and including the matching open tag; ignore strays.
        # Membership via the open-count dict, not an O(depth) list scan
        # (end tags are ~1/3 of all events on real pages).
        if self._open_counts.get(tag, 0) > 0:
            counts = self._open_counts
            while self.stack:
                popped = self.stack.pop()
                counts[popped] -= 1
                pm = mask.get(popped, 0)
                if pm:
                    if pm & _SKIP and self.skip_depth > 0:
                        self.skip_depth -= 1
                    if pm & _LINK and self.link_depth > 0:
                        self.link_depth -= 1
                    if pm & _DROP and self.drop_depth > 0:
                        self.drop_depth -= 1
                    if pm & _BLOCK:
                        self._flush()
                if popped == tag:
                    break

    def handle_data(self, data):
        if self.skip_depth > 0:
            return
        # whitespace-only fast path: data.isspace() <=> collapse_ws
        # yields "" (ASCII runs -> one space, then unicode strip — the
        # same character set str.isspace covers), so skip the regex
        # entirely for inter-tag whitespace, the most common data event
        if not data or data.isspace():
            if self.current is not None:
                self.current.runs.append(data)   # zero stripped chars
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



class _Segmenter(_SegmenterCore, HTMLParser):
    """stdlib front-end: html.parser drives the shared handlers."""

    def __init__(self, cfg: ExtractConfig):
        HTMLParser.__init__(self, convert_charrefs=True)  # entity decode (M1)
        self._init_core(cfg)

    def close(self):
        # HTML5 tokenizer: an unterminated comment / CDATA /
        # declaration / processing instruction runs to EOF and never
        # becomes character data; html.parser instead flushes the
        # incomplete construct as raw data on close.  Drop such a tail
        # for parity with the spec (and the fast engine, whose token
        # regex swallows all four to \Z).
        if self.rawdata.startswith(("<!", "<?")):
            self.rawdata = ""
        HTMLParser.close(self)
        self._flush()


# ---------------------------------------------------------------------------
# Fast regex tokenizer front-end (~2.5x the stdlib parser, which spends
# most of its time in per-character position tracking).  Emits the same
# event stream into the same _SegmenterCore handlers.
# ---------------------------------------------------------------------------
import html as _htmlmod

_TOKEN_RE = re.compile(
    r"<!--.*?(?:-->|\Z)"                 # comment (unterminated: to EOF)
    r"|<!\[CDATA\[.*?(?:\]\]>|\Z)"   # CDATA
    r"|<![^>]*>?"                          # doctype / declaration
    r"|<\?[^>]*>?"                        # processing instruction
    r"|</\s*([a-zA-Z][a-zA-Z0-9:._-]*)[^>]*>"                    # end tag
    r"|<([a-zA-Z][a-zA-Z0-9:._-]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)>"  # start tag (disjoint alts: linear-time, no ReDoS)
    r"|</[^>]*>?"                          # bogus end tag (<//p> etc.): swallowed
    r"|([^<]+)"                            # text run
    r"|<",                                 # stray '<'
    re.S,
)

# Raw-text elements: content is not markup.  script/style/title are
# SKIP_TAGS (content discarded); textarea content is data.
_RAWTEXT_CLOSE = {
    # name boundary required: </styled> must NOT close <style>
    t: re.compile(rf"</\s*{t}(?=[\s/>])[^>]*>", re.I | re.S)
    for t in ("script", "style", "title", "textarea")
}


class _FastSegmenter(_SegmenterCore):
    def __init__(self, cfg: ExtractConfig):
        self._init_core(cfg)

    def feed(self, text: str) -> None:
        unescape = _htmlmod.unescape
        pos = 0
        n = len(text)
        while pos < n:
            m = _TOKEN_RE.match(text, pos)
            if m is None:            # defensive; should be unreachable
                pos += 1
                continue
            pos = m.end()
            # dispatch on lastindex (highest participating group) —
            # one attribute read instead of a 4-group fetch per token:
            # 4 = text run, 3 = start tag (groups 2+3 both participate,
            # attrs may be empty but still matches), 1 = end tag,
            # None = comment/doctype/CDATA/PI/bogus-end/stray '<'
            li = m.lastindex
            if li == 4:
                data = m.group(4)
                if "&" in data:
                    data = unescape(data)
                self.handle_data(data)
            elif li == 3:
                start_tag, attrs = m.group(2, 3)
                tag = start_tag.lower()
                a = attrs.rstrip()
                # self-closing only when the '/' is its own token: bare
                # "/", or preceded by whitespace/quote.  A '/' ending an
                # unquoted attr value (href=http://x.com/) is VALUE text
                # (mirrors html.parser, which parses the value first).
                self_closing = a.endswith("/") and (
                    len(a) == 1 or a[-2] in " \t\n\r\"'"
                )
                if self_closing:
                    self.handle_startendtag(tag, ())
                else:
                    self.handle_starttag(tag, ())
                    closer = _RAWTEXT_CLOSE.get(tag)
                    if closer is not None:
                        # raw-text content: no markup until the close tag;
                        # all four rawtext elements (script/style/title/
                        # textarea) are SKIP_TAGS — form-control text is
                        # not page content
                        mc = closer.search(text, pos)
                        pos = n if mc is None else mc.end()
                        self.handle_endtag(tag)
            elif li == 1:
                self.handle_endtag(m.group(1).lower())
            elif m.group(0) == "<":
                # stray '<' in prose ("1 < 2") is data, like html.parser
                self.handle_data("<")
            # comments / doctype / CDATA / PI: no event

    def close(self) -> None:
        self._flush()


def segment(html_text: str, cfg: ExtractConfig = DEFAULT_EXTRACT,
            engine: str = "fast") -> list:
    """Parse HTML text into an ordered list of RawBlock candidates.

    ``engine="fast"`` (default): regex tokenizer; ``engine="stdlib"``:
    html.parser front-end — same handlers, kept as the differential
    reference (tests assert identical output on the fixture corpus).
    """
    seg = _FastSegmenter(cfg) if engine == "fast" else _Segmenter(cfg)
    seg.feed(html_text)
    seg.close()
    return seg.blocks
