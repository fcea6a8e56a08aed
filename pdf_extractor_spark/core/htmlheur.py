"""HTML boilerplate stripping: tag tokenizer + text/link-density classifier.

The reference repo has no HTML leg (SURVEY.md §2.12); the north rule
(BASELINE.json) adds "HTML boilerplate strip ... DOM-tree text-density
and link-density scoring à la body-text classification".  This module
implements that from the published method — Kohlschütter et al.,
*Boilerplate Detection Using Shallow Text Features* (WSDM 2010), and
jusText-style stop-word density classification — over the restricted
deterministic HTML subset of FIXTURES.md §3.  No external HTML library
is used (none is available in the sandbox); the tokenizer is our own
regex tag scanner.

Pure functions: shared verbatim by the oracle and the Spark operator.
"""

from __future__ import annotations

import re

from .tokenize import ParseError

TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:\s+[a-zA-Z-]+=\"[^\"]*\")*)\s*(/?)>")
ATTR_RE = re.compile(r"([a-zA-Z-]+)=\"([^\"]*)\"")
WS_RE = re.compile(r"\s+")

# block-level boundaries: flush the current text block on open or close
BLOCK_TAGS = {"html", "head", "body", "title", "p", "div", "h1", "h2", "h3",
              "ul", "li", "nav", "footer", "header"}
# containers whose entire subtree is structural boilerplate
BOILER_CONTAINERS = {"nav", "footer", "header"}
HEADING_TAGS = {"h1", "h2", "h3"}
VOID_TAGS = {"img", "br"}
KNOWN_TAGS = BLOCK_TAGS | VOID_TAGS | {"a", "span", "b", "i", "em", "strong"}

# jusText-style stop list (small fixed English set; the classifier only
# needs relative density, not linguistic coverage)
STOPWORDS = frozenset(
    "the a an and or of to in for on with at by from as is are was were be been "
    "this that it its not but if then than so we you they he she i".split()
)

# Kohlschütter-style shallow-feature thresholds (public method; constants ours)
MIN_CONTENT_LEN = 40        # chars of text for length-based acceptance
MAX_CONTENT_LINK_DENSITY = 0.33
MIN_STOPWORD_RATIO = 0.30   # jusText: high stop-word density => full-text
STOPWORD_PATH_MAX_LINK_DENSITY = 0.20
STOPWORD_PATH_MIN_LEN = 20
HEADING_MAX_LINK_DENSITY = 0.5


def tokenize_html(fragment: str, src_span: int = 0) -> list[dict]:
    """Scan an HTML fragment into ordered raw blocks.

    Returns items of two shapes, in document order::

        {"type": "text", "tag": str, "text": str, "text_len": int,
         "anchor_len": int, "n_links": int, "in_boiler": bool, "src_span": int}
        {"type": "media", "src": str, "alt": str, "src_span": int}

    Raises :class:`ParseError` on unknown tags or mismatched nesting
    (total-function error-record semantics).
    """
    items: list[dict] = []
    stack: list[str] = []
    cur_texts: list[str] = []
    cur_anchor = 0
    cur_links = 0
    cur_tag = "p"
    in_anchor = 0

    def boiler_depth() -> bool:
        return any(t in BOILER_CONTAINERS for t in stack)

    def flush():
        nonlocal cur_texts, cur_anchor, cur_links, cur_tag
        text = WS_RE.sub(" ", "".join(cur_texts)).strip()
        if text:
            items.append({
                "type": "text", "tag": cur_tag, "text": text,
                "text_len": len(text), "anchor_len": cur_anchor,
                "n_links": cur_links, "in_boiler": boiler_depth(),
                "src_span": src_span,
            })
        cur_texts, cur_anchor, cur_links = [], 0, 0

    pos = 0
    for m in TAG_RE.finditer(fragment):
        chunk = fragment[pos:m.start()]
        if chunk:
            cur_texts.append(chunk)
            if in_anchor:
                cur_anchor += len(WS_RE.sub(" ", chunk).strip())
        pos = m.end()
        closing, tag, attrs_raw, self_close = m.group(1), m.group(2).lower(), m.group(3), m.group(4)
        if tag not in KNOWN_TAGS:
            raise ParseError(f"unknown tag <{tag}>")
        attrs = dict(ATTR_RE.findall(attrs_raw or ""))
        if tag == "img":
            flush()
            items.append({"type": "media", "src": attrs.get("src", ""),
                          "alt": attrs.get("alt", ""), "src_span": src_span})
            continue
        if tag == "br":
            cur_texts.append(" ")
            continue
        if tag == "a":
            if closing:
                in_anchor = max(0, in_anchor - 1)
            elif not self_close:
                in_anchor += 1
                cur_links += 1
            continue
        if tag in BLOCK_TAGS:
            flush()
            if closing:
                if not stack or stack[-1] != tag:
                    raise ParseError(f"mismatched </{tag}>")
                stack.pop()
                cur_tag = "p"
            elif not self_close:
                stack.append(tag)
                cur_tag = tag if tag in (HEADING_TAGS | {"title", "li", "p"}) else "p"
        # inline span/b/i/em/strong: transparent
    tail = fragment[pos:]
    if tail.strip():
        cur_texts.append(tail)
    flush()
    if stack:
        raise ParseError(f"unclosed tags: {stack}")
    return items


def stopword_ratio(text: str) -> float:
    words = text.lower().split()
    if not words:
        return 0.0
    return sum(1 for w in words if w.strip(".,:;!?") in STOPWORDS) / len(words)


def classify_html_blocks(items: list[dict]) -> tuple[str | None, list[dict]]:
    """Classify tokenized blocks into output spans.

    Returns (title_or_None, spans) where spans are
    ``{"kind": h1|h2|h3|body|media, "text": str, "media_ref": str, "src_span": int}``
    in document order.  Boilerplate (nav/header/footer subtrees, high
    link-density link farms, short low-stopword fragments) is dropped.
    """
    title: str | None = None
    out: list[dict] = []
    for it in items:
        if it["type"] == "media":
            out.append({"kind": "media", "text": it["alt"], "media_ref": it["src"],
                        "src_span": it["src_span"]})
            continue
        tag, text = it["tag"], it["text"]
        if tag == "title":
            if title is None:
                title = text
            continue
        if it["in_boiler"]:
            continue
        link_density = it["anchor_len"] / it["text_len"] if it["text_len"] else 1.0
        if tag in HEADING_TAGS:
            if link_density < HEADING_MAX_LINK_DENSITY:
                out.append({"kind": tag, "text": text, "media_ref": "",
                            "src_span": it["src_span"]})
            continue
        # body-text classification (Kohlschütter shallow features + jusText stopwords)
        if it["text_len"] >= MIN_CONTENT_LEN and link_density <= MAX_CONTENT_LINK_DENSITY:
            out.append({"kind": "body", "text": text, "media_ref": "",
                        "src_span": it["src_span"]})
        elif (stopword_ratio(text) >= MIN_STOPWORD_RATIO
              and link_density <= STOPWORD_PATH_MAX_LINK_DENSITY
              and it["text_len"] >= STOPWORD_PATH_MIN_LEN):
            out.append({"kind": "body", "text": text, "media_ref": "",
                        "src_span": it["src_span"]})
        # else: boilerplate, dropped
    return title, out
