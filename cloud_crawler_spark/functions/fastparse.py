"""Fast-path HTML tokenizer, byte-identical to the stdlib parse.

``html.parser.HTMLParser`` costs ~0.5 ms per 25 KB page — almost all
of it per-tag Python dispatch (goahead / parse_starttag /
check_for_whole_start_tag). This module scans the document with ONE
compiled regex and replicates exactly the subset of HTMLParser
behavior the crawl parse needs (text nodes with charrefs unescaped,
document-order <a href> capture, first <base href>, <title> text).
It is a pure accelerator: `fast_parse` returns None ("bail") whenever
the input contains any construct whose handling could diverge from
the stdlib parser, and the caller falls back to `_PageParser`.
Goldens stay pinned to the stdlib semantics either way
(page.rb:109-136 byte-identical contract; see parse.py).

Documents carrying comments / doctype / bogus comments / PIs /
``<script>`` / ``<style>`` route to a position-tracking scanner
(_fast_scan) that replicates the stdlib handling of those constructs
(comments end at ``--\\s*>`` and emit nothing; decls/PIs skip to the
first ``>``; script/style content is RAW data to the first full
``</\\s*elem\\s*>`` — the stdlib's own CDATA `interesting` pattern);
the finditer hot loop keeps the clean-page fast path.

Bail triggers (conservative by construction):
* ``<![`` — marked sections (parse_marked_section)
* a ``<`` in a text span — bogus tags, unterminated quotes/comments/
  declarations, bare '<'
* start-tag attr area that the stdlib attr scan does not consume
  cleanly up to ``>`` or ``/>`` (stdlib turns the whole tag into text)
* end tags carrying quotes (stdlib's ``find('>')`` ignores quoting
  there; parser.py notes ``</tag attr=">">`` itself)

Attribute parsing reuses the stdlib's own compiled
``tagfind_tolerant`` / ``attrfind_tolerant`` regexes and mirrors
``HTMLParser.parse_starttag`` line for line, so accepted tags parse
identically. Equivalence is pinned by tests/test_fastparse.py
(constructed cases + randomized cross-checks against the stdlib
parser).
"""

from __future__ import annotations

import re
from html import unescape
# The fast path leans on two undocumented CPython html.parser
# internals and on possessive quantifiers (3.11+). Either may vanish
# in a CPython upgrade — degrade to the stdlib parser (fast_parse
# returns None) instead of breaking the whole parse import.
try:
    from html.parser import attrfind_tolerant, tagfind_tolerant

    re.compile(r"a*+")  # possessive quantifiers need 3.11+
    _FAST_AVAILABLE = True
except (ImportError, re.error):  # pragma: no cover — version-dependent
    attrfind_tolerant = tagfind_tolerant = None
    _FAST_AVAILABLE = False


def _stdlib_self_check() -> bool:
    """Import-time probe of the version-specific html.parser internals
    the fast path replicates (ADVICE r4): the mere importability of
    attrfind_tolerant/tagfind_tolerant does NOT pin the comment-close
    `--\\s*>`, the quote-blind pi/decl close, or the CDATA end-tag
    pattern — a CPython upgrade could change those and the fast path
    would silently diverge from the stdlib fallback it must be
    byte-identical to. Compare the interpreter's actual compiled
    patterns AND replay a golden parse covering every construct class
    the scanner handles (decl, `-- >` comment close, entity-bearing
    attr/text, script CDATA with a stray '<', spaced `</script >`,
    PI, spaced `</ title >` end tag). Any mismatch disables the fast
    path entirely — fast_parse then always returns None and the
    stdlib parser keeps parity."""
    import html.parser as hp

    try:
        if hp.commentclose.pattern != r"--\s*>":
            return False
        if hp.piclose.pattern != ">":
            return False
        if hp.interesting_normal.pattern != "[&<]":
            return False
        probe = hp.HTMLParser()
        probe.set_cdata_mode("script")
        if probe.interesting.pattern != r"</\s*script\s*>":
            return False

        events: list = []

        class _Probe(hp.HTMLParser):
            def handle_starttag(self, t, a):
                events.append(("s", t, tuple(a)))

            def handle_startendtag(self, t, a):
                events.append(("se", t, tuple(a)))

            def handle_endtag(self, t):
                events.append(("e", t))

            def handle_data(self, d):
                events.append(("d", d))

            def handle_comment(self, d):
                events.append(("c", d))

            def handle_decl(self, d):
                events.append(("D", d))

            def handle_pi(self, d):
                events.append(("p", d))

        p = _Probe(convert_charrefs=True)
        p.feed(
            '<!DOCTYPE html><!-- c -- ><a href="x&amp;y">T&amp;t</a>'
            "<script>a<b</script ><?pi?><title>Q</ title >"
        )
        p.close()
        return events == [
            ("D", "DOCTYPE html"),
            ("c", " c "),
            ("s", "a", (("href", "x&y"),)),
            ("d", "T&t"),
            ("e", "a"),
            ("s", "script", ()),
            ("d", "a<b"),
            ("e", "script"),
            ("p", "pi?"),
            ("s", "title", ()),
            ("d", "Q"),
            ("e", "title"),
        ]
    except Exception:  # pragma: no cover — any probe failure disables
        return False


if _FAST_AVAILABLE and not _stdlib_self_check():  # pragma: no cover
    _FAST_AVAILABLE = False

# comments/decls/PIs and script/style content-mode: these need the
# position-tracking scanner (_fast_scan) instead of the finditer hot
# loop — finditer cannot jump over a CDATA span, and a comment match
# could straddle one. The hot loop stays measurably faster (~40%) on
# the no-construct common case, so dispatch keeps both.
_COMPLEX_RE = re.compile(r"<!|<\?|<[sS][cC][rR][iI][pP][tT]|<[sS][tT][yY][lL][eE]")

# One tag per match. Branch 1 captures the dominant anchor shape
# <a href="...">(quoted, no entities/quotes/angles in the value, no
# further attrs) so the hot loop does ONE group fetch per link; branch
# 2 captures bare end tags; branch 3 is the general tolerant tag. The
# general branch's name charset == stdlib tagfind_tolerant and its
# attr area is quote-aware ('>' inside quoted values does not end the
# tag), matching locatestarttagend_tolerant's quoting rules.
# Alternation branches are first-char disjoint within each position =>
# linear scan, no backtracking blowup. The name quantifier is
# POSSESSIVE (*+): the stdlib name is always the maximal run of
# name-charset chars, so a backtrackable name could split name/attrs
# at a quote where the stdlib would not (e.g. <base"'<a href=x>) and
# silently re-attribute attrs to a different tag — possessive makes
# such inputs fail the tag match and bail instead. Anything this regex
# skips leaves its '<' in a text span, which triggers the bail check.
# Dispatch on m.lastindex: 1 = simple anchor, 2 = simple end tag,
# 3..5 = general (group 5, the attr area, matches even when empty, so
# lastindex is always 5 there).
_TAG_RE = (
    re.compile(
        r"<(?:"
        r"[aA]\s+[hH][rR][eE][fF]\s*=\s*\"([^\"'<>&]*)\"\s*>"
        r"|/([a-zA-Z][^\t\n\r\f />\x00]*+)>"
        r"|(/?)([a-zA-Z][^\t\n\r\f />\x00]*+)"
        r"((?:[^<>\"']|\"[^\"]*\"|'[^']*')*)>"
        r")"
    )
    if _FAST_AVAILABLE
    else None
)


# _fast_scan's tag regex: the hot-loop branches PLUS skip tokens for
# comments (to the first `-->`, parse_comment), doctype/bogus comments
# (quote-blind to the first `>`, parse_html_declaration /
# parse_bogus_comment) and PIs (to the first `>`, parse_pi) — all
# constructs the stdlib parser consumes without emitting data, so a
# single non-capturing match (lastindex None) skips them byte-
# identically. `<![` (marked sections) matches nothing and bails via
# the '<'-in-text check. Unterminated constructs also fail to match
# and bail the same way (their stdlib EOF salvage paths are not worth
# replicating).
_SCAN_TAG_RE = (
    re.compile(
        r"<(?:"
        r"[aA]\s+[hH][rR][eE][fF]\s*=\s*\"([^\"'<>&]*)\"\s*>"
        r"|/([a-zA-Z][^\t\n\r\f />\x00]*+)>"
        r"|(/?)([a-zA-Z][^\t\n\r\f />\x00]*+)"
        r"((?:[^<>\"']|\"[^\"]*\"|'[^']*')*)>"
        r"|!--[\s\S]*?--\s*>"
        r"|!(?!--|\[)[^>]*>"
        r"|\?[^>]*>"
        r")"
    )
    if _FAST_AVAILABLE
    else None
)

# CDATA content mode (script/style): the stdlib's set_cdata_mode
# switches `interesting` to exactly this end-tag pattern, so content
# runs to the first full `</\s*elem\s*>` and the end tag then always
# parses cleanly (endtagfind is a superset of this shape)
_CDATA_END = (
    {t: re.compile(r"</\s*%s\s*>" % t, re.I) for t in ("script", "style")}
    if _FAST_AVAILABLE
    else {}
)


def _fast_scan(s: str):
    """Position-tracking variant of the hot loop for documents carrying
    comments/declarations/PIs/script/style. Replicates the stdlib
    semantics for those constructs: comments/decls/PIs emit nothing;
    script/style switch to CDATA content mode (content is handle_data
    RAW — no charref conversion — until the first full
    `</\\s*elem\\s*>`; unterminated CDATA content is silently dropped,
    goahead's wait-for-more-data break). Returns the fast_parse tuple
    or None to bail."""
    links: list[str] = []
    base_href: str | None = None
    title_parts: list[str] = []
    text_parts: list[str] = []
    in_title = False
    pos = 0
    while True:
        m = _SCAN_TAG_RE.search(s, pos)
        if m is None:
            break
        start, end = m.span()
        if start > pos:
            chunk = s[pos:start]
            if "<" in chunk:
                return None  # stray '<': stdlib quirk territory
            if "&" in chunk:
                chunk = unescape(chunk)
            text_parts.append(chunk)
            if in_title:
                title_parts.append(chunk)
        pos = end
        li = m.lastindex
        if li is None:  # comment / doctype / bogus comment / PI
            continue
        if li == 1:  # simple <a href="...">
            href = m.group(1)
            if href:
                links.append(href)
            continue
        if li == 2:  # simple end tag
            if m.group(2).lower() == "title":
                in_title = False
            continue
        attrs_s = m.group(5)
        if m.group(3):  # end tag (parse_endtag tolerant path)
            if attrs_s and ('"' in attrs_s or "'" in attrs_s):
                return None  # stdlib find('>') is quote-blind here
            if m.group(4).lower() == "title":
                in_title = False
            continue
        tag = m.group(4).lower()
        startend = False
        href = None
        has_href = False
        if attrs_s:
            want = tag == "a" or tag == "base"
            k = tagfind_tolerant.match(s, start + 1).end()
            endpos = pos  # index just past '>'
            while k < endpos:
                am = attrfind_tolerant.match(s, k)
                if am is None:
                    break
                if am.end() > endpos:
                    return None  # scan disagreement on the tag end
                if want:
                    name, rest, value = am.group(1, 2, 3)
                    if name.lower() == "href":
                        if not rest:
                            value = None
                        elif (
                            value[:1] == "'" == value[-1:]
                            or value[:1] == '"' == value[-1:]
                        ):
                            value = value[1:-1]
                        if value:
                            value = unescape(value)
                        href = value  # dict(attrs): last duplicate wins
                        has_href = True
                k = am.end()
            tag_end = s[k:endpos].strip()
            if tag_end == "/>":
                startend = True
            elif tag_end != ">":
                return None  # stdlib emits the whole tag as data
        if tag == "a":
            if has_href and href:
                links.append(href)
        elif tag == "base":
            if base_href is None and has_href and href:
                base_href = href
        elif tag == "title":
            in_title = not startend
        elif (tag == "script" or tag == "style") and not startend:
            em = _CDATA_END[tag].search(s, pos)
            if em is None:
                # unterminated CDATA: stdlib drops the content and
                # emits nothing further (goahead breaks, close()'s
                # trailing handle_data is gated on `not cdata_elem`)
                return links, base_href, title_parts, text_parts
            content = s[pos:em.start()]
            if content:
                text_parts.append(content)  # RAW: no charrefs in CDATA
                if in_title:
                    title_parts.append(content)
            pos = em.end()  # clean </elem>: handle_endtag only
    if pos < len(s):
        tail = s[pos:]
        if "<" in tail:
            return None
        if "&" in tail:
            tail = unescape(tail)
        text_parts.append(tail)
        if in_title:
            title_parts.append(tail)
    return links, base_href, title_parts, text_parts


def fast_parse(s: str):
    """Tokenize `s`; return (links, base_href, title_parts, text_parts)
    exactly as _PageParser would produce them, or None to request the
    stdlib fallback."""
    if not _FAST_AVAILABLE:
        return None
    if _COMPLEX_RE.search(s):
        return _fast_scan(s)
    links: list[str] = []
    base_href: str | None = None
    title_parts: list[str] = []
    text_parts: list[str] = []
    in_title = False
    pos = 0
    links_append = links.append
    text_append = text_parts.append
    title_append = title_parts.append
    for m in _TAG_RE.finditer(s):
        start, end = m.span()
        if start > pos:
            chunk = s[pos:start]
            if "<" in chunk:
                return None  # stray '<': stdlib quirk territory
            if "&" in chunk:
                chunk = unescape(chunk)  # == goahead's per-span unescape
            text_append(chunk)
            if in_title:
                title_append(chunk)
        pos = end
        li = m.lastindex
        if li == 1:  # simple <a href="...">
            href = m.group(1)
            if href:
                links_append(href)
            continue
        if li == 2:  # simple end tag
            if m.group(2).lower() == "title":
                in_title = False
            continue
        attrs_s = m.group(5)
        if m.group(3):  # end tag (parse_endtag tolerant path)
            if attrs_s and ('"' in attrs_s or "'" in attrs_s):
                return None  # stdlib find('>') is quote-blind here
            if m.group(4).lower() == "title":
                in_title = False
            continue
        tag = m.group(4).lower()
        startend = False
        href = None
        has_href = False
        if attrs_s:
            # mirror HTMLParser.parse_starttag's scan over [k, endpos)
            want = tag == "a" or tag == "base"
            k = tagfind_tolerant.match(s, start + 1).end()
            endpos = pos  # index just past '>'
            while k < endpos:
                am = attrfind_tolerant.match(s, k)
                if am is None:
                    break
                if am.end() > endpos:
                    return None  # scan disagreement on the tag end
                if want:
                    name, rest, value = am.group(1, 2, 3)
                    if name.lower() == "href":
                        if not rest:
                            value = None
                        elif (
                            value[:1] == "'" == value[-1:]
                            or value[:1] == '"' == value[-1:]
                        ):
                            value = value[1:-1]
                        if value:
                            value = unescape(value)
                        href = value  # dict(attrs): last duplicate wins
                        has_href = True
                k = am.end()
            tag_end = s[k:endpos].strip()
            if tag_end == "/>":
                startend = True
            elif tag_end != ">":
                return None  # stdlib emits the whole tag as data
        if tag == "a":
            if has_href and href:
                links.append(href)
        elif tag == "base":
            if base_href is None and has_href and href:
                base_href = href
        elif tag == "title":
            # <title/> fires start THEN end in stdlib: net state False
            # even when a title was already open
            in_title = not startend
    if pos < len(s):
        tail = s[pos:]
        if "<" in tail:
            return None
        if "&" in tail:
            tail = unescape(tail)
        text_parts.append(tail)
        if in_title:
            title_parts.append(tail)
    return links, base_href, title_parts, text_parts
