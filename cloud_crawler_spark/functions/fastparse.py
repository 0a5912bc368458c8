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

Bail triggers (conservative by construction):
* ``<!`` / ``<?`` anywhere — comments, doctype, CDATA, PIs
* ``<script`` / ``<style`` (any case) — CDATA content mode
* a ``<`` in a text span — bogus tags, unterminated quotes, bare '<'
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

# comments/decls/PIs/CDATA and script/style content-mode: bail fast
_BAIL_RE = re.compile(r"<!|<\?|<[sS][cC][rR][iI][pP][tT]|<[sS][tT][yY][lL][eE]")

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


def fast_parse(s: str):
    """Tokenize `s`; return (links, base_href, title_parts, text_parts)
    exactly as _PageParser would produce them, or None to request the
    stdlib fallback."""
    if not _FAST_AVAILABLE or _BAIL_RE.search(s):
        return None
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
