"""HTML text + link extraction as vectorized Arrow pandas UDFs.

Reproduces the reference's ``Response.text`` / ``Response.doc`` contract
(studied at ``pyspider/libs/response.py:61-163,211-234`` — semantics
re-implemented, no code copied):

``extract_text``  — decode ``html:binary`` to unicode:
  1. charset from a ``<meta ... charset=...>`` / http-equiv pragma /
     ``<?xml encoding=...>`` declaration in the first 1000 chars
  2. ``gb2312`` upgraded to ``gb18030``
  3. fallback ``utf-8``; unknown charsets also fall back to utf-8
  4. decode with ``errors='replace'``
  This is the **byte-identical extracted text per url** oracle column
  (BASELINE.json input_hint).

``extract_links`` — anchors of the document, absolutized against the
page URL then filtered to ``http*`` (semantics of
``doc.make_links_absolute`` + the ``a[href^="http"]`` selector every
reference handler uses: ``libs/sample_handler.py:17-27``,
``libs/bench.py:262-265``).  lxml/PyQuery are not in this container, so
anchor hrefs are located with a conservative regex over the decoded
text; ordering is document order, duplicates preserved (the frontier
dedups later, matching ``base_handler.py:334-338``).

``extract_title`` — first ``<title>`` text, whitespace-stripped
(``detail_page`` of the sample handler returns ``doc('title').text()``).

All three are exposed through one ``parse_page`` pandas UDF returning a
struct, so the HTML is decoded **once** per page (the reference caches
``Response._text`` for the same reason — parse-once, response.py:105).
Plan shape: one Arrow-batched map over the fetched partition, no
shuffle, no re-parse per downstream column.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

# --- encoding detection --------------------------------------------------

_CHARSET_RE = re.compile(r'<meta.*?charset=["\']*(.+?)["\'>]', flags=re.I)
_PRAGMA_RE = re.compile(r'<meta.*?content=["\']*;?charset=(.+?)["\'>]', flags=re.I)
_XML_RE = re.compile(r'^<\?xml.*?encoding=["\']*(.+?)["\'>]')


def detect_encoding(content: bytes, content_type: str | None = None) -> str:
    """Charset of an HTML byte payload, reference-compatible."""
    encoding = None
    if content_type and "charset=" in content_type:
        encoding = content_type.split("charset=", 1)[1].split(";")[0].strip("'\" ")
    if not encoding:
        head = content[:1000].decode("utf-8", "replace")
        found = _CHARSET_RE.findall(head) + _PRAGMA_RE.findall(head) + _XML_RE.findall(head)
        encoding = found[0] if found else None
    if encoding and encoding.lower() == "gb2312":
        encoding = "gb18030"
    return encoding or "utf-8"


def decode_html(content: bytes, content_type: str | None = None) -> str:
    """``Response.text`` equivalent: detected-charset decode w/ replace."""
    if content is None:
        return None
    if not content:
        return ""
    enc = detect_encoding(content, content_type)
    try:
        return content.decode(enc, "replace")
    except LookupError:  # unknown codec name -> blind utf-8, like reference
        return content.decode("utf-8", "replace")


# --- link + title extraction ---------------------------------------------

_HREF_RE = re.compile(
    r"""<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""",
    flags=re.I | re.S,
)
_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", flags=re.I | re.S)


def extract_links_py(text: str, base_url: str) -> list[str]:
    """Document-order anchor hrefs, absolutized, filtered to http(s)."""
    if not text:
        return []
    links = []
    for m in _HREF_RE.finditer(text):
        href = m.group(1) or m.group(2) or m.group(3) or ""
        href = href.strip()
        if not href:
            continue
        # hrefs that already carry an http(s) scheme+authority pass
        # through urljoin unchanged — skipping the call removes the
        # dominant per-link cost of the parse stage (urljoin re-parses
        # the base URL for every anchor; most web links are absolute)
        if href.startswith(("http://", "https://")):
            links.append(href)
            continue
        absu = urljoin(base_url, href)
        if absu.startswith("http"):
            links.append(absu)
    return links


def extract_title_py(text: str) -> str | None:
    if not text:
        return None
    m = _TITLE_RE.search(text)
    return m.group(1).strip() if m else None


PARSE_SCHEMA = StructType(
    [
        StructField("text", StringType()),
        StructField("title", StringType()),
        StructField("links", ArrayType(StringType())),
    ]
)


@F.pandas_udf(PARSE_SCHEMA)
def parse_page(url: pd.Series, html: pd.Series) -> pd.DataFrame:
    """One-pass page parse: decode once, emit text/title/links struct."""
    texts, titles, links = [], [], []
    for u, h in zip(url, html):
        t = decode_html(h)
        texts.append(t)
        titles.append(extract_title_py(t))
        links.append(extract_links_py(t, u or ""))
    return pd.DataFrame({"text": texts, "title": titles, "links": links})


@F.pandas_udf(StringType())
def html_text(html: pd.Series) -> pd.Series:
    """Decode-only variant (the byte-identical oracle column)."""
    return html.map(decode_html, na_action="ignore")


PARSE_META_SCHEMA = StructType(
    [
        StructField("title", StringType()),
        StructField("links", ArrayType(StringType())),
    ]
)


@F.pandas_udf(PARSE_META_SCHEMA)
def parse_page_meta(url: pd.Series, html: pd.Series) -> pd.DataFrame:
    """Hot-path variant: decode once, return ONLY title+links.

    ``parse_page`` returns the full decoded text, which the crawl loop
    never reads — at 20 KB/page that doubles the Arrow traffic of the
    extraction stage for nothing.  Decode semantics are identical
    (same ``decode_html``)."""
    titles, links = [], []
    for u, h in zip(url, html):
        t = decode_html(h)
        titles.append(extract_title_py(t))
        links.append(extract_links_py(t, u or ""))
    return pd.DataFrame({"title": titles, "links": links})
