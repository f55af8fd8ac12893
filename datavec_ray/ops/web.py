"""Web-corpus curation ops: HTML text extraction, URL extraction /
normalization / per-domain stats, and word-boundary blocklist tagging.

Beyond the reference (DataVec has no web machinery) — these are the
front half of a 100 TB web curation run: WARC shards in (see
``sources.read_warc`` / ``sources.write_warc``), clean text, per-domain
statistics and policy tags out. The closest reference analogue is the
whole-file RecordReader family (``impl/FileRecordReader.java:42``) for
the shard-per-task read shape, and the string Transform family
(``transform/string``) for the vectorized column kernels.

Scale notes:
- ``extract_urls`` / ``url_host`` / ``blocklist_tag`` are whole-batch
  Rust/C++ kernels (polars extract_all, Arrow RE2) — no Python per row.
- ``HtmlTextExtract`` necessarily parses per document (HTML is a
  recursive format, like the codecs); it is an actor-pool callable so
  the parser class is built once per actor, and each __call__ handles
  a full batch.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datavec_ray.steps.base import combine

try:  # polars is in the base image; guard for safety
    import polars as _pl
except ImportError:  # pragma: no cover
    _pl = None

# one URL token: scheme://host[/path...] up to whitespace/quote/tag-close
URL_RE = r"https?://[^\s\"'<>]+"
# host part of a URL (named group, Arrow extract_regex)
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?P<host>[^/?#:]+)"


# ---------------------------------------------------------------------------
# deterministic HTML synthesis (pure function of a documents row; the
# SQL oracles mirror the same concatenation term for term)
# ---------------------------------------------------------------------------

def synth_html(batch: pa.Table) -> pa.Table:
    """documents(doc_id, text, lang, source) → +html column.

    The page layout is a fixed template whose every varying piece is a
    column expression, so DuckDB can rebuild the exact same string:
    title/h1 = ``doc {doc_id}``, body = the raw text in one <p>, two
    links derived from (source, doc_id%97) and (lang, doc_id%13).
    Vectorized: one ``binary_join_element_wise`` over the batch.
    """
    did = pc.cast(batch["doc_id"], pa.string())
    text = pc.fill_null(combine(batch["text"]), "")
    lang = pc.fill_null(combine(batch["lang"]), "xx")
    source = pc.fill_null(combine(batch["source"]), "unknown")
    ids = combine(batch["doc_id"]).to_numpy(zero_copy_only=False)
    m97 = pa.array((ids % 97).astype("int64")).cast(pa.string())
    m13 = pa.array((ids % 13).astype("int64")).cast(pa.string())
    html = pc.binary_join_element_wise(
        "<html><head><title>doc ", did,
        "</title><style>p{margin:0}</style></head><body>"
        "<script>var x=1;</script><h1>doc ", did,
        "</h1><p>", text,
        "</p><a href=\"https://", source, ".example.com/d/", m97,
        "\">l0</a> <a href=\"http://mirror-", lang,
        ".example.org/d/", m13, "?x=1#f\">l1</a></body></html>",
        "")
    return batch.append_column(pa.field("html", pa.string()), html)


# ---------------------------------------------------------------------------
# HTML text extraction (actor-pool stage)
# ---------------------------------------------------------------------------

class _Extractor(HTMLParser):
    """Collects title, visible body text nodes and <a href> links;
    script/style subtrees are dropped (the trafilatura-class contract,
    minus boilerplate heuristics)."""

    SKIP = {"script", "style", "noscript", "template"}

    def reset_doc(self) -> None:
        self.reset()
        self.title_parts: list[str] = []
        self.texts: list[str] = []
        self.links: list[str] = []
        self._in_title = False
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in self.SKIP:
            self._skip_depth += 1
        elif tag == "title":
            self._in_title = True
        elif tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.links.append(v)

    def handle_endtag(self, tag):
        if tag in self.SKIP and self._skip_depth:
            self._skip_depth -= 1
        elif tag == "title":
            self._in_title = False

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._in_title:
            self.title_parts.append(data)
            return
        s = data.strip()
        if s:
            self.texts.append(s)


class HtmlTextExtract:
    """map_batches callable: html column → title, body text (stripped
    non-empty text nodes joined by ``\\n``), links (list<string>).

    Use as ``ds.map_batches(HtmlTextExtract("html"), concurrency=N)`` —
    the parser is constructed once per actor.
    """

    def __init__(self, column: str = "html", keep_source: bool = False,
                 out_prefix: str = ""):
        self.column = column
        self.keep_source = keep_source
        self.p = out_prefix
        self._parser = _Extractor(convert_charrefs=True)
        self.__name__ = "HtmlTextExtract"

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = combine(batch[self.column])
        titles, bodies, links = [], [], []
        parser = self._parser
        for h in htmls.to_pylist():
            if h is None:
                titles.append(None); bodies.append(None); links.append(None)
                continue
            parser.reset_doc()
            try:
                parser.feed(h)
                parser.close()
            except Exception:  # malformed markup: keep what was parsed
                pass
            titles.append("".join(parser.title_parts).strip())
            bodies.append("\n".join(parser.texts))
            links.append(list(parser.links))
        out = batch if self.keep_source else batch.drop_columns(
            [self.column])
        out = out.append_column(
            pa.field(self.p + "title", pa.string()), pa.array(titles))
        out = out.append_column(
            pa.field(self.p + "body_text", pa.string()), pa.array(bodies))
        out = out.append_column(
            pa.field(self.p + "links", pa.list_(pa.string())),
            pa.array(links, pa.list_(pa.string())))
        return out


# ---------------------------------------------------------------------------
# URL extraction / normalization (vectorized)
# ---------------------------------------------------------------------------

def extract_urls(col: pa.Array | pa.ChunkedArray,
                 pattern: str = URL_RE) -> pa.Array:
    """All URL matches per string → list<string> (polars' Rust
    extract_all; null in → null out)."""
    if _pl is None:  # pragma: no cover
        raise ImportError("extract_urls requires polars")
    s = _pl.Series(combine(col))
    out = s.str.extract_all(pattern).to_arrow()
    out = combine(out) if isinstance(out, pa.ChunkedArray) else out
    if pa.types.is_large_list(out.type):
        out = out.cast(pa.list_(pa.string()))
    return out


def url_host(col: pa.Array | pa.ChunkedArray,
             lowercase: bool = True) -> pa.Array:
    """URL → host (authority minus port); null for non-URLs. One Arrow
    RE2 pass."""
    st = pc.extract_regex(combine(col), _HOST_RE)
    host = combine(pc.struct_field(st, "host"))
    return pc.utf8_lower(host) if lowercase else host


def url_domain_stats(ds, text_col: str = "html",
                     pattern: str = URL_RE):
    """Extract every URL from ``text_col`` across the corpus, normalize
    to host, and return per-host (n_urls, n_pages) — the standard
    crawl-frontier / domain-mix report.

    Shape: one vectorized extract+explode+combine pass per batch (the
    per-batch combiner collapses each batch to ≤distinct-host rows),
    then ONE small grouped reduce over (host) partials.
    """
    from datavec_ray.reduce import Reducer

    def explode(batch: pa.Table) -> pa.Table:
        lists = extract_urls(batch[text_col], pattern)
        n = lists.value_lengths()
        # page index of every exploded url (for distinct-page counts)
        counts = pc.fill_null(n, 0).to_numpy(zero_copy_only=False)
        page_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        urls = lists.flatten()
        host = url_host(urls)
        t = pa.table({"host": host, "page": pa.array(page_of)})
        t = t.filter(pc.is_valid(t["host"]))
        # batch-local combine: (host, n_urls, n_pages-within-batch) —
        # one Arrow group_by kernel, no pandas round-trip
        g = t.group_by("host").aggregate([("page", "count"),
                                          ("page", "count_distinct")])
        return g.rename_columns(["host", "n_urls", "n_pages"])

    partial = ds.map_batches(explode, batch_format="pyarrow")
    return Reducer(["host"], [["n_urls", "Sum", "n_urls"],
                              ["n_pages", "Sum", "n_pages"]]) \
        .apply_dataset(partial)


# ---------------------------------------------------------------------------
# blocklist tagging (vectorized RE2 alternation)
# ---------------------------------------------------------------------------

def blocklist_pattern(terms: Sequence[str], whole_word: bool = True,
                      case_insensitive: bool = True) -> str:
    """Compile a term list into ONE RE2 alternation (FlashText-style
    multi-keyword scan, but in Arrow's RE2 — linear-time, no Python)."""
    if not terms:
        raise ValueError("empty blocklist")
    alt = "|".join(re.escape(t) for t in sorted(terms, key=len,
                                                reverse=True))
    pat = rf"\b(?:{alt})\b" if whole_word else f"(?:{alt})"
    return ("(?i)" if case_insensitive else "") + pat


def blocklist_tag(col: pa.Array | pa.ChunkedArray, terms: Sequence[str],
                  whole_word: bool = True,
                  case_insensitive: bool = True) -> tuple[pa.Array, pa.Array]:
    """Per-row (match_count, flagged) against a keyword blocklist.
    One ``count_substring_regex`` kernel pass over the batch."""
    pat = blocklist_pattern(terms, whole_word, case_insensitive)
    n = pc.count_substring_regex(pc.fill_null(combine(col), ""), pat)
    n = pc.cast(n, pa.int64())
    return n, pc.greater(n, 0)
