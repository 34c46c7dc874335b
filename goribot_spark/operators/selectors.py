"""OnHTML selector extraction (U2, goribot.go:302-310).

The reference runs a user callback per goquery CSS selection. The Spark form
is a vectorized extraction stage: a small CSS-subset selector (tag, .class,
#id, tag.class, descendant chains via spaces) evaluated with the stdlib
HTMLParser over the decoded body, emitting an array column of matched texts
/ attribute values that callers ``explode``. Covers the selector shapes the
reference's docs use (_docs/get-start.md:188-205); arbitrary CSS needs a
real parser lib on a production cluster — the stage signature is identical.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType


def _parse_selector(sel: str) -> list[dict]:
    steps = []
    for part in sel.split():
        tag, cls, iid = None, None, None
        rest = part
        if "#" in rest:
            rest, iid = rest.split("#", 1)
        if "." in rest:
            rest, cls = rest.split(".", 1)
        tag = rest or None
        steps.append({"tag": tag, "class": cls, "id": iid})
    return steps


class _SelectorExtractor(HTMLParser):
    def __init__(self, steps: list[dict], attr: str | None):
        super().__init__()
        self.steps = steps
        self.attr = attr
        self.stack: list[tuple[str, dict]] = []
        self.hits: list[str] = []
        self._capture_depth: int | None = None
        self._buf: list[str] = []

    def _matches(self, step, tag, attrs):
        if step["tag"] and step["tag"] != tag:
            return False
        if step["class"] and step["class"] not in (attrs.get("class") or "").split():
            return False
        if step["id"] and step["id"] != attrs.get("id"):
            return False
        return True

    def _path_matches(self) -> bool:
        # Descendant match: steps must appear in order along the open stack.
        si = 0
        for tag, attrs in self.stack:
            if si < len(self.steps) and self._matches(self.steps[si], tag, attrs):
                si += 1
        return si == len(self.steps)

    def handle_starttag(self, tag, attrs):
        d = dict(attrs)
        self.stack.append((tag, d))
        if self._capture_depth is None and self._path_matches():
            if self.attr:
                v = d.get(self.attr)
                if v is not None:
                    self.hits.append(v)
            else:
                self._capture_depth = len(self.stack)
                self._buf = []

    def handle_endtag(self, tag):
        if self._capture_depth is not None and len(self.stack) == self._capture_depth:
            self.hits.append("".join(self._buf))
            self._capture_depth = None
        while self.stack and self.stack[-1][0] != tag:
            self.stack.pop()
        if self.stack:
            self.stack.pop()

    def handle_data(self, data):
        if self._capture_depth is not None:
            self._buf.append(data)


def select_all(html: str | None, selector: str, attr: str | None = None) -> list[str]:
    if html is None:
        return []
    ex = _SelectorExtractor(_parse_selector(selector), attr)
    try:
        ex.feed(html)
    except Exception:
        return []
    return ex.hits


def on_html(selector: str, out_col: str, attr: str | None = None,
            html_col: str = "body_text"):
    """Stage factory: add ``out_col: array<string>`` of selector matches
    (text content, or attribute values when ``attr`` is given)."""

    @F.pandas_udf(ArrayType(StringType()))
    def _udf(html: pd.Series) -> pd.Series:
        return html.map(lambda h: select_all(h, selector, attr))

    def stage(df):
        return df.withColumn(out_col, _udf(F.col(html_col)))

    return stage
