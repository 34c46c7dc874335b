"""Single-threaded reference simulator — goribot pool=1 semantics.

Reproduces the reference crawl loop (goribot.go:107-248) over the synthetic
fixture tables, the only configuration whose ordering the reference itself
pins down (pool=1, extensions_test.go:170-197). Behavioral tests compare the
Spark engine's fetched/admitted/item/error *sets and counts* against this
oracle (wave-ordering equivalence contract, SURVEY.md §7.3).

Semantics mirrored 1:1:
  * FIFO tail-append / LIFO head-push queue (scheduler.go:39-68)
  * admission chain order: rules (allow/deny/whitelist/maxdepth/maxreq,
    limiter.go:122-147) → robots (extensions.go:131-151) → dedup with
    retry exemption + hash-insert-on-admit (extensions.go:288-309)
  * retry on non-ok status / missing page, up to retry_max
    (extensions.go:89-126); retried tasks re-enter the queue
  * urljoin link resolution + depth = parent+1 (goribot.go:163-168)
"""

from __future__ import annotations

import fnmatch
import re
from collections import deque
from dataclasses import dataclass, field
from urllib.parse import urljoin, urlsplit

import pyarrow.parquet as pq

from goribot_spark.canon import url_hash
from goribot_spark.operators.admission import LimitRule


@dataclass
class SimResult:
    fetches: list = field(default_factory=list)  # (url, depth, attempt, ok)
    items: list = field(default_factory=list)  # (src_url, image_id)
    errors: list = field(default_factory=list)  # (url, kind)
    admitted: list = field(default_factory=list)  # (url, depth)

    def fetched_set(self):
        return {(url_hash(u), d) for (u, d, a, ok) in self.fetches if ok}

    def attempt_counts(self):
        out: dict[str, int] = {}
        for u, d, a, ok in self.fetches:
            out[u] = out.get(u, 0) + 1
        return out


def simulate(
    fixtures_dir: str,
    seeds: list[str],
    rules: list[LimitRule] | None = None,
    whitelist: bool = False,
    max_depth: int | None = None,
    retry_max: int = 0,
    okcodes: tuple[int, ...] = (200,),
    dedup: bool = True,
    dfs: bool = False,
    robots: bool = False,
    ua: str = "goribot-spark",
    emit_links: bool = True,
    emit_items: bool = True,
    max_steps: int = 100_000,
) -> SimResult:
    rules = rules or []
    for i, r in enumerate(rules):
        if r.rule_id < 0:
            r.rule_id = i
    pages = {
        r["url"]: r
        for r in pq.read_table(f"{fixtures_dir}/pages.parquet").to_pylist()
    }
    robots_rules = (
        pq.read_table(f"{fixtures_dir}/robots_rules.parquet").to_pylist()
        if robots
        else []
    )

    res = SimResult()
    seen: set[int] = set()
    maxreq_left = {r.rule_id: r.max_req for r in rules if r.max_req is not None}
    regexes = [(r, re.compile(fnmatch.translate(r.host_glob.lower()))) for r in rules]

    def match_rule(host: str) -> LimitRule | None:
        for r, rx in regexes:
            if rx.match(host.lower()):
                return r
        return None

    def robots_allow(host: str, path: str) -> bool:
        best = None  # (plen, spec, allow)
        for rr in robots_rules:
            if rr["host"] != host:
                continue
            if rr["ua"] != "*" and rr["ua"] != ua:
                continue
            if not path.startswith(rr["path_prefix"]):
                continue
            key = (len(rr["path_prefix"]), 0 if rr["ua"] == "*" else 1, rr["allow"])
            if best is None or key > best:
                best = key
        return True if best is None else best[2]

    def admit(url: str, depth: int, retry: int) -> bool:
        host = (urlsplit(url).hostname or "").lower()
        path = urlsplit(url).path or "/"
        r = match_rule(host)
        if whitelist and r is None:
            return False
        if r is not None:
            if not r.allow:
                return False
            if r.max_depth is not None and depth > r.max_depth:
                return False
        if max_depth is not None and depth > max_depth:
            return False
        if r is not None and r.rule_id in maxreq_left:
            if maxreq_left[r.rule_id] <= 0:
                return False
        if robots and not robots_allow(host, path):
            return False
        if dedup and retry == 0:  # retry exemption, extensions.go:293-295
            h = url_hash(url)
            if h in seen:
                return False
            seen.add(h)
        if r is not None and r.rule_id in maxreq_left:
            maxreq_left[r.rule_id] -= 1
        return True

    queue: deque = deque()

    def enqueue(task):
        if dfs:
            queue.appendleft(task)
        else:
            queue.append(task)

    for u in seeds:
        if admit(u, 1, 0):
            res.admitted.append((u, 1))
            enqueue((u, 1, 0))

    steps = 0
    while queue and steps < max_steps:
        steps += 1
        url, depth, retry = queue.popleft()
        page = pages.get(url)
        if page is None:
            status = None
        elif retry < page["fail_times"]:
            status = 500
        else:
            status = page["status"]
        ok = status in okcodes
        res.fetches.append((url, depth, retry, ok))
        if not ok:
            if retry < retry_max:
                enqueue((url, depth, retry + 1))  # dedup-exempt re-add
            else:
                res.errors.append((url, "fetch_error" if status is None else "bad_status"))
            continue
        if emit_items:
            for iid in page["image_refs"]:
                res.items.append((url, iid))
        if emit_links:
            children = []
            for link in page["links"]:
                child = urljoin(url, link)
                if not child.startswith("http"):
                    continue
                if admit(child, depth + 1, 0):
                    res.admitted.append((child, depth + 1))
                    children.append((child, depth + 1, 0))
            for c in children:
                enqueue(c)
    return res
