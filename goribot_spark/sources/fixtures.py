"""Deterministic synthetic fixtures (FIXTURES.md): web graph + image payload.

Replaces the reference's live HTTP targets (httpbin.org / httptest servers in
extensions_test.go, limiter_test.go, net_test.go) with static parquet tables:
"fetching" URL u becomes an equi-join of the wave against ``pages`` on
``url_hash`` (SURVEY.md §2.1 S4, §2.5 J5).

Everything is keyed off ``seed`` (default 42) with numpy PCG64 — same args →
byte-identical parquet. Image payload is pure-Python PNG (no PIL in the
sandbox); the ``fmt`` column is 'png' throughout and the lossy-jpeg leg of
the input_hint is exercised only when PIL is importable (imaging.py).
"""

from __future__ import annotations

import gzip
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from goribot_spark.canon import url_hash
from goribot_spark.functions.pngcodec import encode_png, phash64


def _page_url(host: str, k: int) -> str:
    return f"http://{host}/p/{k}"


def _tree_edges(n_nodes: int, fanout: int) -> dict[int, list[int]]:
    """Heap-numbered complete tree: node k → children fanout*k+1..fanout*k+fanout."""
    edges: dict[int, list[int]] = {}
    for k in range(n_nodes):
        kids = [fanout * k + c for c in range(1, fanout + 1)]
        edges[k] = [c for c in kids if c < n_nodes]
    return edges


def _node_depth(k: int, fanout: int) -> int:
    d = 0
    while k > 0:
        k = (k - 1) // fanout
        d += 1
    return d


def _make_image(i: int, rng: np.random.Generator) -> tuple[bytes, int, int, np.ndarray]:
    w = int(rng.integers(8, 65))
    h = int(rng.integers(8, 65))
    yy, xx = np.mgrid[0:h, 0:w]
    r = ((xx * (i % 7 + 1) + yy * (i % 5 + 1)) % 256).astype(np.uint8)
    g = ((xx * 3 + yy * (i % 11 + 1) + i) % 256).astype(np.uint8)
    b = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    px = np.stack([r, g, np.asarray(b)], axis=2)
    return encode_png(px), w, h, px


_COLORS = ["red", "blue", "green", "amber", "violet", "teal"]
_SHAPES = ["circle", "square", "spiral", "wave", "grid", "gradient"]


def generate_images(n_images: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")}
    for i in range(n_images):
        png, w, h, px = _make_image(i, rng)
        iid = f"img-{i:08d}"
        rows["image_id"].append(iid)
        rows["bytes"].append(png)
        rows["w"].append(w)
        rows["h"].append(h)
        rows["fmt"].append("png")
        rows["caption"].append(
            f"caption of {iid}: {_COLORS[i % 6]} {_SHAPES[(i // 6) % 6]} at depth {i % 5}"
        )
        rows["phash"].append(phash64(px))
    return pa.table(
        rows,
        schema=pa.schema(
            [
                ("image_id", pa.string()),
                ("bytes", pa.binary()),
                ("w", pa.int32()),
                ("h", pa.int32()),
                ("fmt", pa.string()),
                ("caption", pa.string()),
                ("phash", pa.int64()),
            ]
        ),
    )


def _render_html(title: str, hrefs: list[str], image_ids: list[str]) -> bytes:
    links = "".join(f'<a href="{h}">{h}</a>\n' for h in hrefs)
    imgs = "".join(f'<img src="img://{i}" alt="{i}">\n' for i in image_ids)
    return (
        f"<html><head><title>{title}</title></head><body>\n{links}{imgs}</body></html>"
    ).encode("utf-8")


def generate_pages(
    n_hosts: int = 4,
    depth: int = 4,
    n_images: int = 256,
    seed: int = 42,
    max_refs: int = 3,
    flaky_frac: float = 0.05,
) -> pa.Table:
    """Synthetic web graph. site0.test is the hot host (fanout 4 vs 3) for skew.

    Per-page quirks (seeded, mirroring reference tests):
      * 5% fail twice then succeed (Retry — extensions_test.go:77-111)
      * 10% stored gzip-compressed (net.go:296-303)
      * a small JSON subset (net.go:231-243)
      * a small GBK-encoded subset; odd k omit the charset declaration so
        the engine's charset detector is exercised (net_test.go:82-92)
      * duplicate + relative links (dedup + urljoin — goribot.go:163-166)
      * pages with k % 13 == 5 Set-Cookie a per-host session value
        (cookie jar — net.go:261-263, net_test.go:116-137)
    """
    rng = np.random.default_rng(seed + 1)
    cols = {
        k: []
        for k in (
            "url",
            "url_hash",
            "host",
            "status",
            "fail_times",
            "content_type",
            "body",
            "links",
            "image_refs",
            "title",
            "gzipped",
            "set_cookies",
        )
    }
    gpi = 0  # global page index
    for s in range(n_hosts):
        host = f"site{s}.test"
        fanout = 4 if s == 0 else 3
        n_nodes = sum(fanout**d for d in range(depth + 1))
        edges = _tree_edges(n_nodes, fanout)
        for k in range(n_nodes):
            url = _page_url(host, k)
            kids = edges[k]
            hrefs: list[str] = []
            for idx, c in enumerate(kids):
                if idx % 2 == 0:
                    hrefs.append(_page_url(host, c))  # absolute
                else:
                    hrefs.append(str(c))  # relative → urljoin against /p/{k}
            # Duplicate edge: re-link first child (dedup fodder).
            if kids:
                hrefs.append(_page_url(host, kids[0]))
            # Occasional cross-host edge to the next host's root.
            if k % 17 == 3 and n_hosts > 1:
                hrefs.append(_page_url(f"site{(s + 1) % n_hosts}.test", 0))
            img_ids = [
                f"img-{(gpi * 3 + t) % n_images:08d}" for t in range(1 + k % max_refs)
            ]
            title = f"{host} page {k}"
            is_json = k % 23 == 7
            is_gbk = (not is_json) and k % 29 == 11
            if is_json:
                body = json.dumps(
                    {"title": title, "links": hrefs, "images": img_ids}
                ).encode("utf-8")
                ctype = "application/json"
            elif is_gbk:
                body = (
                    f"<html><head><title>{title} 中文页</title></head><body>"
                    + "".join(f'<a href="{h}">链接</a>' for h in hrefs)
                    + "".join(f'<img src="img://{i}">' for i in img_ids)
                    + "</body></html>"
                ).encode("gbk")
                # Odd k: no declaration → the engine must DETECT the charset
                # (net.go:202-206 chardet semantics, net_test.go:82-92).
                ctype = "text/html" if k % 2 else "text/html; charset=gbk"
            else:
                body = _render_html(title, hrefs, img_ids)
                ctype = "text/html; charset=utf-8"
            gz = bool(rng.random() < 0.10)
            if gz:
                body = gzip.compress(body, 6)
            fail_times = 2 if rng.random() < flaky_frac else 0
            cols["url"].append(url)
            cols["url_hash"].append(url_hash(url))
            cols["host"].append(host)
            cols["status"].append(200)
            cols["fail_times"].append(fail_times)
            cols["content_type"].append(ctype)
            cols["body"].append(body)
            cols["links"].append(hrefs)
            cols["image_refs"].append(img_ids)
            cols["title"].append(title)
            cols["gzipped"].append(gz)
            cols["set_cookies"].append(
                [("session", f"{host}-k{k}")] if k % 13 == 5 else None
            )
            gpi += 1
    return pa.table(
        cols,
        schema=pa.schema(
            [
                ("url", pa.string()),
                ("url_hash", pa.int64()),
                ("host", pa.string()),
                ("status", pa.int32()),
                ("fail_times", pa.int32()),
                ("content_type", pa.string()),
                ("body", pa.binary()),
                ("links", pa.list_(pa.string())),
                ("image_refs", pa.list_(pa.string())),
                ("title", pa.string()),
                ("gzipped", pa.bool_()),
                ("set_cookies", pa.map_(pa.string(), pa.string())),
            ]
        ),
    )


def generate_robots(n_hosts: int = 4) -> pa.Table:
    """robots fixture: site1.test disallows /p/1* for '*'; site2 disallows all
    for ua 'badbot' only (per-UA rules — extensions_test.go:113-139)."""
    rows = []
    for s in range(n_hosts):
        host = f"site{s}.test"
        rows.append((host, "*", "/", True))
    rows.append(("site1.test", "*", "/p/1", False))
    rows.append(("site2.test", "badbot", "/", False))
    return pa.table(
        {
            "host": [r[0] for r in rows],
            "ua": [r[1] for r in rows],
            "path_prefix": [r[2] for r in rows],
            "allow": [r[3] for r in rows],
        }
    )


def generate_seeds(n_hosts: int = 4) -> pa.Table:
    urls = [_page_url(f"site{s}.test", 0) for s in range(n_hosts)]
    return pa.table(
        {
            "url": urls,
            "handler_id": ["extract_links_images"] * len(urls),
            "meta": [[] for _ in urls],
            "priority": [0] * len(urls),
        },
        schema=pa.schema(
            [
                ("url", pa.string()),
                ("handler_id", pa.string()),
                ("meta", pa.map_(pa.string(), pa.string())),
                ("priority", pa.int32()),
            ]
        ),
    )


def generate_all(
    outdir: str,
    n_hosts: int = 4,
    depth: int = 4,
    n_images: int = 256,
    seed: int = 42,
    max_refs: int = 3,
    flaky_frac: float = 0.05,
) -> dict[str, str]:
    os.makedirs(outdir, exist_ok=True)
    paths = {}
    for name, table in (
        ("images", generate_images(n_images, seed)),
        ("pages", generate_pages(n_hosts, depth, n_images, seed, max_refs, flaky_frac)),
        ("robots_rules", generate_robots(n_hosts)),
        ("seeds", generate_seeds(n_hosts)),
    ):
        p = os.path.join(outdir, f"{name}.parquet")
        pq.write_table(table, p)
        paths[name] = p
    return paths


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--hosts", type=int, default=4)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--images", type=int, default=256)
    ap.add_argument("--seed", type=int, default=42)
    a = ap.parse_args()
    print(generate_all(a.outdir, a.hosts, a.depth, a.images, a.seed))
