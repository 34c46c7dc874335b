"""Handler registry — the UDF surface (U1-U4, goribot.go:38, 213-218).

The reference attaches arbitrary Go closures to each task; closures cannot
live in a table, so the engine stores a ``handler_id`` string per frontier
row and resolves it against this registry (SURVEY.md §2.10). A handler
declares what the task emits (follow links → new tasks, collect image refs →
items) plus optional vectorized hook stages. Built-ins cover the reference's
common patterns (docs _docs/get-start.md:188-205); users register their own
with :func:`register`.

Hook chains (OnReq / OnAdd / OnResp / OnItem — goribot.go:271-342) are
declarative lists of ``DataFrame -> DataFrame`` transforms applied with
``.transform()`` so Catalyst fuses them into the wave plan.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class Handler:
    name: str
    emit_links: bool = True
    emit_items: bool = True
    # Optional extra stages applied to this handler's fetched rows / items.
    resp_stages: list[Callable[[DataFrame], DataFrame]] = field(default_factory=list)
    item_stages: list[Callable[[DataFrame], DataFrame]] = field(default_factory=list)


_REGISTRY: dict[str, Handler] = {}


def register(handler: Handler) -> Handler:
    _REGISTRY[handler.name] = handler
    return handler


def get(name: str | None) -> Handler:
    # A task with no handlers emits nothing (reference: empty Handlers slice
    # just runs no closures, goribot.go:213-218).
    if name is None:
        return Handler("__none__", emit_links=False, emit_items=False)
    return _REGISTRY.get(name, Handler(name, emit_links=False, emit_items=False))


def link_emitting_ids() -> list[str]:
    return [h.name for h in _REGISTRY.values() if h.emit_links]


def item_emitting_ids() -> list[str]:
    return [h.name for h in _REGISTRY.values() if h.emit_items]


def apply_hook_stages(
    df: DataFrame,
    global_stages: list[Callable[[DataFrame], DataFrame]] | None,
    stage_attr: str | None = None,
) -> DataFrame:
    """Run a hook chain over ``df``: the config-level stages first (the
    spider-wide OnReq/OnResp/OnItem chains, goribot.go:271-342), then each
    registered handler's own stage list (``resp_stages``/``item_stages`` —
    the per-task closure pipeline, goribot.go:213-218) on that handler's
    rows, split by ``handler_id`` and unioned back.

    Contract: per-handler stages must preserve the frame's schema (they may
    filter rows and rewrite column values — the Spark analog of hooks
    mutating ctx in place); config-level stages may also add columns, since
    they see the whole frame. Handlers without stages pass through untouched;
    with no stages anywhere this is the identity (zero plan overhead)."""
    for s in global_stages or []:
        df = df.transform(s)
    if stage_attr is None:
        return df
    staged = [h for h in _REGISTRY.values() if getattr(h, stage_attr)]
    if not staged:
        return df
    names = [h.name for h in staged]
    out = df.where(~F.col("handler_id").isin(names) | F.col("handler_id").isNull())
    for h in staged:
        sub = df.where(F.col("handler_id") == h.name)
        for s in getattr(h, stage_attr):
            sub = sub.transform(s)
        out = out.unionByName(sub)
    return out


# Built-ins.
register(Handler("extract_links_images", emit_links=True, emit_items=True))
register(Handler("links_only", emit_links=True, emit_items=False))
register(Handler("images_only", emit_links=False, emit_items=True))
register(Handler("noop", emit_links=False, emit_items=False))
