"""Per-host politeness budgets + hot-host salting (T1-T4, limiter.go:50-153).

The reference enforces Delay / Rate / Parallelism with wall-clock blocking at
fetch time (limiter.go:74-120). Batch waves translate those to *admission
counts per wave*: each superstep nominally covers a wall-clock window of
``window_sec`` seconds, so

    Delay d        → cap = floor(window_sec / d)          (T1)
    Rate r         → cap = floor(r * window_sec + tokens) (T3, carry-over)
    Parallelism p  → cap = p * parallelism_factor         (T4)

with the reference's own precedence Delay > Rate > Parallelism within a rule
(the if/else chain at limiter.go:77-114). Selection is a per-host window
row_number over the deterministic frontier order — rows over budget stay
pending for later waves. After selection the wave is repartitioned on a
host-salt column so one host never spans executors (north-rule politeness
locality) while hot hosts are split across a bounded number of salts with
the budget already applied globally.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from goribot_spark.operators.admission import LimitRule


def rule_wave_cap(
    rule: LimitRule,
    window_sec: float,
    tokens_left: float,
    parallelism_factor: int,
    wave: int = 0,
) -> tuple[int | None, float]:
    """Per-wave admission cap for hosts matching ``rule`` + new token balance.

    T2 RandomDelay (limiter.go:83-86): the reference sleeps an extra
    uniform(0, RandomDelay) per request after the fixed Delay. The wave cap
    is the number of per-request spacings delay + u_i·random_delay that fit
    in the window, with u_i a deterministic hash-draw in [0, 1) keyed by
    (rule, wave, slot) — same wave, same cap (reproducible runs; the
    reference's time-seeded rand is deliberately not reproduced). Per-SLOT
    draws matter: a single per-wave draw makes the cap heavy-tailed
    (window/(u·rd) explodes as u→0, an unbounded wave on a delay-less
    rule); summing independent slot draws concentrates the cap at
    ≈ window/(delay + rd/2), hard bounds [window/(delay+rd),
    window/delay].

    Branch precedence mirrors the reference exactly: ``Delay > 0 ||
    RandomDelay > 0`` takes the delay branch and a Rate on the same rule is
    IGNORED (limiter.go:77-90's if/else-if — tested:
    test_random_delay_shadows_rate_like_reference).
    """
    rd = rule.random_delay_sec or 0.0
    if rule.delay_sec or rd:
        d = rule.delay_sec or 0.0
        if not rd:
            return max(1, math.floor(window_sec / d)), 0.0
        expected = d + rd / 2.0
        if window_sec / expected > 100_000:
            # config-scale guard: don't loop millions of hash draws for a
            # near-zero spacing; the concentrated expected-rate cap is
            # indistinguishable at this magnitude.
            return max(1, math.floor(window_sec / expected)), 0.0
        from goribot_spark.canon import xxh64

        budget, k = 0.0, 0
        while True:
            u = (
                xxh64(f"rdelay:{rule.rule_id}:{wave}:{k}".encode()) % 1_000_000
            ) / 1e6
            budget += d + u * rd
            if budget > window_sec:
                break
            k += 1
        return max(1, k), 0.0
    if rule.rate_per_sec:
        budget = rule.rate_per_sec * window_sec + tokens_left
        cap = math.floor(budget)
        return cap, budget - cap
    if rule.parallelism:
        return rule.parallelism * parallelism_factor, 0.0
    return None, 0.0


def select_wave(
    pending: DataFrame,
    rules: list[LimitRule],
    rule_tokens: dict[int, float],
    order_cols: list,
    window_sec: float = 1.0,
    parallelism_factor: int = 1,
    wave_budget: int | None = None,
    wave: int = 0,
) -> tuple[DataFrame, dict[int, float]]:
    """Pick this wave's fetch set from the pending frontier (O1-O3 + T1-T4).

    ``order_cols`` is the BFS or DFS sort (SURVEY §2.6); the per-host window
    ranks in that order so politeness never reorders the crawl contract.
    ``wave`` seeds the deterministic RandomDelay jitter (T2).
    Returns (wave_df, new_rule_tokens).
    """
    new_tokens: dict[int, float] = {}
    cap_expr = F.lit(None).cast("long")
    any_cap = False
    for r in rules:
        cap, tok = rule_wave_cap(
            r, window_sec, rule_tokens.get(r.rule_id, 0.0), parallelism_factor, wave
        )
        new_tokens[r.rule_id] = tok
        if cap is not None:
            any_cap = True
            cap_expr = F.when(F.col("rule_id") == r.rule_id, F.lit(cap)).otherwise(cap_expr)

    if any_cap:
        w_host = Window.partitionBy("host").orderBy(*order_cols)
        wave = (
            pending.withColumn("_host_rank", F.row_number().over(w_host))
            .withColumn("_cap", cap_expr)
            .where(F.col("_cap").isNull() | (F.col("_host_rank") <= F.col("_cap")))
            .drop("_host_rank", "_cap")
        )
    else:
        # No per-host budget anywhere → the whole pending set is the wave;
        # skipping the window saves a full shuffle+sort per superstep.
        wave = pending
    if wave_budget is not None:
        # Global top-k via sort+limit (TakeOrderedAndProject — no
        # single-partition window).
        wave = wave.orderBy(*order_cols).limit(wave_budget)
    return wave, new_tokens


def salt_and_partition(
    wave: DataFrame,
    num_partitions: int,
    hot_host_threshold: int = 10_000,
    num_salts: int = 8,
) -> DataFrame:
    """Host-salted repartition for the fetch stage (north rule / SURVEY §4).

    Default salt 0 keeps each host on one partition (politeness locality);
    hosts whose wave share exceeds ``hot_host_threshold`` rows are split
    across ``num_salts`` deterministic salts — skew relief with the per-host
    budget already enforced globally upstream. AQE skew-join handles residual
    imbalance.
    """
    # Hot-host detection via groupBy (map-side partial agg → only per-host
    # counts shuffle) + broadcast join back, instead of a count-over-window
    # that would shuffle the full wave an extra time before the repartition.
    hot = (
        wave.groupBy("host")
        .agg(F.count(F.lit(1)).alias("_host_n"))
        .where(F.col("_host_n") > hot_host_threshold)
        .select("host", F.lit(True).alias("_hot"))
    )
    wave = wave.join(F.broadcast(hot), on="host", how="left")
    wave = wave.withColumn(
        "host_salt",
        F.when(
            F.col("_hot"),
            F.concat(F.col("host"), F.lit("#"), F.pmod(F.xxhash64("url"), F.lit(num_salts))),
        ).otherwise(F.col("host")),
    ).drop("_hot")
    return wave.repartition(num_partitions, "host_salt")
