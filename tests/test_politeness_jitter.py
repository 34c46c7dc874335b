"""T2 RandomDelay — deterministic per-slot jitter in the budget domain.

The reference sleeps an extra uniform(0, RandomDelay) per request on top of
the fixed Delay (limiter.go:83-86); the batch translation draws one
deterministic hash-jitter u_i ∈ [0,1) per (rule, wave, slot) and caps the
wave at the number of spacings delay + u_i·random_delay that fit in the
window — concentrated at ≈ window/(delay+rd/2), never heavy-tailed. Pure
driver math — no Spark.
"""

from __future__ import annotations

from goribot_spark.operators.admission import LimitRule
from goribot_spark.operators.politeness import rule_wave_cap


def test_random_delay_budget_distribution():
    r = LimitRule("*", delay_sec=0.5, random_delay_sec=0.5, rule_id=7)
    caps = [rule_wave_cap(r, 10.0, 0.0, 1, wave=w)[0] for w in range(200)]
    # bounds: delay alone → 20/wave; delay+full jitter → 10/wave
    assert all(10 <= c <= 20 for c in caps)
    # it actually jitters (not folded into a constant expected rate)
    assert len(set(caps)) >= 5
    # expected cap ≈ window·E[1/(d+u·rd)] = 10·2·ln 2 ≈ 13.9 for d=rd=0.5
    mean = sum(caps) / len(caps)
    assert 12.5 < mean < 15.5
    # deterministic: same (rule, wave) → same cap
    again = [rule_wave_cap(r, 10.0, 0.0, 1, wave=w)[0] for w in range(200)]
    assert caps == again
    # different waves draw different jitter than a fixed Delay would
    fixed = rule_wave_cap(LimitRule("*", delay_sec=0.5, rule_id=7), 10.0, 0.0, 1, 3)
    assert fixed == (20, 0.0)


def test_random_delay_only_no_fixed_delay():
    r = LimitRule("*", random_delay_sec=1.0, rule_id=3)
    caps = [rule_wave_cap(r, 10.0, 0.0, 1, wave=w)[0] for w in range(100)]
    # per-slot uniform(0,1) spacings: cap is always bounded — at least 10
    # (every spacing < 1) and concentrated near 2·window/rd = 20; the
    # old single-draw model exploded to ~10^6 (or uncapped) on a tiny draw.
    assert all(c is not None and 10 <= c <= 40 for c in caps)
    mean = sum(caps) / len(caps)
    assert 17 < mean < 24


def test_random_delay_shadows_rate_like_reference():
    """limiter.go:77-90: `Delay > 0 || RandomDelay > 0` takes the delay
    branch, else-if Rate — a rule with both random_delay and rate uses the
    jitter cap and never touches the token bucket."""
    r = LimitRule("*", random_delay_sec=1.0, rate_per_sec=100.0, rule_id=5)
    cap, tok = rule_wave_cap(r, 10.0, 0.5, 1, wave=1)
    assert cap is not None and 10 <= cap <= 40  # jitter cap, not 100·10
    assert tok == 0.0  # token carry-over is reset, not accumulated


def test_delay_precedence_unchanged():
    """Delay/Rate/Parallelism precedence (limiter.go:77-114) is untouched
    when random_delay is unset."""
    assert rule_wave_cap(LimitRule("*", delay_sec=0.2, rule_id=0), 1.0, 0.0, 1) == (5, 0.0)
    cap, tok = rule_wave_cap(LimitRule("*", rate_per_sec=2.5, rule_id=0), 1.0, 0.2, 1)
    assert cap == 2 and abs(tok - 0.7) < 1e-9
    assert rule_wave_cap(LimitRule("*", parallelism=3, rule_id=0), 1.0, 0.0, 2) == (6, 0.0)
