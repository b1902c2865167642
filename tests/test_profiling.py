"""Profiling utilities: Timer, RoundMetrics accounting."""

import time

from eagle_tpu.utils.profiling import RoundMetrics, Timer


def test_timer_measures():
    with Timer("t", sync=False) as t:
        time.sleep(0.02)
    assert t.ms >= 15


def test_round_metrics():
    m = RoundMetrics()
    m.record(accept_len=3, dt_s=0.01)
    m.record(accept_len=0, dt_s=0.01)
    m.record(accept_len=3, dt_s=0.02)
    s = m.summary()
    assert s["rounds"] == 3
    assert s["new_tokens"] == 9  # (3+1)+(0+1)+(3+1)
    assert abs(s["tau"] - 3.0) < 1e-9
    assert s["accept_hist"] == {0: 1, 3: 2}
    assert abs(s["tokens_per_s"] - 9 / 0.04) < 1e-6
