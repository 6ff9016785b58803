"""Relay-stall watchdog (SURVEY.md §5.3; VERDICT r3 weak #3 — a MEASURED
failure mode: the 40k soak wedged in an RPC with no exception)."""

import time

import pytest


def test_watchdog_fires_on_stall_and_not_on_progress(monkeypatch):
    import esr_tpu.utils.watchdog as wdm

    calls = []
    monkeypatch.setattr(wdm, "_die", lambda rc, msg: calls.append((rc, msg)))

    wd = wdm.Watchdog(min_timeout=0.6, factor=0.0, poll=0.05)
    try:
        # regular beats: stays quiet
        for s in range(1, 6):
            time.sleep(0.15)
            wd.beat(s)
        assert not calls
        assert wd.timeout() == pytest.approx(0.6)  # floor wins over 0*EMA
        # silence past the floor: fires once with the stall exit code
        time.sleep(1.2)
        assert calls, "watchdog did not fire on a stall"
        rc, msg = calls[0]
        assert rc == wdm.STALL_EXIT_CODE == 86
        assert "no training progress" in msg and "--auto_resume" in msg
    finally:
        wd.stop()


def test_watchdog_unarmed_until_first_beat(monkeypatch):
    """The first step includes the (relay-stochastic, up to 10+ min) compile:
    the timeout must be infinite until a first beat seeds the EMA."""
    import esr_tpu.utils.watchdog as wdm

    calls = []
    monkeypatch.setattr(wdm, "_die", lambda rc, msg: calls.append((rc, msg)))
    wd = wdm.Watchdog(min_timeout=0.05, factor=1.0, poll=0.02)
    try:
        time.sleep(0.4)  # far past min_timeout, but never beaten
        assert not calls
        assert wd.timeout() == float("inf")
        wd.beat(1)
        assert wd.timeout() < float("inf")
    finally:
        wd.stop()


def test_watchdog_count_false_resets_clock_without_ema(monkeypatch):
    import esr_tpu.utils.watchdog as wdm

    monkeypatch.setattr(wdm, "_die", lambda rc, msg: None)
    wd = wdm.Watchdog(min_timeout=10.0, factor=5.0, poll=1.0)
    try:
        wd.beat(1)
        ema_before = wd._ema
        time.sleep(0.2)
        wd.beat(count=False)  # validation/save phase: clock reset only
        assert wd._ema == ema_before
    finally:
        wd.stop()


def test_arm_from_opt_default_on_and_optouts():
    """Default-ON resolution (r5, VERDICT r4 weak #5): unset/true arm at the
    900 s floor; a number sets the floor; false/0 disarm."""
    import esr_tpu.utils.watchdog as wdm

    for value, floor in [(None, wdm.DEFAULT_FLOOR), (True, wdm.DEFAULT_FLOOR), (120, 120.0), (42.5, 42.5)]:
        wd = wdm.arm_from_opt(value)
        try:
            assert wd is not None and wd.min_timeout == floor, (value, floor)
        finally:
            wd.stop()
    assert wdm.arm_from_opt(False) is None
    assert wdm.arm_from_opt(0) is None
    assert wdm.arm_from_opt(-1) is None
    wd = wdm.arm_from_opt(None, factor=7)
    try:
        assert wd.factor == 7.0
    finally:
        wd.stop()
