"""No-progress watchdog for long training runs (SURVEY.md §5.3 build column).

Motivation is a MEASURED failure mode, not a hypothetical: the r3 40k-step
on-chip soak wedged right after its final save — the process sat 20+ minutes
sleeping inside a relay RPC while fresh processes reached the TPU fine
(PROGRESS_NOTES r3 continuation 3). No exception is ever raised in that
state, so only a wall-clock heartbeat can catch it.

Design: the train loop calls :meth:`Watchdog.beat` after every completed
step / validation / checkpoint; a daemon thread checks the time since the
last beat against ``max(min_timeout, factor * EMA(step time))`` and, on
stall, logs the state and hard-exits the process with code 86 (``os._exit``
— deliberate: the main thread is wedged inside an RPC, so atexit hooks and
checkpoint flushes would wedge too). Deterministic mid-epoch resume
(``--auto_resume``) guarantees the restarted run replays the exact
trajectory, so a supervisor loop ``until python -m esr_tpu.train ... ; do
:; done`` is lossless.

The EMA includes the first step's compile time, so the armed timeout starts
generous (factor x minutes) and tightens as the EMA settles to the real
step time — early stalls during compile are indistinguishable from a slow
compile anyway (the relay's compile latency is 20 s – 10+ min for equal
programs).
"""

from __future__ import annotations

import logging
import os
import threading
import time

__all__ = ["Watchdog", "STALL_EXIT_CODE", "DEFAULT_FLOOR", "arm_from_opt"]

STALL_EXIT_CODE = 86

# Default-on floor (r5, VERDICT r4 weak #5): generous enough that the relay
# compile lottery (20 s – 10+ min for equal programs, CLAUDE.md) never
# false-fires — the watchdog exists for the hours-silent wedge, not slow
# compiles.
DEFAULT_FLOOR = 900.0


def _die(rc: int, msg: str) -> None:
    """Log and hard-exit (module-level so tests can monkeypatch it)."""
    logging.getLogger("base").error(msg)
    for h in logging.getLogger("base").handlers:
        try:
            h.flush()
        except Exception:  # noqa: BLE001 — flushing is best-effort pre-exit
            pass
    os._exit(rc)


def arm_from_opt(value, factor=None, logger=None, label: str = "train"):
    """Resolve the ``watchdog`` option into an armed :class:`Watchdog`.

    Default-ON (two measured stall events — the r3 40k-soak wedge and the
    r4 driver-bench outage — argue the protection should not be opt-in):

    - unset/``None``/``true`` -> armed with the :data:`DEFAULT_FLOOR`
    - a positive number       -> armed with that floor (seconds)
    - ``false`` or ``<= 0``   -> disarmed (returns ``None``)
    """
    if value is False or (
        isinstance(value, (int, float)) and not isinstance(value, bool) and float(value) <= 0
    ):
        return None
    floor = DEFAULT_FLOOR if value is None or value is True else float(value)
    wd = Watchdog(min_timeout=floor, factor=float(factor) if factor else 50.0)
    if logger is not None:
        logger.info(
            f"watchdog armed ({label}): min {wd.min_timeout:.0f}s / "
            f"{wd.factor:.0f}x EMA progress time; on stall exits "
            f'{STALL_EXIT_CODE} for a supervisor restart (disable: "watchdog": false)'
        )
    return wd


class Watchdog:
    """Heartbeat-based stall detector (see module docstring).

    Args:
        min_timeout: absolute floor in seconds — never fire earlier than
            this after the last beat (``train.watchdog`` numeric value).
        factor: multiple of the EMA step time that must elapse beat-free
            before the run counts as stalled (``train.watchdog_factor``).
        poll: checker thread wake interval.
    """

    def __init__(self, min_timeout: float = 600.0, factor: float = 50.0, poll: float = 1.0):
        self.min_timeout = float(min_timeout)
        self.factor = float(factor)
        self.poll = float(poll)
        self._ema: float | None = None
        self._last = time.monotonic()
        self._step = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True, name="esr-watchdog")
        self._thread.start()

    def beat(self, step: int | None = None, count: bool = True) -> None:
        """Record progress (a finished train step / validation / save).

        ``count=False`` resets the silence clock without folding the
        interval into the step-time EMA — used after validation/checkpoint
        phases, whose duration is not a step time and would inflate the
        armed timeout."""
        now = time.monotonic()
        if count:
            dt = now - self._last
            self._ema = dt if self._ema is None else 0.9 * self._ema + 0.1 * dt
        self._last = now
        if step is not None:
            self._step = int(step)

    def timeout(self) -> float:
        ema = self._ema
        return max(self.min_timeout, self.factor * ema) if ema is not None else float("inf")

    def stop(self) -> None:
        self._stop.set()

    # -- checker thread -----------------------------------------------------

    def _run(self) -> None:
        while not self._stop.wait(self.poll):
            silent = time.monotonic() - self._last
            limit = self.timeout()
            if silent > limit:
                _die(
                    STALL_EXIT_CODE,
                    f"watchdog: no training progress for {silent:.0f}s "
                    f"(limit {limit:.0f}s = max({self.min_timeout:.0f}, "
                    f"{self.factor:.0f} x EMA {self._ema:.1f}s)) at step "
                    f"{self._step} — the run is presumed wedged (relay "
                    f"stall); exiting {STALL_EXIT_CODE} so a supervisor can "
                    "restart with --auto_resume (deterministic replay)",
                )
                return  # only reached when _die is monkeypatched in tests
