"""bench.py stall-proofing (VERDICT r4 next #1): the driver must receive one
parseable JSON line within the deadline no matter what the relay does.

These tests exercise the REAL `python bench.py` entry (subprocess, same argv
the driver uses) with the documented test hooks standing in for a wedged
relay: BENCH_PREFLIGHT_CMD replaces the liveness canary, and
BENCH_TEST_HANG_STAGE makes the child sleep forever at a stage boundary —
the exact observable of the twice-measured RPC-stall failure mode."""

import json
import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run(env_extra: dict, timeout: float = 120.0) -> tuple[dict, float, str]:
    env = {k: v for k, v in os.environ.items() if not k.startswith("BENCH_")}
    # subprocesses must not touch the real TPU relay (CLAUDE.md): replace
    # the sitecustomize pin by exporting the CPU platform explicitly
    env.update({"PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu"})
    env.update(env_extra)
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, BENCH], env=env, capture_output=True, text=True,
        timeout=timeout,
    )
    elapsed = time.monotonic() - t0
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, f"expected exactly one JSON line, got: {proc.stdout!r}"
    return json.loads(lines[0]), elapsed, proc.stderr


def _check_contract(obj: dict) -> None:
    assert obj["metric"] == "rrdb_cem_4x_sr_throughput"
    assert obj["unit"] == "HR_megapixels/sec/chip"
    assert "value" in obj and "vs_baseline" in obj and "extra" in obj


def test_preflight_hang_then_dead_child_emits_stall_line():
    """Wedged relay (the r4 failure): preflight never returns AND the child
    measures nothing -> a relay-stalled line inside the deadline, with the
    last validated numbers as stale context and value=null. (The child
    still gets its chance — the preflight is a diagnostic, not a gate; here
    it hangs at the first stage via the test hook.)"""
    obj, elapsed, _ = _run(
        {"BENCH_PREFLIGHT_CMD": "sleep 600", "BENCH_PREFLIGHT_DEADLINE": "3",
         "BENCH_TEST_HANG_STAGE": "inference", "BENCH_DEADLINE": "45",
         "BENCH_MARGIN": "4"},
        timeout=120,
    )
    _check_contract(obj)
    assert obj["value"] is None and obj["vs_baseline"] is None
    assert obj["extra"]["status"].startswith("relay-stalled")
    assert "child then" in obj["extra"]["status"]
    stale = obj["extra"]["last_validated_stale"]
    assert stale["value"] is not None and "source" in stale
    assert elapsed < 90, elapsed


def test_preflight_failure_does_not_veto_a_working_bench():
    """The r5 false-negative regression: a slow/failed preflight must NOT
    gate the bench — with a healthy (tiny, CPU) child the line is the
    child's ok result, annotated with the preflight warning."""
    obj, _, _ = _run(
        {"BENCH_PREFLIGHT_CMD": "exit 7",
         "BENCH_NB": "1", "BENCH_BATCH": "1", "BENCH_LR_SIZE": "16",
         "BENCH_ITERS": "2", "BENCH_SINGLE": "0", "BENCH_TRAIN": "0",
         "BENCH_DEADLINE": "480", "BENCH_PREFLIGHT_DEADLINE": "60"},
        timeout=500,
    )
    _check_contract(obj)
    assert obj["extra"]["status"] == "ok"
    assert obj["value"] is not None and obj["value"] > 0
    assert "rc=7" in obj["extra"]["preflight_warning"]


def test_child_hang_before_any_stage_emits_partial_line():
    """Relay wedges after preflight but before the first measurement: the
    supervisor kills the child at the budget and still emits the line,
    naming the hung stage."""
    obj, elapsed, _ = _run(
        {"BENCH_PREFLIGHT_CMD": "true", "BENCH_TEST_HANG_STAGE": "inference",
         "BENCH_DEADLINE": "30", "BENCH_MARGIN": "4"},
        timeout=90,
    )
    _check_contract(obj)
    assert obj["value"] is None
    assert obj["extra"]["status"].startswith("partial:")
    assert "'inference'" in obj["extra"]["status"]
    assert obj["extra"]["last_validated_stale"]["value"] is not None
    assert elapsed < 60, elapsed


@pytest.mark.slow
def test_child_hang_mid_run_emits_measured_prefix():
    """The inference stage completes, then the relay wedges at the GAN-train
    stage: the emitted line must carry the MEASURED inference number (a real
    tiny-model CPU measurement, not a stale citation)."""
    obj, _, _ = _run(
        {"BENCH_PREFLIGHT_CMD": "true", "BENCH_TEST_HANG_STAGE": "gan_train",
         "BENCH_DEADLINE": "240", "BENCH_MARGIN": "5",
         # tiny-but-real bench config so CPU finishes the inference stage
         "BENCH_NB": "1", "BENCH_BATCH": "1", "BENCH_LR_SIZE": "16",
         "BENCH_ITERS": "2", "BENCH_SINGLE": "0"},
        timeout=300,
    )
    _check_contract(obj)
    assert obj["value"] is not None and obj["value"] > 0
    assert obj["vs_baseline"] is not None
    assert obj["extra"]["status"].startswith("partial:")
    assert "'gan_train'" in obj["extra"]["status"]
    assert "inference" in obj["extra"]["status"]  # listed as completed
    assert "cem_consistency_max_err" in obj["extra"]
    assert "last_validated_stale" not in obj["extra"]  # measured, not stale


@pytest.mark.slow
def test_healthy_path_forwards_child_line():
    """No hooks, tiny config: the supervisor forwards the child's own ok
    line (status=ok, all stages present)."""
    obj, _, _ = _run(
        {"BENCH_NB": "1", "BENCH_BATCH": "1", "BENCH_LR_SIZE": "16",
         "BENCH_ITERS": "2", "BENCH_SINGLE": "0", "BENCH_TRAIN": "0",
         "BENCH_DEADLINE": "480", "BENCH_PREFLIGHT_DEADLINE": "120"},
        timeout=500,
    )
    _check_contract(obj)
    assert obj["extra"]["status"] == "ok"
    assert obj["value"] is not None and obj["value"] > 0


def test_load_last_validated_reads_driver_artifacts():
    sys.path.insert(0, REPO)
    import bench

    rec = bench.load_last_validated()
    # newest non-null driver artifact (BENCH_r03.json as of round 5); must
    # skip the null r04 outage record and never return an empty citation
    assert rec["value"] is not None and rec["value"] > 0
    assert rec["source"].startswith("BENCH_r") or rec["source"].startswith("hardcoded")
    assert rec["source"] != "BENCH_r04.json"


@pytest.mark.slow
def test_toy_cpu_run_does_not_poison_last_full_record():
    """bench_last_full.json is the 'freshest full on-chip run' citation for
    stalled/partial lines; a toy-shape CPU run (this very test suite) must
    never overwrite it (r5 bug: a stalled driver line cited a 0.147 MP/s
    CPU run as last_full_run_this_machine)."""
    path = os.path.join(REPO, ".jax_cache", "bench_last_full.json")
    before = (os.path.getmtime(path), open(path).read()) if os.path.exists(path) else None
    obj, _, _ = _run(
        {"BENCH_NB": "1", "BENCH_BATCH": "1", "BENCH_LR_SIZE": "16",
         "BENCH_ITERS": "2", "BENCH_SINGLE": "0", "BENCH_TRAIN": "0",
         "BENCH_DEADLINE": "480", "BENCH_PREFLIGHT_DEADLINE": "120"},
        timeout=500,
    )
    assert obj["extra"]["status"] == "ok"
    after = (os.path.getmtime(path), open(path).read()) if os.path.exists(path) else None
    assert after == before, "toy CPU child persisted bench_last_full.json"
