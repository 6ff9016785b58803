"""True multi-process multi-host dryrun (SURVEY.md §5.8, VERDICT r1 #7).

Launches N separate Python processes, each with its own forced-CPU jax
runtime, joined into one process group via jax.distributed over localhost —
the same mechanics a TPU pod uses over DCN. One DP train step runs over the
global (cross-process) mesh; every process must report identical metrics,
equal to a single-process run with the same seed and global mesh size."""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _worker_env(local_devices: int) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO  # drop any sitecustomize that pins the TPU relay
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={local_devices}"
    env.pop("JAX_NUM_PROCESSES", None)
    return env


def _run_worker(args: list[str], local_devices: int) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, "-m", "esr_tpu.parallel.multihost", *args],
        env=_worker_env(local_devices),
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        cwd=REPO,
    )


def _parse(proc: subprocess.Popen, timeout: int = 420) -> dict:
    out, err = proc.communicate(timeout=timeout)
    assert proc.returncode == 0, f"worker failed rc={proc.returncode}\n{out}\n{err}"
    return json.loads(out.strip().splitlines()[-1])


def test_multiprocess_dp_step_matches_single_process():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    n_proc, local_dev = 2, 2
    workers = [
        _run_worker(
            [
                "--coordinator",
                f"localhost:{port}",
                "--num-processes",
                str(n_proc),
                "--process-id",
                str(i),
            ],
            local_dev,
        )
        for i in range(n_proc)
    ]
    results = [_parse(w) for w in workers]

    # same 4-device global mesh, one process
    single = _parse(_run_worker([], n_proc * local_dev))

    for i, r in enumerate(results):
        assert r["process"] == i and r["process_count"] == n_proc
        assert r["n_devices"] == n_proc * local_dev
    assert single["process_count"] == 1 and single["n_devices"] == n_proc * local_dev

    # every process observed the identical psum'd loss and updated params,
    # and the multi-process step equals the single-process step exactly
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)
    assert results[0]["param_l1"] == pytest.approx(results[1]["param_l1"], rel=1e-6)
    assert single["loss"] == pytest.approx(results[0]["loss"], rel=1e-5)
    assert single["param_l1"] == pytest.approx(results[0]["param_l1"], rel=1e-5)
