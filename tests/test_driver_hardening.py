"""Hang-proofing of the driver artifacts (VERDICT r4 do #1).

Round 4 shipped empty BENCH/MULTICHIP artifacts because the TPU tunnel can
wedge a jax process forever inside backend init, and both bench.py's retry
and dryrun_multichip's device probe ran IN-PROCESS where nothing could kill
them.  These tests fake the hang (a child/probe that sleeps past its
timeout) and assert the watchdogs recover: bench.py always prints one JSON
line, dryrun_multichip always reaches its CPU re-exec.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(extra_env, timeout=240):
    env = dict(os.environ)
    env.update({
        # generous vs. the fake children's instant prints: on a loaded
        # single-core host even interpreter startup can take seconds, and a
        # timeout that fires before a HEALTHY child prints turns every test
        # below into a false hang (observed at 3s under a corpus rehearsal)
        "PKR_BENCH_ATTEMPT_TIMEOUT": "20",
        "PKR_BENCH_BUDGET_S": "120",
        "PKR_BENCH_ATTEMPTS": "2",
        "PKR_BENCH_QUIET_WAIT": "0",
        "PKR_BENCH_RETRY_SLEEP": "0",
        # hermetic: never touch the host's real pid registry from tests
        "PKR_BENCH_QUIET_PIDS": "/nonexistent/quiet.pids",
        # fake children report tiny emb/s values; disable the degraded-chip
        # floor by default so only the dedicated test exercises it
        "PKR_BENCH_DEGRADED_FLOOR": "0",
        **extra_env,
    })
    out = subprocess.run([sys.executable, BENCH, "--quick"], env=env,
                         capture_output=True, text=True, timeout=timeout)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, out.stdout
    return json.loads(lines[0])


def test_bench_hanging_child_emits_error_json():
    """A child that never returns must not produce an empty artifact: the
    parent kills it at the attempt timeout and emits JSON with an error."""
    res = _run_bench({
        "PKR_BENCH_CHILD": f"{sys.executable} -c 'import time; time.sleep(300)'",
    })
    assert res["value"] is None and res["vs_baseline"] is None
    assert "hung" in res["error"] and res["bench_attempts"] == 2
    assert res["metric"].startswith("wav")


def test_bench_partial_child_keeps_extraction():
    """A hang DURING the train phase keeps the already-printed extraction
    rates (tagged-line protocol) and notes the missing train numbers."""
    snippet = ("import time,sys; "
               "print('PKR_EXTRACT [100.0, 120.0, 110.0]', flush=True); "
               "time.sleep(300)")
    res = _run_bench({
        "PKR_BENCH_CHILD": f'{sys.executable} -c "{snippet}"',
    })
    assert res["value"] == 110.0  # median of the three windows
    assert res["value_best"] == 120.0 and res["n_windows"] == 3
    assert res["vs_baseline"] is not None and res["vs_baseline"] > 0
    assert "train_error" in res and "train_ex_per_s" not in res


def test_bench_healthy_child_full_json():
    snippet = ("import sys; "
               "print('PKR_EXTRACT [200.0, 210.0, 190.0]', flush=True); "
               "print('PKR_TRAIN ' + '{\\\"rates\\\": [50.0, 60.0], "
               "\\\"ex_s\\\": 55.0, \\\"step_ms\\\": 4.0, \\\"mfu\\\": 12.5}', "
               "flush=True)")
    res = _run_bench({
        "PKR_BENCH_CHILD": f'{sys.executable} -c "{snippet}"',
    })
    assert res["value"] == 200.0
    assert res["train_ex_per_s"] == 55.0 and res["train_mfu_pct"] == 12.5
    assert "error" not in res and "train_error" not in res
    assert res["bench_attempts"] == 1


def test_bench_degraded_chip_retries_and_annotates(tmp_path):
    """A responsive-but-crawling tunnel (observed live: jax.devices() fine,
    every dispatch ~12x slow) must not be reported as a clean measurement:
    attempts whose median sits under the floor are retried, the best one is
    kept, and the JSON is flagged suspect_degraded_chip."""
    counter = tmp_path / "n"
    script = tmp_path / "slowchip.py"
    script.write_text(
        "import os\n"
        f"c = {str(counter)!r}\n"
        "n = int(open(c).read()) if os.path.exists(c) else 0\n"
        "open(c, 'w').write(str(n + 1))\n"
        # attempt medians 100, 200: both below the 500 floor; best wins
        "v = 100.0 * (n + 1)\n"
        "print('PKR_EXTRACT [%s, %s, %s]' % (v - 10, v, v + 10), flush=True)\n")
    res = _run_bench({
        "PKR_BENCH_CHILD": f"{sys.executable} {script}",
        "PKR_BENCH_DEGRADED_FLOOR": "500",
    })
    assert res["bench_attempts"] == 2  # retried past the first "success"
    assert res["value"] == 200.0       # best attempt kept, not the first
    assert res["suspect_degraded_chip"] is True
    assert res["healthy_median_ref"] == 6379.45
    assert "degraded chip" in res["bench_notes"]
    assert "error" not in res


def test_bench_degraded_floor_not_tripped_by_healthy_value():
    snippet = ("print('PKR_EXTRACT [600.0, 610.0, 590.0]', flush=True)")
    res = _run_bench({
        "PKR_BENCH_CHILD": f'{sys.executable} -c "{snippet}"',
        "PKR_BENCH_DEGRADED_FLOOR": "500",
    })
    assert res["bench_attempts"] == 1 and res["value"] == 600.0
    assert "suspect_degraded_chip" not in res


def test_bench_failing_then_ok_child_retries(tmp_path):
    """First attempt exits nonzero (the r4 'Unable to initialize backend'
    shape), second succeeds — the parent retries across attempts."""
    marker = tmp_path / "first_try"
    script = tmp_path / "flaky.py"
    script.write_text(
        "import os, sys\n"
        f"m = {str(marker)!r}\n"
        "if not os.path.exists(m):\n"
        "    open(m, 'w').close()\n"
        "    sys.exit(1)\n"
        "print('PKR_EXTRACT [70.0, 80.0, 90.0]', flush=True)\n")
    res = _run_bench({"PKR_BENCH_CHILD": f"{sys.executable} {script}"})
    assert res["value"] == 80.0 and res["bench_attempts"] == 2
    assert "rc=1" in res["bench_notes"]


def test_bench_quiesces_registered_pids(tmp_path):
    """Pids in the registry are SIGSTOPped for the duration of a TPU attempt
    and SIGCONTed after: a loaded single-core host destabilizes the tunnel,
    so the bench must run in a forced-quiet window.  The child itself checks
    the sleeper's /proc state mid-attempt."""
    sleeper = subprocess.Popen(
        [sys.executable, "-c", "import time; time.sleep(120)"])
    pidfile = tmp_path / "quiet.pids"
    pidfile.write_text(f"{sleeper.pid}\n")

    def state():
        raw = open(f"/proc/{sleeper.pid}/stat").read()
        return raw.rsplit(")", 1)[1].split()[0]

    snippet = (f"st = open('/proc/{sleeper.pid}/stat').read()"
               ".rsplit(')', 1)[1].split()[0]; "
               "print('PKR_EXTRACT [100.0]' if st == 'T' "
               "else 'PKR_EXTRACT [0.0]', flush=True)")
    try:
        res = _run_bench({
            "PKR_BENCH_CHILD": f'{sys.executable} -c "{snippet}"',
            "PKR_BENCH_QUIET_PIDS": str(pidfile),
        })
        assert res["value"] == 100.0  # sleeper was stopped mid-attempt
        assert state() in ("S", "R")  # and resumed afterwards
    finally:
        sleeper.kill()
        sleeper.wait()


def test_bench_quiesces_children_of_registered_pids(tmp_path):
    """Registering a wrapper pid must also stop its descendants: the round's
    background studies are launched via nohup'd shells, so the registry
    holds the shell's pid while the CPU burner is a child — and SIGSTOP does
    not propagate (the exact shape that would have left the parity worker
    saturating the core during an r5 TPU window)."""
    childfile = tmp_path / "child.pid"
    wrapper = subprocess.Popen(
        [sys.executable, "-c",
         "import subprocess, sys, time\n"
         "p = subprocess.Popen([sys.executable, '-c',"
         " 'import time; time.sleep(120)'])\n"
         f"open({str(childfile)!r}, 'w').write(str(p.pid))\n"
         "p.wait()\n"])
    for _ in range(100):
        if childfile.exists() and childfile.read_text():
            break
        time.sleep(0.05)
    child_pid = int(childfile.read_text())
    pidfile = tmp_path / "quiet.pids"
    pidfile.write_text(f"{wrapper.pid}\n")  # wrapper only, NOT the child

    def state(pid):
        raw = open(f"/proc/{pid}/stat").read()
        return raw.rsplit(")", 1)[1].split()[0]

    snippet = (f"st = open('/proc/{child_pid}/stat').read()"
               ".rsplit(')', 1)[1].split()[0]; "
               "print('PKR_EXTRACT [100.0]' if st == 'T' "
               "else 'PKR_EXTRACT [0.0]', flush=True)")
    try:
        res = _run_bench({
            "PKR_BENCH_CHILD": f'{sys.executable} -c "{snippet}"',
            "PKR_BENCH_QUIET_PIDS": str(pidfile),
        })
        assert res["value"] == 100.0  # the CHILD was stopped mid-attempt
        assert state(child_pid) in ("S", "R")  # and resumed afterwards
        assert state(wrapper.pid) in ("S", "R")
    finally:
        try:
            os.kill(child_pid, 9)
        except ProcessLookupError:
            pass
        wrapper.kill()
        wrapper.wait()


def test_dryrun_survives_hanging_probe(monkeypatch):
    """dryrun_multichip must reach its CPU re-exec even when the device
    probe wedges (the exact r4 failure: probe hung inside TPU backend init
    before the CPU fallback could run).  The probe runs in a kill-on-timeout
    subprocess now."""
    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    monkeypatch.setenv("PKR_DRYRUN_PROBE", "import time; time.sleep(300)")
    monkeypatch.setenv("PKR_DRYRUN_PROBE_TIMEOUT", "2")
    g.dryrun_multichip(2)  # n=2 keeps the inner CPU compile cheap


def test_dryrun_cpu_reexec_timeout(monkeypatch):
    """A wedged CPU re-exec is killed at PKR_DRYRUN_TIMEOUT and surfaces as
    a RuntimeError instead of eating the driver's budget."""
    import pytest

    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    monkeypatch.setenv("PKR_DRYRUN_PROBE", "import sys; sys.exit(3)")
    monkeypatch.setenv("PKR_DRYRUN_TIMEOUT", "1")
    with pytest.raises(RuntimeError, match="killed after"):
        g.dryrun_multichip(2)
