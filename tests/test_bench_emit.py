"""Contract tests for bench.py's always-emit machinery (VERDICT r3 item 1:
BENCH_r03 was a timeout with no JSON line; the driver must ALWAYS get one
parseable record).

Run in subprocesses so signal/atexit behavior is observed for real,
without touching any jax backend.
"""
import json
import os
import signal
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code):
    return subprocess.run([sys.executable, "-c", code], cwd=REPO,
                          capture_output=True, text=True, timeout=120)


def test_sigterm_after_install_still_emits_one_json_line():
    r = _run(
        "import os, signal\n"
        "import bench\n"
        "bench._install_emit_hooks()\n"
        "bench.RESULT['value'] = 42.5\n"
        "os.kill(os.getpid(), signal.SIGTERM)\n"
    )
    # exit code reflects the re-raised signal
    assert r.returncode == -signal.SIGTERM, (r.returncode, r.stderr)
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, r.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "pairs_per_sec_512dpt"
    assert rec["value"] == 42.5


def test_normal_exit_after_install_emits_exactly_once():
    r = _run(
        "import bench\n"
        "bench._install_emit_hooks()\n"
        "bench.RESULT['value'] = 7.0\n"
        "bench.emit()\n"  # explicit emit at end of main() ...
        # ... then the atexit hook fires too; _EMITTED must dedupe
    )
    assert r.returncode == 0, r.stderr
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, r.stdout
    assert json.loads(lines[0])["value"] == 7.0


def test_plain_import_is_side_effect_free():
    """Scripts import bench to reuse sections (e.g. scripts/exp_r4_sgbs.py);
    they must not inherit a bogus zero-value JSON record or rewired
    signal handlers."""
    r = _run(
        "import signal\n"
        "import bench\n"
        "assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL\n"
        "print('MARKER')\n"
    )
    assert r.returncode == 0, r.stderr
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert lines == ["MARKER"], r.stdout


def test_headline_force_runs_with_budget_exhausted():
    """The headline sections pass force=True to _try: a record whose
    `value` is 0.0 is worthless, so budget exhaustion (observed once as
    a 2902 s tunnel wedge inside the first device op) must not skip
    them. Non-forced sections still honor the gate."""
    r = _run(
        "import bench\n"
        "bench.BUDGET_S = 0.0\n"                     # budget already gone
        "assert bench._try('gated', 10, lambda: 42) is None\n"
        "assert bench._try('forced', 10, lambda: 42, force=True) == 42\n"
        "print('OK')\n"
    )
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout
