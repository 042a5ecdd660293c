"""bench.py resilience: the round headline must never become a stack
trace — a hung or erroring backend init yields a RuntimeError that the
__main__ wrapper converts into the one-line JSON with an "error" field
(VERDICT r4 §weak 2; the axon plugin has shown BOTH failure modes:
fast init RuntimeError and an indefinite jax.devices() hang)."""

import json
import subprocess
import sys
import threading
import time

import pytest


def _load_bench():
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench.py",
    )
    spec = importlib.util.spec_from_file_location("bench_module", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_init_backend_ok_fast_path(monkeypatch):
    bench = _load_bench()
    import jax

    monkeypatch.setattr(jax, "devices", lambda: ["fake-dev"])
    bench._init_backend(attempts=1, timeout_s=5.0)  # no raise


def test_init_backend_hang_raises_within_deadline(monkeypatch):
    bench = _load_bench()
    import jax

    release = threading.Event()

    def hang():
        release.wait(30.0)
        return []

    monkeypatch.setattr(jax, "devices", hang)
    t0 = time.time()
    with pytest.raises(RuntimeError, match="hung"):
        bench._init_backend(attempts=3, timeout_s=1.0)
    # The hang mode bails after ONE probe (a same-process retry would
    # re-join the same stuck init) — not attempts * timeout.
    assert time.time() - t0 < 10.0
    release.set()


def test_init_backend_error_retries_then_raises(monkeypatch):
    bench = _load_bench()
    import jax

    calls = []

    def boom():
        calls.append(1)
        raise RuntimeError("Unable to initialize backend 'axon'")

    monkeypatch.setattr(jax, "devices", boom)
    monkeypatch.setattr(time, "sleep", lambda s: None)
    with pytest.raises(RuntimeError, match="backend unavailable"):
        bench._init_backend(attempts=3, timeout_s=5.0)
    assert len(calls) == 3


def test_bench_emits_single_json_line_on_failure():
    """Drive the REAL `python bench.py` __main__ with an injected fault:
    stdout must be exactly one parseable JSON line with the error field
    and rc must be 0 (the driver records stdout as the round's headline
    artifact — a traceback or rc!=0 loses the round's number)."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, HD_BENCH_FAIL="injected-by-test")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, timeout=120, env=env, cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-500:]
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, out.stdout
    payload = json.loads(lines[0])
    assert payload["metric"] == "video_to_smpl_frames_per_sec_per_chip"
    assert payload["value"] is None
    assert payload["error"] == "RuntimeError: injected-by-test"
