"""bench.py must fail legibly (VERDICT r2 weak #6 / next-round item 7).

When the TPU backend is unreachable the driver's BENCH_r*.json must contain
ONE parseable JSON diagnostic line, not a 30-line jax traceback. We simulate
the failure in a subprocess by forcing a nonexistent platform and a 1s probe
timeout, then assert the last stdout line parses and carries the error key.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(extra_env, args=()):
    env = dict(os.environ)
    # Neutralize the test conftest's CPU forcing: the subprocess must try (and
    # fail) to init the requested platform like the driver's real invocation.
    env.update(extra_env)
    return subprocess.run(
        [sys.executable, "bench.py", *args],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=120,
    )


def test_backend_failure_emits_one_json_line(tmp_path):
    # Env knobs can't force an init failure here: the axon plugin ignores
    # JAX_PLATFORMS, so when the tunnel is up "tpu"/bogus names still resolve
    # and bench.py runs the real benchmark (observed 2026-08-19). Instead,
    # shadow `jax` in the probe child with a module that raises at import —
    # the probe subprocess exits nonzero exactly like a real backend-init
    # error, independent of chip reachability.
    (tmp_path / "jax").mkdir()
    (tmp_path / "jax" / "__init__.py").write_text(
        "raise RuntimeError('simulated backend init failure')\n"
    )
    res = _run_bench({
        "PYTHONPATH": str(tmp_path),
        "HGS_BENCH_PROBE_TIMEOUT": "30",
    })
    assert res.returncode == 1
    lines = [l for l in res.stdout.strip().splitlines() if l.strip()]
    assert lines, f"no stdout; stderr tail: {res.stderr[-500:]}"
    rec = json.loads(lines[-1])
    assert rec["metric"] == "hgsfusion_vod_polar_e2e_inference"
    assert rec["value"] == 0.0
    assert rec["vs_baseline"] == 0.0
    assert "error" in rec and rec["error"]
    assert "detail" in rec


def test_probe_timeout_maps_to_tpu_unavailable():
    # A 0-second alarm fires before backend init completes even on CPU,
    # exercising the TimeoutError -> "tpu-unavailable" classification.
    res = _run_bench({
        "JAX_PLATFORMS": "cpu",
        "HGS_BENCH_PROBE_TIMEOUT": "0",
    }, args=["--tj4d", "--batch", "2"])
    assert res.returncode == 1
    rec = json.loads(res.stdout.strip().splitlines()[-1])
    assert rec["error"] == "tpu-unavailable"
    assert rec["metric"] == "hgsfusion_tj4d_b2_e2e_inference"
