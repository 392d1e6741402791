"""CPU smoke tests for the driver-facing benchmark entry points.

The driver runs `python bench.py` on real TPU hardware at the end of
every round and records the one-line JSON in BENCH_r{N}.json; a
regression in bench.py's argument plumbing or JSON contract would
otherwise surface one round late (the same failure mode VERDICT r3
weak #8 called out for the multichip dryrun). These tests execute the
real scripts as subprocesses at tiny shapes on CPU and pin the output
contract, not the numbers.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, extra_env, tmp_path):
    env = dict(os.environ, **extra_env)
    # hermetic compile cache: don't read/write the repo's pre-warmed
    # TPU cache from a CPU test
    env["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "jax_cache")
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run([sys.executable, os.path.join(REPO, script)],
                         env=env, capture_output=True, text=True,
                         timeout=540, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_bench_main_row_json_contract(tmp_path):
    r = _run("bench.py", {
        "BENCH_MODEL": "tiny", "BENCH_W": "64", "BENCH_H": "64",
        "BENCH_FRAMES": "5", "BENCH_STEPS": "2", "BENCH_FLAGSHIP": "0",
        "BENCH_REF_POINT": "0", "BENCH_TRAIN": "0", "BENCH_E2E": "0",
    }, tmp_path)
    assert set(r) >= {"metric", "value", "unit", "vs_baseline", "detail"}
    assert r["unit"] == "s" and r["value"] > 0
    d = r["detail"]
    assert d["dit_step_ms"] > 0 and d["params_dit"] > 0
    # decode must have actually run (BENCH_DECODE defaults on)
    assert isinstance(d["vae_decode_s"], float) and d["vae_decode_s"] >= 0
    assert "decode_error" not in d
    # quality-gated TaylorSeer fast-mode row (BENCH_FAST defaults on):
    # full 50-step schedule through the TS-enabled chunk program
    assert d["fast_mode"]["taylorseer_threshold"] == 2
    assert d["fast_mode"]["sec_per_video"] > 0


def test_bench_e2e_json_contract(tmp_path):
    mp4 = tmp_path / "e2e.mp4"
    r = _run(os.path.join("tools", "bench_e2e.py"), {
        "E2E_MODEL": "tiny", "E2E_W": "64", "E2E_H": "64",
        "E2E_FRAMES": "5", "E2E_STEPS": "2", "E2E_OUT": str(mp4),
    }, tmp_path)
    assert set(r) >= {"e2e_sec_per_video", "encode_s",
                      "denoise_plus_decode_s", "mux_s", "resolution",
                      "steps"}
    assert r["steps"] == 2 and r["resolution"] == "64x64x5f"
    # the mp4 must exist and be non-trivial (the mux stage really ran)
    assert mp4.exists() and mp4.stat().st_size > 500


def test_bench_kontext_json_contract(tmp_path):
    r = _run(os.path.join("tools", "bench_kontext.py"), {
        "KONTEXT_TINY": "1", "KONTEXT_SIZE": "64", "KONTEXT_STEPS": "2",
    }, tmp_path)
    assert r["metric"].startswith("kontext_edit_s_64x64")
    assert r["value"] > 0 and r["unit"] == "s"
    d = r["detail"]
    assert d["steps"] == 2 and d["tokens"] > 0 and d["int8"] is True
