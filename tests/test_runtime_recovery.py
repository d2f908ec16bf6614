"""Failure-recovery harness actually exercised: a worker process is
KILLED mid-run (hard ``os._exit``, no cleanup) and a restarted process
must resume from the last checkpoint and finish with state BIT-EXACT to
an uninterrupted run.

The reference has no failure handling at all (SURVEY §5 — print-and-
continue); this pins the thin restart harness
``parallel/runtime.py::checkpointed_loop`` end to end, across a real
process boundary.
"""

import os
import subprocess
import sys

import numpy as np

_WORKER = r"""
import os, sys
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from invcompcamtrack_tpu.parallel.runtime import checkpointed_loop

ckpt = sys.argv[1]
crash_at = int(sys.argv[2])        # -1: run to completion
out_path = sys.argv[3]

# a deterministic, state-coupled iteration (logistic-map-flavored GN
# surrogate): any divergence after resume is visible bit-wise
A = jnp.asarray(np.random.default_rng(3).normal(size=(16, 16)), jnp.float32)

@jax.jit
def update(x, step):
    y = jnp.tanh(A @ x) + 0.1 * jnp.sin(step.astype(jnp.float32) * x)
    return y / jnp.maximum(jnp.linalg.norm(y), 1e-6)

def step_fn(state, i):
    if i == crash_at:
        os._exit(17)               # simulated hard host failure
    return {"x": update(state["x"], jnp.asarray(i, jnp.int32))}

state0 = {"x": jnp.asarray(np.random.default_rng(0).normal(size=16), jnp.float32)}
final = checkpointed_loop(step_fn, state0, num_steps=30, ckpt_path=ckpt,
                          every=5, resume=True)
np.save(out_path, np.asarray(final["x"]))
print("done")
"""


def _run(tmp_path, name, crash_at):
    ckpt = tmp_path / f"ckpt_{name}"
    out = tmp_path / f"out_{name}.npy"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    return subprocess.run(
        [sys.executable, str(script), str(ckpt), str(crash_at), str(out)],
        env=env, capture_output=True, text=True, timeout=300,
    ), ckpt, out


def test_crash_resume_bit_exact(tmp_path):
    # uninterrupted oracle
    r0, _, out0 = _run(tmp_path, "oracle", -1)
    assert r0.returncode == 0, r0.stderr[-2000:]

    # worker killed at step 17 (checkpoint exists at step 15)
    r1, ckpt, out1 = _run(tmp_path, "crash", 17)
    assert r1.returncode == 17, (r1.returncode, r1.stderr[-2000:])
    assert not out1.exists()
    assert os.path.exists(str(ckpt) + ".npz") or os.path.exists(
        str(ckpt) + ".orbax"), "no checkpoint written before the crash"

    # restart: resumes from step 15, must land bit-exact on the oracle
    r2, _, out1 = _run(tmp_path, "crash", -1)
    assert r2.returncode == 0, r2.stderr[-2000:]
    np.testing.assert_array_equal(np.load(out1), np.load(out0))


def test_double_crash_resume(tmp_path):
    """Two successive failures (steps 7 and 23) still recover exactly."""
    r0, _, out0 = _run(tmp_path, "oracle", -1)
    assert r0.returncode == 0, r0.stderr[-2000:]
    r, _, _ = _run(tmp_path, "dc", 7)
    assert r.returncode == 17
    r, _, _ = _run(tmp_path, "dc", 23)
    assert r.returncode == 17
    r, _, out = _run(tmp_path, "dc", -1)
    assert r.returncode == 0, r.stderr[-2000:]
    np.testing.assert_array_equal(np.load(out), np.load(out0))
