"""Real multi-process execution of the distributed paths (VERDICT r4 ask #5).

Two `jax.distributed.initialize` CPU processes (gloo collectives, 4 fake
devices each) run (a) one data-parallel train step and (b) one sharded
rollout through `mesh.shard_batch`'s process-local branch
(make_array_from_process_local_data), and the results are compared against
a single-process 8-device run of the identical global computation — the
analogue of the reference's torchrun DDP path (ref:train.py:118-131).

These spawn subprocesses (jax.distributed cannot re-initialize in-process),
so they are slower than the rest of the suite (~1 min each).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO  # drop any sitecustomize that pins a backend
    env.pop("JAX_PLATFORMS", None)
    return env


def _run_single(mode, out, timeout=420):
    subprocess.run([sys.executable, WORKER, "--mode", mode, "--out", out],
                   check=True, env=_env(), timeout=timeout,
                   stdout=subprocess.PIPE, stderr=subprocess.STDOUT)


def _run_dist(mode, out, port, nproc=2, timeout=420):
    procs = [subprocess.Popen(
        [sys.executable, WORKER, "--mode", mode, "--out", out,
         "--pid", str(i), "--nproc", str(nproc), "--port", str(port)],
        env=_env(), stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(nproc)]
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode(errors="replace")[-2000:]


@pytest.mark.parametrize("mode,port", [("train", 12621), ("rollout", 12622)])
def test_two_process_matches_single(tmp_path, mode, port):
    single = str(tmp_path / f"{mode}_single.npz")
    dist = str(tmp_path / f"{mode}_dist.npz")
    _run_single(mode, single)
    _run_dist(mode, dist, port)
    a, b = np.load(single), np.load(dist)
    assert set(a.files) == set(b.files)
    for k in a.files:
        np.testing.assert_allclose(
            a[k], b[k], rtol=1e-6, atol=1e-7,
            err_msg=f"{mode}:{k} diverges between 1-process and 2-process")
