"""Multi-host metric correctness: two REAL JAX processes (CPU backend,
2 local devices each -> a 4-device global mesh) run Trainer.single_val on
different per-process val shards. Both ranks must report identical GLOBAL
metrics, and the total must be the global example count — the capability
the reference gets from torchmetrics dist_reduce_fx='sum'
(main.py:1155-1167)."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(script: str):
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    return [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", script),
             str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, cwd=REPO, env=env,
        )
        for i in range(2)
    ]


def test_single_val_reports_global_metrics_across_processes():
    procs = _run_workers("_multihost_worker.py")
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=840)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"no RESULT line in:\n{out[-3000:]}"
        _, acc, total, loss, p0 = lines[-1].split()
        results.append((float(acc), int(total), float(loss), float(p0)))

    (acc0, tot0, loss0, p00), (acc1, tot1, loss1, p01) = results
    # both ranks agree on the same GLOBAL numbers
    assert acc0 == pytest.approx(acc1, abs=1e-9)
    # total is the GLOBAL count: 2 batches x 8/process x 2 processes
    assert tot0 == tot1 == 32
    # training on per-rank-different data: loss and updated params are
    # globally reduced, hence rank-identical
    assert loss0 == pytest.approx(loss1, abs=1e-6)
    assert p00 == pytest.approx(p01, rel=1e-6)


def test_multihost_eval_globally_reduces_robust_accuracy():
    """Two processes each attack their own round-robin shard; both must
    report identical GLOBAL clean/robust accuracy over the FULL set (the
    reference's GPU-farm eval parallelism mapped to hosts)."""
    procs = _run_workers("_multihost_eval_worker.py")
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=840)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost eval worker timed out")
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"no RESULT line in:\n{out[-3000:]}"
        _, clean, racc, n = lines[-1].split()
        results.append((float(clean), float(racc), int(n)))

    (c0, r0, n0), (c1, r1, n1) = results
    assert n0 == n1 == 32  # global count = full set
    assert c0 == pytest.approx(c1, abs=1e-9)
    assert r0 == pytest.approx(r1, abs=1e-9)
    # the weak linear model must lose points to APGD-CE at eps=0.1
    assert r0 < c0
