"""bench.py exclusive-TPU guard (wait_for_exclusive).

ONE process may use the TPU at a time; the driver runs bench.py at round
end, which must not contend with an unattended measurement queue
(experiments/run_queue*.sh). These tests exercise the pidfile protocol on
CPU only — no TPU, no jax work.
"""

import os
import subprocess
import sys
import time

import bench
import pytest


@pytest.fixture(autouse=True)
def _reset_lock_global():
    """The lock fd is module-global (held for process life in production);
    tests must not leak an acquired fd into the next test, or bench would
    skip acquisition there and assert against a stale lock."""
    yield
    if bench._TPU_LOCK_FD is not None:
        bench._TPU_LOCK_FD.close()
        bench._TPU_LOCK_FD = None


def _wait_for_cmdline(pid, needle: bytes, timeout_s: float = 10.0):
    """Block until /proc/<pid>/cmdline contains `needle`.

    Real queue watchers write their pidfile from INSIDE the script (after
    exec), so bench never sees a pre-exec cmdline. These tests write the
    pidfile from the parent, racing the child's execve — on a loaded host
    the child can still be a forked copy of pytest when bench reads its
    cmdline, and bench (correctly) classifies it as a non-queue process."""
    deadline = time.perf_counter() + timeout_s
    while time.perf_counter() < deadline:
        try:
            if needle in open(f"/proc/{pid}/cmdline", "rb").read():
                return
        except OSError:
            pass
        time.sleep(0.01)
    raise AssertionError(f"child {pid} never exec'd into {needle!r}")


def test_no_pidfiles_returns_immediately(tmp_path):
    t0 = time.perf_counter()
    bench.wait_for_exclusive(max_wait_s=30, pattern=str(tmp_path / "queue*.pid"),
                             lock_path=str(tmp_path / "tpu.lock"))
    assert time.perf_counter() - t0 < 5


def test_stale_pidfile_ignored(tmp_path):
    # a pid that is certainly dead (max_pid+? use a recently-exited child)
    child = subprocess.Popen([sys.executable, "-c", "pass"])
    child.wait()
    (tmp_path / "queue.pid").write_text(str(child.pid))
    t0 = time.perf_counter()
    bench.wait_for_exclusive(max_wait_s=30, pattern=str(tmp_path / "queue*.pid"),
                             lock_path=str(tmp_path / "tpu.lock"))
    assert time.perf_counter() - t0 < 5


def test_live_non_queue_process_ignored(tmp_path):
    # live pid whose cmdline does NOT contain run_queue: not a queue watcher
    child = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(30)"])
    try:
        (tmp_path / "queue.pid").write_text(str(child.pid))
        t0 = time.perf_counter()
        bench.wait_for_exclusive(max_wait_s=30, pattern=str(tmp_path / "queue*.pid"),
                             lock_path=str(tmp_path / "tpu.lock"))
        assert time.perf_counter() - t0 < 5
    finally:
        child.kill()
        child.wait()


def test_live_queue_blocks_until_bounded_giveup(tmp_path):
    # live pid with run_queue in its cmdline: bench must wait, then give up
    # at the (tiny) bound rather than hang
    fake = tmp_path / "fake_run_queue.sh"
    fake.write_text("#!/bin/bash\nsleep 30\n")
    child = subprocess.Popen(["bash", str(fake)])
    try:
        _wait_for_cmdline(child.pid, b"fake_run_queue")
        (tmp_path / "queue.pid").write_text(str(child.pid))
        t0 = time.perf_counter()
        bench.wait_for_exclusive(max_wait_s=1.0, pattern=str(tmp_path / "queue*.pid"),
                                 lock_path=str(tmp_path / "tpu.lock"))
        elapsed = time.perf_counter() - t0
        assert 0.9 <= elapsed < 10
    finally:
        child.kill()
        child.wait()


def test_live_queue_releases(tmp_path):
    # queue finishes mid-wait: bench proceeds well before the bound
    fake = tmp_path / "fake_run_queue.sh"
    fake.write_text("#!/bin/bash\nsleep 2\n")
    child = subprocess.Popen(["bash", str(fake)])
    try:
        _wait_for_cmdline(child.pid, b"fake_run_queue")
        (tmp_path / "queue.pid").write_text(str(child.pid))
        t0 = time.perf_counter()
        bench.wait_for_exclusive(max_wait_s=120, poll_s=0.25,
                                 pattern=str(tmp_path / "queue*.pid"),
                                 lock_path=str(tmp_path / "tpu.lock"))
        assert time.perf_counter() - t0 < 30
    finally:
        if child.poll() is None:
            child.kill()
        child.wait()


def test_flock_held_elsewhere_blocks_until_bounded_giveup(tmp_path):
    # queue12+ hold /tmp/tpu_queue.lock instead of (only) a pidfile: bench
    # must wait on the lock, then give up at the bound. flock conflicts are
    # per open-file-description, so a second fd in this process stands in
    # for the queue's bash.
    import fcntl

    lock = tmp_path / "tpu.lock"
    holder = open(lock, "w")
    fcntl.flock(holder, fcntl.LOCK_EX)
    try:
        t0 = time.perf_counter()
        bench.wait_for_exclusive(max_wait_s=1.0, poll_s=0.25,
                                 pattern=str(tmp_path / "queue*.pid"),
                                 lock_path=str(lock))
        assert 0.9 <= time.perf_counter() - t0 < 10
        assert bench._TPU_LOCK_FD is None
    finally:
        holder.close()


def test_flock_acquired_and_held_for_process_life(tmp_path):
    # free lock: bench acquires it immediately and KEEPS it, so a queue
    # launched while bench runs waits for bench
    import fcntl

    lock = tmp_path / "tpu.lock"
    t0 = time.perf_counter()
    bench.wait_for_exclusive(max_wait_s=30,
                             pattern=str(tmp_path / "queue*.pid"),
                             lock_path=str(lock))
    try:
        assert time.perf_counter() - t0 < 5
        assert bench._TPU_LOCK_FD is not None
        probe = open(lock, "w")
        try:
            fcntl.flock(probe, fcntl.LOCK_EX | fcntl.LOCK_NB)
            raise AssertionError("lock was not held")
        except OSError:
            pass
        finally:
            probe.close()
    finally:
        bench._TPU_LOCK_FD.close()
        bench._TPU_LOCK_FD = None


def test_ancestor_queue_is_self(tmp_path):
    # the queue runs bench.py itself: if the pidfile names one of our own
    # ancestors, bench must NOT wait on it (else the queue deadlocks).
    # Reconstruct the production shape exactly — a bash whose cmdline
    # contains "run_queue" writes $$ to the pidfile, then CALLS a python
    # child running wait_for_exclusive; the child must return fast via the
    # ancestor short-circuit even though a live run_queue pid is listed.
    # (An earlier version asserted os.getppid() is an ancestor of pytest
    # itself, which breaks whenever the suite is launched `nohup ... &`
    # and pytest is reparented to pid 1.)
    repo = os.path.dirname(os.path.abspath(bench.__file__))
    inner = tmp_path / "inner.py"
    inner.write_text(
        "import sys, time\n"
        f"sys.path.insert(0, {repo!r})\n"
        "import bench\n"
        "t0 = time.perf_counter()\n"
        f"bench.wait_for_exclusive(max_wait_s=30,\n"
        f"                         pattern={str(tmp_path / 'queue*.pid')!r},\n"
        f"                         lock_path={str(tmp_path / 'tpu.lock')!r})\n"
        "elapsed = time.perf_counter() - t0\n"
        "assert elapsed < 5, f'waited on own ancestor: {elapsed:.1f}s'\n"
    )
    script = tmp_path / "fake_run_queue.sh"
    script.write_text(
        f"#!/bin/bash\necho $$ > {tmp_path}/queue.pid\n"
        f"{sys.executable} {inner}\n"
    )
    res = subprocess.run(["bash", str(script)], timeout=90)
    assert res.returncode == 0
