"""Checkpoint-root hygiene (plans/chain.py): the crash-leftover purge
must never rmtree a LIVE concurrent run's checkpoints — including a run
owned by a DIFFERENT host sharing the checkpoint mount (ADVICE r4 #3:
pid numbers don't transfer across hosts, so foreign-host dirs fall back
to the mtime TTL instead of the local pid-liveness probe)."""

from __future__ import annotations

import os
import socket
import subprocess
import time

from deduplicator_spark.plans.chain import _stale_app_dir


def _app_dir(tmp_path, pidfile: str) -> str:
    p = tmp_path / "app"
    p.mkdir(exist_ok=True)
    (p / ".driver-pid").write_text(pidfile)
    return str(p)


def test_foreign_host_pidfile_falls_back_to_ttl(tmp_path):
    p = _app_dir(tmp_path, "424242@definitely-not-this-host")
    now = time.time()
    # fresh foreign dir: NOT stale, even though pid 424242 may not
    # exist locally (the remote driver may be alive and mid-run)
    assert _stale_app_dir(p, now, ttl=3600) is False
    # but a foreign dir past the TTL is purgeable
    assert _stale_app_dir(p, now + 7200, ttl=3600) is True


def test_local_live_pid_never_stale_regardless_of_age(tmp_path):
    p = _app_dir(tmp_path, f"{os.getpid()}@{socket.gethostname()}")
    assert _stale_app_dir(p, time.time() + 10**7, ttl=1) is False


def test_local_dead_pid_is_stale(tmp_path):
    proc = subprocess.Popen(["true"])
    proc.wait()
    p = _app_dir(tmp_path, f"{proc.pid}@{socket.gethostname()}")
    assert _stale_app_dir(p, time.time(), ttl=3600) is True


def test_legacy_pid_only_format_still_probes_locally(tmp_path):
    # pre-hostname pidfiles ("12345") keep the local liveness semantics
    p = _app_dir(tmp_path, str(os.getpid()))
    assert _stale_app_dir(p, time.time() + 10**7, ttl=1) is False


def test_unreadable_pidfile_uses_ttl(tmp_path):
    p = _app_dir(tmp_path, "not-a-pid@host")
    now = time.time()
    assert _stale_app_dir(p, now, ttl=3600) is False
    assert _stale_app_dir(p, now + 7200, ttl=3600) is True
