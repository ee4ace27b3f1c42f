"""Exclusive-use arbiter for the single TPU chip (VERDICT r4 #1a).

Round 4 published a 4.6x-wrong headline because a detached measurement
chain and the driver's bench shared the one TPU: two processes'
lax.scan timings interleaved on the device and the differencing
produced a garbage marginal. The reference never needed this (one
process, one GPU); this project runs benches, detached chains and
profilers concurrently, so device exclusivity must be explicit.

Mechanism: an advisory ``flock`` on a lockfile (default
``~/.cache/flownet2_tf_tpu/tpu.lock``; flock auto-releases when the
holder dies, so no stale-lock cleanup is ever needed). Every
measurement entry point — ``tools/bench.py``, the benchmark scripts'
mains, chain steps — wraps its device work in ``tpu_lock()``. Holder
metadata (pid/label/argv/start time) is written into the file so a
blocked waiter can say WHO it is waiting for.

Re-entrancy: a process that already holds the lock (or whose ancestor
does — chain wrapper -> benchmark -> bench child) must not deadlock on
a second acquire, so holders export ``FLOWNET2_TPU_LOCK_DEPTH`` and
descendants treat the lock as already held.

Escape hatches: ``FLOWNET2_TPU_NO_LOCK=1`` disables locking entirely;
CPU runs (``JAX_PLATFORMS`` containing ``cpu``) skip it automatically —
there is nothing exclusive about the host backend.

CLI (for shell chains):
  python -m flownet2_tf_tpu.tools.arbiter status
  python -m flownet2_tf_tpu.tools.arbiter run [--label L] -- cmd args...
"""

from __future__ import annotations

import contextlib
import errno
import fcntl
import json
import os
import sys
import time

_ENV_DEPTH = "FLOWNET2_TPU_LOCK_DEPTH"
_ENV_DISABLE = "FLOWNET2_TPU_NO_LOCK"
_ENV_PATH = "FLOWNET2_TPU_LOCK_FILE"


def lock_path() -> str:
    default = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "flownet2_tf_tpu", "tpu.lock",
    )
    return os.environ.get(_ENV_PATH, default)


def _locking_disabled() -> bool:
    if os.environ.get(_ENV_DISABLE, "0") == "1":
        return True
    # Host-backend runs (tests, smoke) need no device exclusivity.
    platforms = os.environ.get("JAX_PLATFORMS", "")
    return platforms.strip().lower() in ("cpu", "cpu,")


def holder_info() -> dict | None:
    """Metadata of the current holder, or None (best effort)."""
    try:
        with open(lock_path()) as f:
            return json.loads(f.read() or "null")
    except (OSError, ValueError):
        return None


@contextlib.contextmanager
def tpu_lock(label: str = "", timeout: float = 3600.0, poll: float = 2.0):
    """Hold exclusive use of the TPU for the duration of the block.

    Blocks (polling every ``poll`` s, announcing the holder once) until
    the lock is free or ``timeout`` s elapse, then raises TimeoutError —
    measuring under contention is the one thing this module exists to
    prevent, so there is deliberately no "proceed anyway" path.
    """
    if _locking_disabled() or os.environ.get(_ENV_DEPTH):
        # disabled, or an ancestor of this process already holds it
        yield
        return

    path = lock_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd = os.open(path, os.O_RDWR | os.O_CREAT, 0o644)
    try:
        deadline = time.monotonic() + timeout
        announced = False
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except OSError as e:
                if e.errno not in (errno.EAGAIN, errno.EACCES):
                    raise
            if not announced:
                info = holder_info()
                who = (f"pid {info.get('pid')} ({info.get('label') or '?'}: "
                       f"{' '.join(info.get('argv', []))[:160]})"
                       if info else "unknown holder")
                print(f"[tpu_lock] waiting for {who} "
                      f"(timeout {timeout:.0f}s)", file=sys.stderr,
                      flush=True)
                announced = True
            if time.monotonic() >= deadline:
                raise TimeoutError(
                    f"TPU lock not acquired within {timeout:.0f}s "
                    f"(holder: {holder_info()}); refusing to measure "
                    "under contention"
                )
            time.sleep(poll)

        os.ftruncate(fd, 0)
        os.write(fd, json.dumps({
            "pid": os.getpid(), "label": label, "argv": sys.argv,
            "acquired_unix": time.time(),
        }).encode())
        os.fsync(fd)
        os.environ[_ENV_DEPTH] = "1"  # descendants skip re-acquiring
        try:
            yield
        finally:
            os.environ.pop(_ENV_DEPTH, None)
            # flock releases on close; truncate so `status` shows free
            try:
                os.ftruncate(fd, 0)
            except OSError:
                pass
    finally:
        os.close(fd)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("status", help="print the current holder, if any")
    runp = sub.add_parser("run", help="run a command holding the lock")
    runp.add_argument("--label", default="")
    runp.add_argument("--timeout", type=float, default=3600.0)
    runp.add_argument("argv", nargs=argparse.REMAINDER,
                      help="-- cmd args...")
    args = ap.parse_args(argv)

    if args.cmd == "status":
        info = holder_info()
        print(json.dumps({"lock": lock_path(), "holder": info}))
        return 0

    cmd = args.argv
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("run: no command given (use: run -- cmd args...)")
    import subprocess

    with tpu_lock(label=args.label or cmd[0], timeout=args.timeout):
        return subprocess.call(cmd)


if __name__ == "__main__":
    raise SystemExit(main())
