"""Self-healing for wedged Python workers on flaky hosts.

Failure mode observed on this shared-host VM (high CPU steal): a
pyspark.worker blocks forever in a socket read (`wait_woken`, zero CPU
accumulation) while the JVM waits for its task result — the stage
stalls at N-1/N indefinitely. Spark's speculative execution is
hard-disabled in local mode, so nothing ever re-launches the task.

The watchdog thread samples CPU jiffies of the driver JVM and every
pyspark.daemon/worker process. If the ENTIRE tree accumulates ~no CPU
across `stall_secs` while the process is supposed to be working, it
SIGKILLs the zero-delta workers; with task retries enabled
(master local[N,4], session.py) Spark re-runs the lost task and the
job completes. No effect on healthy runs: any forward progress
anywhere in the tree resets the stall clock.
"""

from __future__ import annotations

import os
import signal
import threading
import time

_HZ = os.sysconf("SC_CLK_TCK")


def _cpu_seconds(pid: int) -> float | None:
    try:
        with open(f"/proc/{pid}/stat", "rb") as f:
            parts = f.read().rsplit(b")", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / _HZ  # utime + stime
    except (FileNotFoundError, ProcessLookupError, IndexError):
        return None


def _ppid(pid: int) -> int | None:
    try:
        with open(f"/proc/{pid}/stat", "rb") as f:
            parts = f.read().rsplit(b")", 1)[1].split()
        return int(parts[1])  # field 4 = ppid (fields 1-2 consumed by comm)
    except (FileNotFoundError, ProcessLookupError, IndexError, ValueError):
        return None


def _is_descendant(pid: int, ancestor: int, cache: dict[int, bool]) -> bool:
    """True iff `ancestor` appears on pid's ppid chain (memoized)."""
    chain = []
    cur = pid
    while cur not in (0, 1, None):
        if cur == ancestor:
            result = True
            break
        if cur in cache:
            result = cache[cur]
            break
        chain.append(cur)
        cur = _ppid(cur)
    else:
        result = False
    for c in chain:
        cache[c] = result
    return result


def _spark_pids() -> tuple[list[int], list[int]]:
    """(jvm pids, python worker/daemon pids) of THIS session's Spark —
    candidates are filtered to descendants of this process, so a
    concurrent Spark job on the same host can neither mask a real stall
    (its CPU would reset the stall clock) nor get its workers killed."""
    jvms, workers = [], []
    me = os.getpid()
    cache: dict[int, bool] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        pid = int(d)
        if pid == me:
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read()
        except (FileNotFoundError, ProcessLookupError, PermissionError):
            continue
        if b"pyspark.daemon" not in cmd and b"org.apache.spark.deploy.SparkSubmit" not in cmd:
            continue
        if not _is_descendant(pid, me, cache):
            continue
        if b"pyspark.daemon" in cmd:
            workers.append(pid)
        else:
            jvms.append(pid)
    return jvms, workers


def start_watchdog(stall_secs: float = 150.0, poll_secs: float = 15.0):
    """Start the daemon thread; returns a stop() callable."""
    stop = threading.Event()

    def run() -> None:
        last: dict[int, float] = {}
        stalled_since: float | None = None
        while not stop.wait(poll_secs):
            jvms, workers = _spark_pids()
            if not jvms:
                last.clear()
                stalled_since = None
                continue
            delta = 0.0
            now_cpu: dict[int, float] = {}
            for pid in jvms + workers:
                c = _cpu_seconds(pid)
                if c is None:
                    continue
                now_cpu[pid] = c
                delta += max(0.0, c - last.get(pid, c))
            progressing = delta > 0.5 * poll_secs / 15.0  # ~0.5 s CPU / 15 s
            if progressing or not last:
                stalled_since = None
            elif stalled_since is None:
                stalled_since = time.time()
            elif time.time() - stalled_since >= stall_secs:
                for pid in workers:
                    if abs(now_cpu.get(pid, 0.0) - last.get(pid, 0.0)) < 1e-9:
                        try:
                            os.kill(pid, signal.SIGKILL)
                            print(f"# stall_watchdog: killed wedged worker {pid}",
                                  flush=True)
                        except ProcessLookupError:
                            pass
                stalled_since = None
            last = now_cpu

    t = threading.Thread(target=run, name="stall_watchdog", daemon=True)
    t.start()
    return stop.set
