#!/usr/bin/env python3
"""Crash-proof TPU job queue (round 4; VERDICT r3 item 8).

- SINGLE instance enforced by fcntl.flock on .exp/queue/lock (no pgrep —
  the round-3 queue deadlocked matching its own launcher's cmdline).
- Jobs are lines of .exp/queue/jobs.jsonl:
      {"name": "mxu_ab", "cmd": ["python", ".exp/mxu_f64_ab.py"],
       "timeout": 5400, "env": {"HASH": "blake3_192"}}
  Append lines while the runner is live — it polls for new ones.
- Every finished job appends ONE line to .exp/queue/results.jsonl
  (name, rc, seconds, out/err tails) — a mid-queue death loses at most
  the in-flight job, never recorded evidence.
- A cursor file (.exp/queue/cursor) records how many job lines are done,
  so restarting the runner resumes instead of re-running.
- Stop: `touch .exp/queue/stop` (checked between jobs).  Idle exit after
  IDLE_EXIT_S with no new jobs.
"""
import fcntl
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QDIR = os.path.join(ROOT, ".exp", "queue")
os.makedirs(QDIR, exist_ok=True)
JOBS = os.path.join(QDIR, "jobs.jsonl")
RESULTS = os.path.join(QDIR, "results.jsonl")
CURSOR = os.path.join(QDIR, "cursor")
STOP = os.path.join(QDIR, "stop")
LOCK = os.path.join(QDIR, "lock")
IDLE_EXIT_S = int(os.environ.get("QRUN_IDLE_EXIT", "86400"))

lock_fd = open(LOCK, "w")
try:
    fcntl.flock(lock_fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
except OSError:
    print("another qrun holds the lock; exiting", flush=True)
    sys.exit(0)
lock_fd.write(str(os.getpid()))
lock_fd.flush()


def log(msg):
    line = f"{time.strftime('%FT%TZ', time.gmtime())} {msg}"
    print(line, flush=True)


def record(obj):
    with open(RESULTS, "a") as f:
        f.write(json.dumps(obj) + "\n")


def tail(path, n=2048):
    try:
        with open(path, "rb") as f:
            f.seek(0, 2)
            size = f.tell()
            f.seek(max(0, size - n))
            return f.read().decode("utf-8", "replace")
    except OSError:
        return ""


def read_cursor():
    try:
        return int(open(CURSOR).read().strip())
    except (OSError, ValueError):
        return 0


def run_job(job):
    name = job["name"]
    out_p = os.path.join(QDIR, name + ".out")
    err_p = os.path.join(QDIR, name + ".err")
    env = dict(os.environ)
    env.update(job.get("env", {}))
    env.setdefault("PYTHONUNBUFFERED", "1")
    timeout = int(job.get("timeout", 5400))
    cmd = job["cmd"]
    log(f"START {name}: {' '.join(cmd)} (timeout {timeout}s)")
    t0 = time.time()
    with open(out_p, "ab") as fo, open(err_p, "ab") as fe:
        try:
            proc = subprocess.Popen(
                cmd, cwd=ROOT, env=env, stdout=fo, stderr=fe,
                stdin=subprocess.DEVNULL, start_new_session=True)
            try:
                rc = proc.wait(timeout=timeout)
                status = "ok" if rc == 0 else "fail"
            except subprocess.TimeoutExpired:
                # kill the whole process group (exact pgid — never a pattern)
                try:
                    os.killpg(proc.pid, 15)
                    time.sleep(10)
                    os.killpg(proc.pid, 9)
                except ProcessLookupError:
                    pass
                proc.wait()
                rc, status = -1, "timeout"
        except Exception as e:  # spawn failure
            rc, status = -2, f"spawn-error: {e}"
    dt = time.time() - t0
    log(f"END {name}: {status} rc={rc} {dt:.0f}s")
    record({
        "name": name, "status": status, "rc": rc, "seconds": round(dt, 1),
        "ts": time.strftime("%FT%TZ", time.gmtime()),
        "cmd": cmd, "env": job.get("env", {}),
        "out_tail": tail(out_p), "err_tail": tail(err_p, 1536),
    })


def main():
    done = read_cursor()
    idle_since = time.time()
    log(f"qrun pid={os.getpid()} resuming at cursor {done}")
    while True:
        if os.path.exists(STOP):
            log("stop file found; exiting")
            return
        lines = []
        try:
            with open(JOBS) as f:
                lines = [ln for ln in f.read().splitlines() if ln.strip()]
        except OSError:
            pass
        if done < len(lines):
            try:
                job = json.loads(lines[done])
            except json.JSONDecodeError as e:
                record({"name": f"line{done}", "status": "bad-json",
                        "err_tail": str(e)})
                job = None
            done += 1
            with open(CURSOR, "w") as f:
                f.write(str(done))
            if job is not None:
                run_job(job)
            idle_since = time.time()
            continue
        if time.time() - idle_since > IDLE_EXIT_S:
            log("idle too long; exiting")
            return
        time.sleep(20)


if __name__ == "__main__":
    main()
