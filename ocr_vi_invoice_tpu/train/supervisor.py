"""Training supervisor: restart-on-failure elastic recovery.

The reference has no elasticity (SURVEY.md §5 — its failure handling is
NaN-skip and corrupt-sample blanking); TPU fleets need more: v5e VMs are
preemptible, and long runs can die to host OOM (this dev harness's device
relay retains ~every uploaded byte in host RSS — measured ~3.5 MB leaked
per 3.7 MB ``device_put``, which OOM-killed a 960px det run at 130 GB
after ~4,800 steps). The supervisor turns any such death into a bounded
hiccup:

  python -m ocr_vi_invoice_tpu.train.supervisor \
      --rss_limit_gb 60 --max_restarts 50 -- \
      python -m ocr_vi_invoice_tpu.train.det --save_every_steps 500 ...

* appends ``--auto_resume`` to the child so each (re)start continues from
  the rolling ``last_state`` checkpoint (FULL train state: optimizer
  moments + OneCycle position + epoch/step — `train/checkpoint.py`);
* restarts the child on any nonzero exit (crash, OOM kill, preemption);
* proactively restarts BEFORE the OOM killer fires: when the child's RSS
  crosses ``--rss_limit_gb`` it gets SIGTERM (at most ``save_every_steps``
  steps of progress are lost, same as a real preemption);
* stops on clean exit (rc 0) or after ``--max_restarts``;
* **hang detection** (``--stall_minutes``): the device relay can wedge a
  child forever inside a blocking device call (round 4 lost a training
  leg this way — every thread in futex wait, zero CPU, unkillable by
  SIGTERM). When the child makes no visible progress — no new mtime on
  anything under its ``--save_dir`` (CSV rows, ``last_state``
  checkpoints) — for ``stall_minutes``, the supervisor SIGKILLs it (it
  is blocked; TERM handlers would never run) and exits with the
  distinct rc ``EXIT_STALLED`` (75), leaving ``last_state`` intact for
  a later resume. Restarting is deliberately NOT attempted: round 4
  showed restarted children wedge again and their recompile uploads can
  worsen the relay jam. The default (50 min) sits above the worst
  observed cold train-step compile (25-45 min), which is indistinguishable
  from a hang by mtime alone.

Kills are by exact PID only (never by name/pattern).
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time

EXIT_STALLED = 75  # distinct rc: child hung (no progress), killed, state kept


def _progress_mtime(save_dir: str) -> float:
    """Newest mtime under ``save_dir`` (0.0 if absent) — any CSV append or
    orbax checkpoint write bumps it."""
    newest = 0.0
    for root, _dirs, files in os.walk(save_dir):
        for name in files:
            try:
                newest = max(newest, os.stat(os.path.join(root, name)).st_mtime)
            except OSError:
                continue
    return newest


def _child_save_dir(cmd) -> str | None:
    for i, tok in enumerate(cmd):
        if tok == "--save_dir" and i + 1 < len(cmd):
            return cmd[i + 1]
        if tok.startswith("--save_dir="):
            return tok.split("=", 1)[1]
    return None


def child_rss_gb(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / (1024 * 1024)
    except OSError:
        pass
    return 0.0


def run_supervised(cmd, rss_limit_gb: float = 0.0, max_restarts: int = 50,
                   poll_secs: float = 5.0, term_grace_secs: float = 120.0,
                   stall_minutes: float = 50.0, log=print) -> int:
    """Run ``cmd`` (argv list), restarting per the policy above.

    Returns the final exit code (0 on success; EXIT_STALLED=75 when the
    child was killed for making no progress for ``stall_minutes``)."""
    if "--auto_resume" not in cmd:
        cmd = list(cmd) + ["--auto_resume"]
    restarts = 0
    save_dir = _child_save_dir(cmd)
    if stall_minutes and not save_dir:
        log("[supervisor] no --save_dir in child cmd — hang detection off",
            flush=True)

    # A SIGTERM/SIGINT to the supervisor (wall-clock `timeout`, operator
    # stop) must take the child down WITH it — an orphaned trainer would
    # keep the chip busy past the supervisor's lifetime. Exact-PID only.
    stop = {"requested": False}
    cur = {"proc": None}

    def _on_term(signum, frame):
        stop["requested"] = True
        p = cur["proc"]
        if p is not None and p.poll() is None:
            log(f"[supervisor] signal {signum} — terminating child "
                f"(pid {p.pid}) and exiting", flush=True)
            p.terminate()

    prev_term = signal.signal(signal.SIGTERM, _on_term)
    prev_int = signal.signal(signal.SIGINT, _on_term)

    while True:
        log(f"[supervisor] start (attempt {restarts + 1}): {' '.join(cmd)}",
            flush=True)
        proc = subprocess.Popen(cmd)
        cur["proc"] = proc
        rss_kill = False
        stalled = False
        last_progress = time.time()
        while True:
            rc = proc.poll()
            if rc is not None:
                break
            if stop["requested"]:
                # The signal handler only terminates the child that was
                # live when the signal arrived; a child started after
                # (or one that ignored it) must still be terminated here
                # before waiting, or it hangs the full grace then dies
                # ungracefully (round-4 advisor finding).
                proc.terminate()
                try:
                    rc = proc.wait(timeout=term_grace_secs)
                except subprocess.TimeoutExpired:
                    proc.kill()
                    rc = proc.wait()
                break
            if stall_minutes and save_dir:
                m = _progress_mtime(save_dir)
                if m > last_progress:
                    last_progress = m
                if time.time() - last_progress > stall_minutes * 60:
                    log(f"[supervisor] no progress under {save_dir} for "
                        f"{stall_minutes:.0f} min — child (pid {proc.pid}) "
                        "presumed wedged in a device call; SIGKILL and "
                        f"exiting rc={EXIT_STALLED} (last_state intact)",
                        flush=True)
                    proc.kill()  # blocked child: TERM handlers can't run
                    rc = proc.wait()
                    stalled = True
                    break
            rss = child_rss_gb(proc.pid)
            if rss_limit_gb and rss >= rss_limit_gb:
                log(f"[supervisor] RSS {rss:.1f} GB >= limit "
                    f"{rss_limit_gb:.1f} GB — recycling child "
                    f"(pid {proc.pid})", flush=True)
                rss_kill = True
                proc.terminate()  # exact-PID SIGTERM
                try:
                    rc = proc.wait(timeout=term_grace_secs)
                except subprocess.TimeoutExpired:
                    proc.kill()
                    rc = proc.wait()
                break
            time.sleep(poll_secs)
        if stalled:
            signal.signal(signal.SIGTERM, prev_term)
            signal.signal(signal.SIGINT, prev_int)
            return EXIT_STALLED
        if stop["requested"]:
            signal.signal(signal.SIGTERM, prev_term)
            signal.signal(signal.SIGINT, prev_int)
            log(f"[supervisor] stopped by signal (child rc {rc})",
                flush=True)
            # wait() statuses are negative for signal deaths; normalize to
            # the conventional 128+N so sys.exit never sees a negative rc.
            if rc and rc < 0:
                return 128 - rc
            return rc if rc else 143
        if rc == 0 and not rss_kill:
            signal.signal(signal.SIGTERM, prev_term)
            signal.signal(signal.SIGINT, prev_int)
            log("[supervisor] child exited cleanly", flush=True)
            return 0
        restarts += 1
        if restarts > max_restarts:
            log(f"[supervisor] giving up after {max_restarts} restarts "
                f"(last rc {rc})", flush=True)
            return rc if rc else 1
        why = "rss-limit recycle" if rss_kill else f"rc {rc}"
        log(f"[supervisor] child died ({why}) — restarting", flush=True)
        time.sleep(2.0)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Restart-on-failure supervisor for train CLIs",
        usage="%(prog)s [options] -- <train command...>")
    ap.add_argument("--rss_limit_gb", type=float, default=0.0,
                    help="proactively recycle the child when its RSS "
                         "crosses this (0 = off)")
    ap.add_argument("--max_restarts", type=int, default=50)
    ap.add_argument("--poll_secs", type=float, default=5.0)
    ap.add_argument("--stall_minutes", type=float, default=50.0,
                    help="SIGKILL the child and exit rc=75 when nothing "
                         "under its --save_dir gains a newer mtime for this "
                         "long (0 = off; default sits above the worst "
                         "observed 45-min cold compile)")
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--" not in argv:
        ap.error("separate the child command with `--`")
    split = argv.index("--")
    args = ap.parse_args(argv[:split])
    cmd = argv[split + 1:]
    if not cmd:
        ap.error("empty child command")
    sys.exit(run_supervised(cmd, rss_limit_gb=args.rss_limit_gb,
                            max_restarts=args.max_restarts,
                            poll_secs=args.poll_secs,
                            stall_minutes=args.stall_minutes))


if __name__ == "__main__":
    main()
