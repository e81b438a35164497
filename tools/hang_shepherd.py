"""Kill-and-let-restart shepherd for per-client relay wedges.

Round-5 incident mode (distinct from round 4's GLOBAL tunnel wedge): a
long-lived training client occasionally hangs in a device call while
fresh clients probe fine — the relay wedges one connection, not the
chip. The supervisor's stall detector (no save_dir progress for
--stall_minutes) catches this eventually but is sized for slow legs;
this shepherd converts each wedge to ~one restart latency instead:

  every INTERVAL s, find the supervisor's direct child whose cmdline
  matches the target module; if its cumulative CPU time advanced less
  than MIN_CPU_DELTA over HANG_AFTER s AND an independent tiny-matmul
  probe succeeds (device healthy => the child is wedged, not compiling
  on a jammed relay), SIGKILL that exact pid. The supervisor sees a
  crash and auto-restarts; --auto_resume picks up the last_state.

Usage: python tools/hang_shepherd.py <supervisor_pid> [module_substr]
Exits when the supervisor exits. Kills ONLY pids whose parent is the
given supervisor (never by name/pattern).
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

INTERVAL = 60
HANG_AFTER = 240          # seconds of frozen CPU time => wedged
MIN_CPU_DELTA = 2.0       # jiffies-to-seconds slack
PROBE_TIMEOUT = 90

PROBE = ("import jax, jax.numpy as jnp; "
         "x = jnp.ones((128, 128), jnp.bfloat16); "
         "print(float((x @ x).sum()))")


def children_of(ppid: int):
    try:
        out = subprocess.run(
            ["ps", "-o", "pid=", "--ppid", str(ppid)],
            capture_output=True, text=True, timeout=10).stdout
        return [int(p) for p in out.split()]
    except Exception:
        return []


def cmdline(pid: int) -> str:
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            return f.read().replace(b"\0", b" ").decode(errors="replace")
    except OSError:
        return ""


def cpu_seconds(pid: int) -> float | None:
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(")", 1)[1].split()
        # utime, stime are fields 14, 15 (1-indexed) => 11, 12 after ')'
        return (int(parts[11]) + int(parts[12])) / os.sysconf("SC_CLK_TCK")
    except Exception:
        return None


def probe_ok() -> bool:
    try:
        r = subprocess.run([sys.executable, "-c", PROBE],
                           capture_output=True, timeout=PROBE_TIMEOUT)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    sup = int(sys.argv[1])
    want = sys.argv[2] if len(sys.argv) > 2 else "ocr_vi_invoice_tpu.train"
    last: dict[int, tuple[float, float]] = {}  # pid -> (cpu_s, t_frozen_since)
    while True:
        if not os.path.exists(f"/proc/{sup}"):
            print("[shepherd] supervisor gone — exiting", flush=True)
            return
        for pid in children_of(sup):
            if want not in cmdline(pid):
                continue
            cpu = cpu_seconds(pid)
            if cpu is None:
                continue
            prev = last.get(pid)
            now = time.time()
            if prev is None or cpu - prev[0] >= MIN_CPU_DELTA:
                last[pid] = (cpu, now)
                continue
            frozen_for = now - prev[1]
            if frozen_for >= HANG_AFTER:
                print(f"[shepherd] pid {pid} cpu frozen {frozen_for:.0f}s "
                      f"— probing device", flush=True)
                if probe_ok():
                    print(f"[shepherd] device healthy => client wedged; "
                          f"SIGKILL {pid}", flush=True)
                    try:
                        os.kill(pid, signal.SIGKILL)
                    except OSError as e:
                        print(f"[shepherd] kill failed: {e}", flush=True)
                    last.pop(pid, None)
                else:
                    print("[shepherd] probe failed too — global wedge, "
                          "leaving child alone (supervisor stall timer "
                          "owns this case)", flush=True)
                    last[pid] = (cpu, now)  # rearm
        time.sleep(INTERVAL)


if __name__ == "__main__":
    main()
