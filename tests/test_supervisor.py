"""Supervisor: restart-on-failure policy (no device work; fast)."""

import os
import stat
import sys
import textwrap

from ocr_vi_invoice_tpu.train.supervisor import child_rss_gb, run_supervised


def _child_script(tmp_path, body: str):
    p = tmp_path / "child.py"
    p.write_text(textwrap.dedent(body))
    return [sys.executable, str(p)]


def test_restarts_until_clean_exit(tmp_path):
    """Crashes twice, then exits 0; supervisor retries and reports success.
    Also: --auto_resume must be appended to the child command."""
    marker = tmp_path / "attempts"
    cmd = _child_script(tmp_path, f"""
        import pathlib, sys
        assert "--auto_resume" in sys.argv, "supervisor must add --auto_resume"
        m = pathlib.Path({str(marker)!r})
        n = int(m.read_text()) if m.exists() else 0
        m.write_text(str(n + 1))
        sys.exit(0 if n >= 2 else 1)
    """)
    logs = []
    rc = run_supervised(cmd, max_restarts=5, poll_secs=0.05,
                        log=lambda *a, **k: logs.append(a[0]))
    assert rc == 0
    assert marker.read_text() == "3"
    assert any("restarting" in m for m in logs)


def test_gives_up_after_max_restarts(tmp_path):
    cmd = _child_script(tmp_path, """
        import sys
        sys.exit(3)
    """)
    rc = run_supervised(cmd, max_restarts=2, poll_secs=0.05,
                        log=lambda *a, **k: None)
    assert rc == 3


def test_rss_limit_recycles_child(tmp_path):
    """A child that balloons past the limit is recycled (SIGTERM) and,
    having learned nothing, recycled again until max_restarts."""
    marker = tmp_path / "attempts"
    cmd = _child_script(tmp_path, f"""
        import pathlib, sys, time
        m = pathlib.Path({str(marker)!r})
        n = int(m.read_text()) if m.exists() else 0
        m.write_text(str(n + 1))
        if n >= 1:
            sys.exit(0)  # "resumed past the leak" on second attempt
        ballast = bytearray(2500 * 1024 * 1024)  # ~2.5 GB
        time.sleep(60)
    """)
    # limit must clear the interpreter baseline (this env's sitecustomize
    # imports jax into every python process: ~0.3 GB before user code runs)
    rc = run_supervised(cmd, rss_limit_gb=1.2, max_restarts=3,
                        poll_secs=0.1, log=lambda *a, **k: None)
    assert rc == 0
    assert marker.read_text() == "2"


def test_stall_detection_kills_hung_child(tmp_path):
    """Fault injection for the round-4 failure mode: a child that makes
    progress (writes under --save_dir), then blocks forever in a 'device
    call'. The supervisor must SIGKILL it, exit with the distinct
    EXIT_STALLED rc, and leave the checkpoint intact."""
    from ocr_vi_invoice_tpu.train.supervisor import EXIT_STALLED

    save_dir = tmp_path / "ckpt"
    save_dir.mkdir()
    cmd = _child_script(tmp_path, f"""
        import pathlib, time
        d = pathlib.Path({str(save_dir)!r})
        (d / "last_state").write_text("step 3000")  # one progress tick
        time.sleep(600)  # then wedge forever (simulated relay hang)
    """)
    # -S skips sitecustomize's jax import: child must start (and write its
    # progress tick) well inside the tiny stall window used here
    cmd = [cmd[0], "-S"] + cmd[1:] + ["--save_dir", str(save_dir)]
    logs = []
    rc = run_supervised(cmd, max_restarts=5, poll_secs=0.05,
                        stall_minutes=0.02,  # 1.2 s of no progress
                        log=lambda *a, **k: logs.append(a[0]))
    assert rc == EXIT_STALLED
    assert (save_dir / "last_state").read_text() == "step 3000"
    assert any("wedged" in m for m in logs)


def test_stall_timer_resets_on_progress(tmp_path):
    """A slow-but-progressing child (fresh mtimes under --save_dir) must
    NOT be treated as hung; it exits 0 on its own."""
    save_dir = tmp_path / "ckpt"
    save_dir.mkdir()
    cmd = _child_script(tmp_path, f"""
        import pathlib, time
        d = pathlib.Path({str(save_dir)!r})
        for i in range(6):
            (d / "last_state").write_text(str(i))
            time.sleep(0.4)
    """)
    cmd = [cmd[0], "-S"] + cmd[1:] + ["--save_dir", str(save_dir)]
    rc = run_supervised(cmd, max_restarts=0, poll_secs=0.05,
                        stall_minutes=0.025,  # 1.5 s — longer than each gap
                        log=lambda *a, **k: None)
    assert rc == 0


def test_child_rss_reader():
    assert child_rss_gb(os.getpid()) > 0.0
    assert child_rss_gb(99999999) == 0.0


def test_sigterm_takes_child_down(tmp_path):
    """A SIGTERM to the supervisor (wall-clock timeout, operator stop)
    must terminate the CHILD too — an orphaned trainer would keep the
    chip busy past the supervisor's lifetime."""
    import os
    import signal
    import subprocess
    import sys
    import time

    marker = tmp_path / "child_pid"
    child_code = (
        "import os,sys,time,pathlib;"
        f"pathlib.Path({str(marker)!r}).write_text(str(os.getpid()));"
        "time.sleep(600)"
    )
    proc = subprocess.Popen(
        [sys.executable, "-m", "ocr_vi_invoice_tpu.train.supervisor", "--",
         sys.executable, "-c", child_code],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        for _ in range(200):
            if marker.exists() and marker.read_text():
                break
            time.sleep(0.1)
        else:
            raise AssertionError("child never started")
        child_pid = int(marker.read_text())
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=30)
        for _ in range(100):
            try:
                os.kill(child_pid, 0)
            except ProcessLookupError:
                break
            time.sleep(0.1)
        else:
            raise AssertionError("child survived supervisor SIGTERM")
    finally:
        if proc.poll() is None:
            proc.kill()
