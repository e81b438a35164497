"""End-to-end throughput benchmark (run on real TPU by the driver).

Benches the REAL fused pipeline program (`pipeline/fused.py`): DBNet++
(ResNet50+DCN, bf16) at 960x960 -> on-device box extraction (ops/cc) ->
batched crop gather (ops/warp) -> SVTRv2 recognition over the full
max_boxes=256 crop capacity -> greedy argmax. Weights are the shipped
trained checkpoints (newest shipped leg per `checkpoint.shipped_candidates`)
so data-dependent paths (Pallas DCN tap skipping, component sweeps) see
trained-magnitude offsets, not zeros; the input is a rendered synthetic
invoice, not noise. Component forwards are reported alongside. Prints ONE
JSON line (always the LAST stdout line):

  {"metric": "e2e_invoices_per_sec", "value": N, "unit": "invoices/s/chip",
   "vs_baseline": N}

Outage resilience (round-4 lesson: one wedged relay window turned the
whole round's record into 0.0 after a single 1500-s hang): the benchmark
is now two processes.

* The PARENT (what the driver invokes) never touches the device. It runs
  kill-safe PREFLIGHT probes (tiny matmul in a subprocess, SIGKILLed on
  timeout — wedged device calls ignore SIGTERM), then supervises a CHILD
  measurement process that reports every completed quantity into a status
  file. If the child stops making progress, the parent re-probes to
  distinguish "long XLA compile" (probe ok -> keep waiting) from "relay
  wedged" (probe hangs -> SIGKILL child, sleep, retry the whole cycle
  while the time budget lasts). Distinct error strings separate "device
  absent" (backend init fails / CPU only) from "device wedged mid-run".
* On final failure the parent still emits whatever quantities DID
  complete (partial: true) plus the full probe/attempt history, so a
  degraded round records numbers and evidence instead of a bare 0.0.

Timing methodology: this session's TPU sits behind an async execution
relay — dispatch returns immediately and ``block_until_ready`` does not
force execution, while a host fetch carries ~30ms fixed RPC overhead.
So each program runs inside a ``lax.fori_loop`` with a TRACED trip
count (one compile, no unrolling, genuine carry dependence so the body
can't be hoisted), forced by a scalar fetch; per-iteration time is the
difference between a long and a short loop. Validated against a
known-cost matmul (~200 TFLOP/s bf16 on v5e ≈ peak).

Baseline: the reference publishes no throughput (BASELINE.md). The
constant below is the PyTorch-CPU reference measured on this image:
SVTRv2-base (actual reference code) 2.28 s / 8 crops single-thread; DBNet++
cannot run here (torchvision absent) and is estimated from its FLOPs ratio.
rec 64 crops ~18.2 s + det @960^2 ~21.6 s => ~0.025 invoices/s.
Reference workload: /root/reference/src/pipeline/pipeline2.py:195.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

BASELINE_INVOICES_PER_SEC = 0.025

DET_SIZE = 960
REC_BATCH = 32

# Parent-side budgets (seconds). BENCH_BUDGET_S bounds the whole run.
OUTER_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 2400))
PROBE_TIMEOUT_COLD_S = 240   # measured: cold axon backend init took 133 s
PROBE_TIMEOUT_WARM_S = 150
CHILD_STALL_S = 300          # no status progress for this long -> re-probe
WEDGE_SLEEP_S = 60


# --------------------------------------------------------------------- #
# measurement helpers (child process only)
# --------------------------------------------------------------------- #

def _random_like_shapes(tree, scale=0.05):
    """Realistic-magnitude random params (NOT zeros: zero offsets/weights
    are the Pallas DCN kernel's best case and would flatter the numbers)."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(jax.random.PRNGKey(0), max(len(leaves), 1))
    out = [
        (jax.random.normal(k, l.shape, jnp.float32) * scale).astype(l.dtype)
        if jnp.issubdtype(l.dtype, jnp.floating)
        else jnp.zeros(l.shape, l.dtype)
        for k, l in zip(keys, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, out)


def _load_vars(ckpt_dirs, fallback_shapes_fn):
    """(variables, meta) from the first shipped checkpoint that exists
    (best-first), else random params."""
    for ckpt_dir in ckpt_dirs:
        if ckpt_dir.exists():
            from ocr_vi_invoice_tpu.train.checkpoint import load_weights

            r = load_weights(ckpt_dir)
            return {"params": r["params"], "batch_stats": r["batch_stats"]}, r
    import jax

    return _random_like_shapes(jax.eval_shape(fallback_shapes_fn)), {}


def _bench_input():
    """A rendered synthetic invoice in the 960x960 det bucket (float32
    0..255) — realistic text density for the box-extraction stage."""
    import numpy as np

    try:
        from ocr_vi_invoice_tpu.generator.generator import (
            SyntheticInvoiceGenerator,
        )
        from ocr_vi_invoice_tpu.pipeline.postprocess import resize_image_for_det

        gen = SyntheticInvoiceGenerator(seed=7)
        img, _, _ = gen.generate_realistic()
        resized, _ = resize_image_for_det(img, DET_SIZE)
        canvas = np.zeros((DET_SIZE, DET_SIZE, 3), np.float32)
        canvas[: resized.shape[0], : resized.shape[1]] = resized
        return canvas
    except Exception:
        rng = np.random.RandomState(0)
        return rng.uniform(0, 255, (DET_SIZE, DET_SIZE, 3)).astype(np.float32)


def _measure(fn, args, n, repeats):
    import jax.numpy as jnp

    ts = []
    for _ in range(repeats):
        t0 = time.time()
        float(fn(*args, jnp.int32(n)))
        ts.append(time.time() - t0)
    return ts


def _timed(fn, *args, n_lo=2, n_hi=12, repeats=3, max_scale=16,
           budget_s=120):
    """Loop-differenced per-iteration time, robust to a NOISY shared TPU.

    Estimator: min over repeats of the long-loop wall time minus min over
    repeats of the short-loop wall time (other tenants' load only ADDS
    time, so per-length minima approximate the uncontended cost — cf.
    timeit's min; differencing cancels the fixed dispatch/fetch
    overhead). If the differenced signal does not dominate the observed
    jitter (min-to-median spread of the raw measurements), the long trip
    count is doubled and the measurement repeated, up to ``max_scale``x —
    in a contention window the relay adds multi-SECOND queue waits that
    drown a sub-second signal (observed: the same compiled rec program at
    5.4 and 29.4 ms/iter half an hour apart while a matmul calibration in
    between hit 191 TFLOP/s ~= v5e peak; det @960 "0.0 ms" when a
    contended short run made the pair diff negative). Escalation is free
    on a healthy machine (first round accepts immediately) and is bounded
    by ``budget_s`` wall-clock so the whole bench always finishes inside
    its watchdog even on a near-stalled relay — on budget exhaustion the
    round with the best signal-to-jitter ratio wins, best-effort."""
    import jax.numpy as jnp

    float(fn(*args, jnp.int32(n_lo)))  # compile + warm
    start = time.time()
    scale = 1
    best_ratio, best_est = -1.0, 1e-9
    while True:
        hi = n_lo + (n_hi - n_lo) * scale
        float(fn(*args, jnp.int32(hi)))  # warm this trip count
        lo_ts = _measure(fn, args, n_lo, repeats)
        hi_ts = _measure(fn, args, hi, repeats)
        diff = min(hi_ts) - min(lo_ts)
        jitter = (sorted(lo_ts)[len(lo_ts) // 2] - min(lo_ts)) + (
            sorted(hi_ts)[len(hi_ts) // 2] - min(hi_ts))
        est = max(diff, 1e-9) / (hi - n_lo)
        ratio = diff / max(jitter, 1e-12)
        if ratio > best_ratio:
            best_ratio, best_est = ratio, est
        if diff > 4 * jitter:
            return est
        if scale >= max_scale or time.time() - start > budget_s:
            return best_est
        scale *= 2


def _calibrate():
    """Known-cost bf16 matmul, timed with the same loop differencing.
    Reported in the output JSON so a contended/degraded TPU session is
    visible in the recorded bench (v5e peak is ~200 TFLOP/s; healthy
    runs measure ~190)."""
    import jax
    import jax.numpy as jnp

    N = 4096
    x = jax.random.normal(jax.random.PRNGKey(0), (N, N), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (N, N), jnp.bfloat16)

    @jax.jit
    def mm_loop(x, w, n):
        def body(i, c):
            return (c @ w) * jnp.bfloat16(1e-3)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))

    t = _timed(mm_loop, x, w, n_lo=10, n_hi=210, repeats=3, budget_s=60)
    return 2 * N**3 / t / 1e12


def _arm_watchdog(seconds: int = 1500) -> None:
    """In-process wall-clock bound used by the tools/profile_*.py scripts
    (self-run): SIGALRM aborts with a parseable JSON error line instead of
    hanging forever on a wedged relay. The driver bench itself no longer
    relies on this — the parent/child supervision below SIGKILLs from
    outside, which also covers hangs that defer signal delivery."""
    import signal

    def _abort(signum, frame):
        print(json.dumps({
            "metric": "e2e_invoices_per_sec", "value": 0.0,
            "unit": "invoices/s/chip", "vs_baseline": 0.0,
            "error": f"watchdog: device unresponsive after {seconds}s",
        }), flush=True)
        os._exit(2)

    signal.signal(signal.SIGALRM, _abort)
    signal.alarm(seconds)


# --------------------------------------------------------------------- #
# child: run measurements, stream results into the status file
# --------------------------------------------------------------------- #

class _Status:
    """Progressively-written JSON status: every completed quantity lands
    on disk immediately, so the supervising parent can always emit the
    best partial record even if the device wedges mid-run."""

    def __init__(self, path: str):
        self.path = Path(path)
        self.d = {"phase": "start", "t": time.time(), "done": False,
                  "detail": {}, "passes": {"det": [], "rec": [], "fused": [],
                                           "batch8": []}}
        self.flush()

    def phase(self, name: str):
        self.d["phase"] = name
        self.flush()

    def record(self, key: str, value):
        self.d["detail"][key] = value
        self.flush()

    def flush(self):
        self.d["t"] = time.time()
        tmp = self.path.with_suffix(".tmp")
        tmp.write_text(json.dumps(self.d))
        tmp.rename(self.path)


def _child_main(status_path: str, deadline_s: float):
    """All device work happens here. The parent SIGKILLs us if the relay
    wedges; a SIGALRM backstop bounds us to the remaining time budget
    (exit 3 = alarm; partials are already on disk either way)."""
    import signal

    st = _Status(status_path)

    def _alarm(signum, frame):
        st.d["phase"] = "alarm"
        st.flush()
        os._exit(3)

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(max(int(deadline_s), 60))

    st.phase("import")
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import jax.numpy as jnp

    from ocr_vi_invoice_tpu.models.dbnet import DBNetPP
    from ocr_vi_invoice_tpu.models.svtrv2 import SVTRv2
    from ocr_vi_invoice_tpu.ops.dcn import inference_dcn_mode
    from ocr_vi_invoice_tpu.utils.config import PipelineConfig

    st.phase("load_checkpoints")
    key = jax.random.PRNGKey(0)
    cfg = PipelineConfig(det_image_size=DET_SIZE)
    pp = cfg.postprocess
    pp.box_thresh = 0.5
    pp.unclip_ratio = 1.6
    K = cfg.max_boxes
    rec_h, rec_w = cfg.rec_img_size

    # Trained checkpoints; DCN path per the checkpoint's recorded training
    # mode, upgraded 'local' -> Pallas kernel on TPU (identical semantics).
    det_probe = DBNetPP(dcn=True, dtype=jnp.bfloat16)
    det_x = jnp.zeros((1, DET_SIZE, DET_SIZE, 3), jnp.bfloat16)
    from ocr_vi_invoice_tpu.train.checkpoint import (
        shipped_candidates, shipped_checkpoint)

    det_vars, det_meta = _load_vars(
        shipped_candidates("det"), lambda: det_probe.init(key, det_x))
    dcn_mode = inference_dcn_mode(det_meta.get("dcn_mode", "pallas"))
    det = DBNetPP(dcn=det_meta.get("dcn", True), dcn_mode=dcn_mode,
                  dtype=jnp.bfloat16)

    rec_probe = SVTRv2(variant="base", dtype=jnp.bfloat16)
    rec_x = jnp.zeros((REC_BATCH, rec_h, rec_w, 3), jnp.bfloat16)
    rec_vars, rec_meta = _load_vars(
        shipped_candidates("rec"), lambda: rec_probe.init(key, rec_x))
    rec = SVTRv2(variant=rec_meta.get("variant", "base"), dtype=jnp.bfloat16)

    # Serve-path precision: big kernels pre-cast to bf16 once (what the
    # pipelines do at construction). Passing raw f32 checkpoints as jit
    # ARGUMENTS re-casts ~190 MB of params inside every call: measured
    # 270 ms/iter vs 44 ms for the same fused program on v5e.
    from ocr_vi_invoice_tpu.utils.precision import cast_inference_params

    det_vars = cast_inference_params(det_vars, jnp.bfloat16)
    rec_vars = cast_inference_params(rec_vars, jnp.bfloat16)

    st.record("dcn_mode", dcn_mode)
    st.record("max_boxes", K)
    st.record("weights",
              "trained" if shipped_checkpoint("det") else "random")

    image = jnp.asarray(_bench_input())

    # ---- component forwards -------------------------------------------- #
    @jax.jit
    def det_loop(v, x, n):
        def body(i, carry):
            out = det.apply(v, carry)["binary"]
            return carry + out.astype(carry.dtype) * jnp.bfloat16(1e-3)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))

    @jax.jit
    def rec_loop(v, x, n):
        def body(i, carry):
            lp = rec.apply(v, carry)
            return carry + jnp.mean(lp).astype(carry.dtype) * jnp.bfloat16(1e-4)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))

    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
    det_in = ((image / 255.0 - mean) / std)[None].astype(jnp.bfloat16)
    rec_in = jnp.tile(det_in[0, :32, :rec_w][None], (REC_BATCH, 1, 1, 1))

    # ---- the FUSED program: det -> boxes -> crops -> rec -> argmax ------ #
    # THE shipped program (pipeline/fused.py FusedOCR._run — incl. its
    # chunked-rec tile skipping), wrapped in a carried loop so the relay's
    # async dispatch can't fake the timing.
    from ocr_vi_invoice_tpu.pipeline.fused import FusedOCR

    fused = FusedOCR(det_vars, rec_vars, cfg,
                     rec_variant=rec_meta.get("variant", "base"),
                     dtype=jnp.bfloat16, dcn_mode=dcn_mode)

    @jax.jit
    def fused_loop(dv, rv, img, n):
        def body(i, carry):
            boxes, scores, valid, quads, ids, _ovf = fused._run(dv, rv, carry)
            feedback = (jnp.sum(boxes) * 1e-12 + jnp.sum(quads) * 1e-12
                        + jnp.sum(ids).astype(jnp.float32) * 1e-12)
            return carry + feedback

        return jnp.sum(jax.lax.fori_loop(0, n, body, img))

    # ---- batched serving: the production mode (pipeline/serve.py) ------ #
    # FusedOCR.batch's program: det vmapped over a stack of 8 invoices,
    # box slots compacted valid-first ACROSS the batch so recognition pays
    # for the batch's actual text lines, not 8 x max_boxes capacity. Batch
    # conv occupancy + amortized per-call overhead make this the best
    # per-invoice rate on one chip.
    BATCH = 8
    batch_imgs = jnp.stack(
        [image * (1.0 - 0.01 * i) for i in range(BATCH)])

    @jax.jit
    def batch_loop(dv, rv, imgs, n):
        def body(i, carry):
            boxes, scores, valid, quads, ids, _ovf = fused._run_batch(dv, rv, carry)
            feedback = (jnp.sum(boxes) * 1e-12 + jnp.sum(quads) * 1e-12
                        + jnp.sum(ids).astype(jnp.float32) * 1e-12)
            return carry + feedback

        return jnp.sum(jax.lax.fori_loop(0, n, body, imgs))

    # Running tallies, flushed to the status file after EVERY quantity so
    # a mid-run wedge still leaves a usable partial record. Quantities are
    # ordered headline-first: det (needed to clamp fused), then the fused
    # e2e program, then the rest. Multiple passes minutes apart because
    # the shared chip shows minutes-long 3-6x contention windows; min over
    # attempts spread across the run is the only estimator that survives.
    tall = {"det": float("inf"), "rec": float("inf"),
            "fused": float("inf"), "batch8": float("inf")}

    def _note(name, seconds):
        tall[name] = min(tall[name], seconds)
        st.d["passes"][name].append(round(seconds * 1000, 3))
        det_t, fused_t, batch_t = tall["det"], tall["fused"], tall["batch8"]
        if np.isfinite(fused_t):
            # fused CONTAINS the det forward: clamp physically-impossible
            # readings (residual relay noise) to the det time
            st.record("fused_e2e_ms",
                      round(max(fused_t, det_t) * 1000, 3))
        if np.isfinite(det_t):
            st.record("det_960_ms", round(det_t * 1000, 3))
        if np.isfinite(tall["rec"]):
            st.record("rec_batch32_ms", round(tall["rec"] * 1000, 3))
        if np.isfinite(batch_t):
            st.record("batch8_per_invoice_ms",
                      round(max(batch_t, det_t) / BATCH * 1000, 3))
        st.flush()

    def _one_pass(det_b, rec_b, fused_b, batch_b):
        st.phase("det")
        _note("det", _timed(det_loop, det_vars, det_in, n_lo=2, n_hi=20,
                            budget_s=det_b))
        st.phase("fused")
        _note("fused", _timed(fused_loop, det_vars, rec_vars, image,
                              n_lo=2, n_hi=18, budget_s=fused_b))
        # rec-32 is ~5 ms: needs a long loop to clear the ~30 ms relay RPC
        # jitter (r02 briefly reported 0.0 ms from a 12-iteration diff)
        st.phase("rec")
        _note("rec", _timed(rec_loop, rec_vars, rec_in, n_lo=4, n_hi=84,
                            budget_s=rec_b))
        if batch_b:
            st.phase("batch8")
            try:
                _note("batch8", _timed(batch_loop, det_vars, rec_vars,
                                       batch_imgs, n_lo=1, n_hi=8,
                                       budget_s=batch_b))
            except Exception as e:  # pragma: no cover - chip-state dependent
                print(f"# batch path skipped: {e}", flush=True)

    _one_pass(90, 90, 120, 75)
    st.phase("calibrate")
    st.record("calib_matmul_tflops", round(_calibrate(), 1))
    # Second pass minutes later (the calibration separates the windows in
    # time), then a third fused/batch attempt: the headline must not be
    # hostage to one multi-minute contention window (observed: both fused
    # passes of a run landing 3.5x high while det/rec/calib in the SAME
    # run read clean — recorded 165 ms vs 47 ms re-measured later).
    _one_pass(45, 45, 75, 60)
    st.phase("fused_final")
    _note("fused", _timed(fused_loop, det_vars, rec_vars, image,
                          n_lo=2, n_hi=18, budget_s=75))

    st.d["detail"]["passes_ms"] = st.d["passes"]
    st.d["done"] = True
    st.phase("done")
    return 0


# --------------------------------------------------------------------- #
# parent: preflight probes + child supervision (no device work here)
# --------------------------------------------------------------------- #

_PROBE_CODE = """
import jax
d = jax.devices()[0]
x = jax.numpy.ones((256, 256))
v = float((x @ x).sum())
print("PROBE_OK", d.platform, flush=True)
"""


def _preflight(timeout_s: float) -> str:
    """'ok' | 'absent' | 'wedged' | 'error:<msg>'. Runs the probe in a
    subprocess SIGKILLed on timeout: wedged device calls ignore SIGTERM
    (they block inside a C call), so in-process alarms are not enough."""
    try:
        p = subprocess.Popen(
            [sys.executable, "-c", _PROBE_CODE], cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    except OSError as e:  # pragma: no cover
        return f"error:spawn:{e}"
    try:
        out, _ = p.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        p.kill()  # exact-PID SIGKILL
        p.wait()
        return "wedged"
    if p.returncode == 0 and "PROBE_OK" in out:
        platform = out.rsplit("PROBE_OK", 1)[1].strip().split()[0]
        # a silent fallback to CPU means the TPU backend is NOT there;
        # benching the CPU would record a garbage-but-nonzero number
        return "ok" if platform != "cpu" else "absent"
    if "nable to initialize backend" in out or "No devices" in out:
        return "absent"
    tail = out.strip().splitlines()[-1] if out.strip() else "no output"
    return f"error:{tail[:120]}"


def _emit(record: dict) -> None:
    print(json.dumps(record), flush=True)


def _final_record(status: dict | None, history, note: str | None):
    """Build the single output line from the (possibly partial) status."""
    detail = dict((status or {}).get("detail", {}))
    if "passes_ms" not in detail and status is not None:
        detail["passes_ms"] = status.get("passes", {})
    detail["supervise"] = history
    fused_ms = detail.get("fused_e2e_ms")
    batch_ms = detail.get("batch8_per_invoice_ms")
    rates = [1000.0 / v for v in (fused_ms, batch_ms) if v]
    value = round(max(rates), 3) if rates else 0.0
    rec = {
        "metric": "e2e_invoices_per_sec",
        "value": value,
        "unit": "invoices/s/chip",
        "vs_baseline": round(value / BASELINE_INVOICES_PER_SEC, 1),
        "detail": detail,
    }
    done = bool(status and status.get("done"))
    if not done:
        rec["partial"] = True
    if note:
        rec["error"] = note
    return rec


def _supervise() -> int:
    t0 = time.time()
    deadline = t0 + OUTER_BUDGET_S
    status_path = f"/tmp/bench_status_{os.getpid()}.json"
    history = []  # auditable probe/attempt log, lands in the output detail

    def note(ev):
        history.append(f"+{int(time.time() - t0)}s {ev}")
        print(f"# bench supervise: {ev}", flush=True)

    probe_timeout = PROBE_TIMEOUT_COLD_S
    absents = 0
    last_status = None
    while time.time() < deadline - 90:
        r = _preflight(min(probe_timeout, max(deadline - time.time() - 30, 30)))
        note(f"preflight {r}")
        if r == "absent":
            absents += 1
            if absents >= 3:
                _emit(_final_record(last_status, history,
                                    "device absent: TPU backend failed to "
                                    "initialize in 3 probes"))
                return 2
            time.sleep(WEDGE_SLEEP_S)
            continue
        if r != "ok":
            # wedged or error: expected weather on this relay — sleep and
            # retry across the window instead of burning it in one hang
            time.sleep(WEDGE_SLEEP_S)
            probe_timeout = PROBE_TIMEOUT_WARM_S
            continue
        probe_timeout = PROBE_TIMEOUT_WARM_S

        child_budget = deadline - time.time() - 60
        if child_budget < 120:
            break
        note("child start")
        child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child",
             "--status", status_path, "--deadline", str(int(child_budget))],
            cwd="/root/repo")
        wedged = False
        while child.poll() is None:
            time.sleep(10)
            if time.time() > deadline - 45:
                note("budget exhausted — stopping child")
                child.kill()
                child.wait()
                wedged = True
                break
            try:
                stale = time.time() - os.stat(status_path).st_mtime
            except OSError:
                stale = 0.0
            if stale > CHILD_STALL_S:
                # compiling or wedged? an independent probe tells them apart
                r2 = _preflight(PROBE_TIMEOUT_WARM_S)
                note(f"child stale {int(stale)}s, probe {r2}")
                if r2 != "ok":
                    note("child wedged mid-run — SIGKILL")
                    child.kill()  # exact-PID; blocked child ignores TERM
                    child.wait()
                    wedged = True
                    break
                # probe ok -> long XLA compile; reset staleness clock by
                # touching the file so we don't re-probe every 10 s
                try:
                    os.utime(status_path)
                except OSError:
                    pass
        try:
            last_status = json.loads(Path(status_path).read_text())
        except Exception:
            last_status = last_status
        if last_status and last_status.get("done"):
            _emit(_final_record(last_status, history, None))
            return 0
        if not wedged and child.returncode == 3:
            note("child hit its deadline alarm — emitting partials")
            break
        if not wedged and child.returncode not in (0, None):
            note(f"child failed rc={child.returncode}")
            # software failure, not a hang: one more attempt if time allows
        time.sleep(WEDGE_SLEEP_S if wedged else 15)

    phase = (last_status or {}).get("phase", "never-started")
    msg = (f"device wedged mid-run (last phase: {phase}); "
           f"{len(history)} supervise events"
           if last_status else
           "device wedged: no measurement completed; see supervise history")
    _emit(_final_record(last_status, history, msg))
    return 2


def main():
    if "--child" in sys.argv:
        i = sys.argv.index("--status")
        status_path = sys.argv[i + 1]
        j = sys.argv.index("--deadline")
        deadline_s = float(sys.argv[j + 1])
        sys.exit(_child_main(status_path, deadline_s))
    sys.exit(_supervise())


if __name__ == "__main__":
    main()
