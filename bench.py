"""Headline benchmark: wav → fbank → ResNet-34 embedding throughput per chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The metric is BASELINE.json's north star: embeddings/sec/chip through the
full on-device pipeline (framing → fused DFT-matmul fbank → VAD → sliding
CMVN → voiced-frame selection → ResNet-34 → stats pooling → fc1) on
synthetic 6-second utterances.  vs_baseline divides by the CPU reference
throughput (the decode_cpu.py path: torch ResNet-34 forward on this host's
CPU over the same workload), measured once and cached in BENCH_BASELINE.json.

Hang-proofing (round-4 lesson: BENCH_r04 came back empty, rc=124): the TPU
tunnel on this host can wedge a jax process FOREVER mid-dispatch, so every
TPU measurement runs in a watchdog CHILD process that the parent kill -9s on
expiry.  The child prints tagged, flushed lines after each completed phase,
so a hang during the train measurement cannot lose the extraction headline.
The parent retries across quiet windows (waits for host load to drop — the
tunnel drops requests under load) and, when every attempt fails, still
emits a JSON line with an "error" field instead of nothing.

Env knobs (all optional; tests use them to fake hangs):
  PKR_BENCH_CHILD            override the child command (shlex-split)
  PKR_BENCH_ATTEMPT_TIMEOUT  per-attempt kill timeout, seconds
  PKR_BENCH_BUDGET_S         total wall budget across attempts
  PKR_BENCH_ATTEMPTS         max attempts
  PKR_BENCH_QUIET_LOAD       1-min loadavg threshold for a quiet window
  PKR_BENCH_QUIET_WAIT       max seconds to wait for a quiet window
  PKR_BENCH_RETRY_SLEEP      sleep between attempts
  PKR_BENCH_QUIET_PIDS       pid-registry file of heavy host processes to
                             SIGSTOP around each TPU attempt (default
                             /tmp/quiet_stop.pids; missing file = no-op)
"""

import json
import os
import shlex
import signal
import subprocess
import sys
import tempfile
import time

import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")

SECONDS = 6.0
RATE = 16000
N_SAMPLES = int(SECONDS * RATE)
BATCH = 128  # throughput saturates at 128-256 on v5e


def make_wavs(batch: int) -> np.ndarray:
    rng = np.random.default_rng(0)
    t = np.arange(N_SAMPLES) / RATE
    freqs = rng.uniform(80, 300, size=(batch, 1))
    sig = 3000 * np.sin(2 * np.pi * freqs * t[None, :])
    sig += 400 * rng.standard_normal((batch, N_SAMPLES))
    return sig.astype(np.float32)


def _enable_compile_cache():
    from pkr_tpu.utils import enable_compile_cache

    enable_compile_cache()


def measure_tpu(batch: int = BATCH, iters: int = 24,
                repeats: int = 7):
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from pkr_tpu.frontend import FrontendConfig, wav_to_train_feats
    from pkr_tpu.models import SpeakerModel

    cfg = FrontendConfig()
    model = SpeakerModel(spk_num=7325, feat_dim=40, pooling="mean+std",
                         loss="AAM", trunk="resnet34")

    wavs = jnp.asarray(make_wavs(batch))
    lengths = jnp.full((batch,), N_SAMPLES, jnp.int32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 40, 200)), train=False)

    # Two dispatches, not one: compiling the framing gather + DFT matmuls into
    # the same XLA program as the conv stack degrades the convs ~6x on v5e
    # (global layout assignment picks conv-hostile layouts); as separate
    # executables the frontend costs 0.3 ms and the trunk keeps its 16 ms.
    @jax.jit
    def wav_to_feats(wavs, lengths, rng):
        feats, mask, _ = wav_to_train_feats(wavs, lengths, rng, cfg)
        return jnp.transpose(feats, (0, 2, 1)), mask  # (B, F, T)

    @jax.jit
    def feats_to_emb(feats, mask):
        return model.apply(variables, feats, mask, train=False,
                           method=SpeakerModel.embed)

    def wav_to_emb(wavs, lengths, rng):
        feats, mask = wav_to_feats(wavs, lengths, rng)
        return feats_to_emb(feats, mask)

    key = jax.random.key(1)
    out = wav_to_emb(wavs, lengths, key)
    out.block_until_ready()  # compile + warmup
    # K repeated windows (VERDICT r3 weak #1): a single best-of number
    # cannot distinguish a real regression from tunnel/host-load jitter
    # round over round — the caller reports median + IQR over the windows
    rates = []
    for rep in range(repeats):
        t0 = time.perf_counter()
        for i in range(iters):
            out = wav_to_emb(wavs, lengths, jax.random.fold_in(key, i))
        out.block_until_ready()
        dt = time.perf_counter() - t0
        rates.append(batch * iters / dt)
    return rates


TRAIN_B = 256
TRAIN_T = 200  # the recipe's training crop (run_aam_v2.sh:71,98)


def resnet34_train_flops(batch: int, feat_dim: int, frames: int) -> float:
    """Analytic conv FLOPs of one ResNet-34 AAM training step (fwd+bwd ≈ 3×
    fwd, the standard MFU convention: matmul/conv MACs only, elementwise
    excluded).  Geometry per models/resnet.py (reference model.py:205-269):
    3×3 stem to 32ch stride 1, stages 32/64/128/256 × 3/4/6/3 blocks,
    strides 1/2/2/2, expansion-1 blocks."""
    h, w = feat_dim, frames
    flops = 2 * 1 * 32 * 9 * h * w  # stem
    cin = 32
    for c, n, s in ((32, 3, 1), (64, 4, 2), (128, 6, 2), (256, 3, 2)):
        h, w = -(-h // s), -(-w // s)
        for j in range(n):
            c_in = cin if j == 0 else c
            flops += 2 * 9 * c_in * c * h * w   # conv1
            flops += 2 * 9 * c * c * h * w      # conv2
            if j == 0 and (s != 1 or c_in != c):
                flops += 2 * c_in * c * h * w   # 1×1 downsample
            cin = c
    # fc1 (5·2·256 → 256) + AAM head (256 → 7325): negligible but counted
    flops += 2 * (5 * 2 * 256) * 256
    flops += 2 * 256 * 7325
    return 3.0 * batch * flops  # fwd + bwd


def measure_train(batch: int = TRAIN_B, iters: int = 20, repeats: int = 5):
    """Device-resident AAM training step (the docs/architecture.md roofline
    config): ex/s, ms/step and conv-MFU vs the v5e bf16 peak (197 TFLOP/s).
    Returns (window_rates, median_ex_per_s, step_ms, mfu_pct)."""
    import jax
    import jax.numpy as jnp

    from pkr_tpu.models import SpeakerModel
    from pkr_tpu.train.loop import make_train_step
    from pkr_tpu.train.state import create_train_state

    model = SpeakerModel(spk_num=7325, feat_dim=40, pooling="mean+std",
                         loss="AAM", trunk="resnet34")
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((batch, 40, TRAIN_T)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 7325, batch))
    state = create_train_state(model, jax.random.key(0), feats[:2], labels[:2])
    _, step = make_train_step(model)
    lr = jnp.asarray(0.05, jnp.float32)
    state, m = step(state, feats, labels, lr)
    jax.block_until_ready(m)  # compile + warmup
    rates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, feats, labels, lr)
        jax.block_until_ready(m)
        rates.append(batch * iters / (time.perf_counter() - t0))
    med = float(np.median(rates))
    step_ms = batch / med * 1e3
    mfu = resnet34_train_flops(batch, 40, TRAIN_T) / (step_ms / 1e3) / 197e12
    return rates, med, step_ms, 100.0 * mfu


def measure_cpu_reference(batches=(4, 16, 64), window: float = 30.0) -> float:
    """Torch-CPU equivalent of the decode_cpu.py path: ResNet-34 r-vector
    forward over precomputed 40-mel features, single process on this host —
    the reference extracts from feature arks, so NO fbank cost is included
    here (the TPU side's measured pipeline ADDS wav→fbank on top, making
    vs_baseline conservative).  Saturated: sweeps batch sizes with a
    >=30 s sustained window each and returns the best rate (VERDICT r1
    weak #6 hardening)."""
    import torch
    import torch.nn as nn

    torch.set_num_threads(os.cpu_count() or 1)

    class Block(nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.c1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.b1 = nn.BatchNorm2d(cout)
            self.c2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.b2 = nn.BatchNorm2d(cout)
            self.down = (nn.Sequential(nn.Conv2d(cin, cout, 1, stride, bias=False),
                                       nn.BatchNorm2d(cout))
                         if (stride != 1 or cin != cout) else None)

        def forward(self, x):
            r = x if self.down is None else self.down(x)
            y = torch.relu(self.b1(self.c1(x)))
            y = self.b2(self.c2(y))
            return torch.relu(y + r)

    class R34(nn.Module):
        def __init__(self):
            super().__init__()
            layers = [nn.Conv2d(1, 32, 3, 1, 1, bias=False), nn.BatchNorm2d(32),
                      nn.ReLU()]
            cin = 32
            for c, n, s in [(32, 3, 1), (64, 4, 2), (128, 6, 2), (256, 3, 2)]:
                for j in range(n):
                    layers.append(Block(cin, c, s if j == 0 else 1))
                    cin = c
            self.body = nn.Sequential(*layers)
            self.fc1 = nn.Linear(256 * 5 * 2, 256)

        def forward(self, x):
            f = self.body(x.unsqueeze(1))  # (B, 256, 5, T')
            mean = f.mean(dim=3)
            std = torch.sqrt(f.var(dim=3) + 1e-10)
            flat = torch.cat([mean, std], dim=-1).flatten(1)
            return self.fc1(flat)

    model = R34().eval()
    T = int(SECONDS * 100)  # ~100 fps fbank
    best = 0.0
    with torch.no_grad():
        for batch in batches:
            x = torch.randn(batch, 40, T)
            model(x)  # warmup this shape
            t0 = time.perf_counter()
            n = 0
            while time.perf_counter() - t0 < window:
                model(x)
                n += batch
            best = max(best, n / (time.perf_counter() - t0))
    return best


def child_main(quick: bool) -> None:
    """Runs inside the watchdog subprocess: performs the TPU measurements
    and prints a tagged, flushed line after EACH completed phase so the
    parent keeps whatever finished even if a later phase wedges the tunnel.
    stdout carries only the tagged lines; everything else goes to stderr."""
    import traceback

    rates = measure_tpu(batch=8 if quick else BATCH,
                        iters=2 if quick else 24,
                        repeats=3 if quick else 7)
    print("PKR_EXTRACT " + json.dumps([float(r) for r in rates]), flush=True)
    # training-step story in the same artifact (VERDICT r2 weak item 1):
    # a failed/hung train measure must not lose the extraction headline
    try:
        t_rates, ex_s, step_ms, mfu = measure_train(
            batch=32 if quick else TRAIN_B, iters=2 if quick else 20,
            repeats=3 if quick else 5)
        print("PKR_TRAIN " + json.dumps(
            {"rates": [float(r) for r in t_rates], "ex_s": float(ex_s),
             "step_ms": float(step_ms), "mfu": float(mfu)}), flush=True)
    except Exception:
        print("# train-step measure failed:", file=sys.stderr)
        traceback.print_exc(file=sys.stderr)


def _child_cmd(quick: bool):
    override = os.environ.get("PKR_BENCH_CHILD")
    if override:
        return shlex.split(override)
    cmd = [sys.executable, os.path.abspath(__file__), "--child"]
    if quick:
        cmd.append("--quick")
    return cmd


def _wait_quiet(max_wait: float, threshold: float) -> float:
    """Wait (bounded) for the 1-min loadavg to drop below threshold — the
    tunnel drops requests when the single host core is saturated."""
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if os.getloadavg()[0] <= threshold:
            break
        time.sleep(min(10.0, max(0.5, max_wait / 12)))
    return time.time() - t0


def _quiesce_pids():
    """Best-effort SIGSTOP of registered heavy host processes (background
    studies etc.) for the duration of a TPU attempt: the single-core tunnel
    drops requests under load, so a loaded host false-fails the bench.  The
    registry is one pid per line (the same file the round's tunnel watchdog
    uses); a missing/empty file is a no-op, and so is a registry older than
    24h (a stale file from a previous session could name reused pids of
    unrelated processes).  Each registered pid is stopped together with its
    live descendants: registries naturally hold the pid of a nohup'd shell
    wrapper while the CPU burner is a child, and SIGSTOP does not propagate.
    Children are stopped before their parent so a still-running parent
    cannot respawn or reap mid-quiesce.  Returns the pids stopped so the
    caller can resume exactly those.  Idempotent — callers re-issue it
    DURING long attempts because an external supervisor on some hosts
    SIGCONTs processes that stay stopped for minutes."""
    path = os.environ.get("PKR_BENCH_QUIET_PIDS", "/tmp/quiet_stop.pids")
    stopped = []
    try:
        if time.time() - os.path.getmtime(path) > 86400:
            return stopped
        lines = open(path).read().split()
    except OSError:
        return stopped
    roots = []
    for tok in lines:
        try:
            pid = int(tok)
        except ValueError:
            continue
        if pid not in (os.getpid(), os.getppid()):
            roots.append(pid)
    self_pid = os.getpid()
    for pid in roots:
        for target in _descendants_last(pid):
            if target == self_pid or target in stopped:
                continue
            try:
                os.kill(target, signal.SIGSTOP)
                stopped.append(target)
            except (OSError, ProcessLookupError):
                pass
    return stopped


def _descendants_last(root: int):
    """root plus its transitive live children, deepest first (children
    before parents), from one snapshot of /proc ppid links.  On any /proc
    read failure, degrades to [root]."""
    kids = {}
    try:
        for ent in os.listdir("/proc"):
            if not ent.isdigit():
                continue
            try:
                with open(f"/proc/{ent}/stat") as f:
                    raw = f.read()
                ppid = int(raw.rsplit(")", 1)[1].split()[1])
            except (OSError, ValueError, IndexError):
                continue
            kids.setdefault(ppid, []).append(int(ent))
    except OSError:
        return [root]
    order, stack, seen = [], [root], {root}
    while stack:
        pid = stack.pop()
        order.append(pid)
        for child in kids.get(pid, ()):
            if child not in seen:
                seen.add(child)
                stack.append(child)
    return order[::-1]


def _resume_pids(pids) -> None:
    for pid in pids:
        try:
            os.kill(pid, signal.SIGCONT)
        except (OSError, ProcessLookupError):
            pass


def _run_attempt(quick: bool, timeout: float, keep_quiet=None):
    """One watchdog-bounded child run.  Returns (extract_rates|None,
    train_dict|None, note:str).  The child is SIGKILLed on expiry — a jax
    process wedged on the tunnel ignores anything gentler.  keep_quiet, if
    given, is re-invoked every ~20s while waiting: supervisors on some
    hosts SIGCONT processes that stay stopped for minutes, so a one-shot
    quiesce would collapse partway through a long attempt."""
    with tempfile.NamedTemporaryFile("w+", suffix=".bench") as out:
        proc = subprocess.Popen(_child_cmd(quick), stdout=out,
                                cwd=os.path.dirname(os.path.abspath(__file__)))
        note = "ok"
        deadline = time.time() + timeout
        rc = None
        while True:
            try:
                rc = proc.wait(timeout=min(20.0, max(0.1,
                                                     deadline - time.time())))
                if rc != 0:
                    note = f"child exited rc={rc}"
                break
            except subprocess.TimeoutExpired:
                if time.time() < deadline:
                    if keep_quiet is not None:
                        keep_quiet()
                    continue
            proc.kill()
            try:
                # even SIGKILL can stall on a child wedged in uninterruptible
                # (D-state) kernel sleep inside a tunnel syscall — bound the
                # reap and abandon the corpse rather than hang the parent
                proc.wait(timeout=30)
                note = f"child hung; killed after {timeout:.0f}s"
            except subprocess.TimeoutExpired:
                note = (f"child hung; kill after {timeout:.0f}s did not reap "
                        "in 30s (D-state) — abandoned")
            break
        out.seek(0)
        extract = train = None
        for line in out.read().splitlines():
            # malformed tagged output (override child, line truncated by a
            # full disk) must degrade to a note, never crash the parent —
            # the whole module exists to ALWAYS print one JSON line
            try:
                if line.startswith("PKR_EXTRACT "):
                    extract = json.loads(line[len("PKR_EXTRACT "):])
                elif line.startswith("PKR_TRAIN "):
                    train = json.loads(line[len("PKR_TRAIN "):])
            except (json.JSONDecodeError, ValueError):
                note = f"unparseable tagged line: {line[:60]!r}"
        if rc == 0 and extract is None and note == "ok":
            # an 'ok' note with no data would make the final error field
            # read 'attempt 1: ok' — actively misleading
            note = "child exited rc=0 without tagged output"
        return extract, train, note


def main():
    argv = sys.argv[1:]
    quick = "--quick" in argv
    if "--child" in argv:
        child_main(quick)
        return
    if os.path.exists(BASELINE_FILE):
        baseline = json.load(open(BASELINE_FILE))["cpu_embeddings_per_sec"]
    elif quick:
        baseline = measure_cpu_reference(batches=(16,), window=3.0)
    else:
        baseline = measure_cpu_reference()
        json.dump({"cpu_embeddings_per_sec": baseline,
                   "note": "torch-CPU ResNet34 r-vector forward (decode_cpu.py "
                           "path), saturated: best of batch {4,16,64}, "
                           ">=30s sustained window each"},
                  open(BASELINE_FILE, "w"), indent=1)

    env = os.environ.get
    attempt_timeout = float(env("PKR_BENCH_ATTEMPT_TIMEOUT",
                                "240" if quick else "600"))
    # the driver wraps bench.py in its own (unknown) timeout; the budget
    # keeps worst-case wall (quiet waits + attempts + sleeps) under ~18 min
    # so our JSON line always prints before anyone else's axe falls
    budget = float(env("PKR_BENCH_BUDGET_S", "1080"))
    max_attempts = int(env("PKR_BENCH_ATTEMPTS", "3"))
    quiet_load = float(env("PKR_BENCH_QUIET_LOAD", "0.8"))
    quiet_wait = float(env("PKR_BENCH_QUIET_WAIT", "120"))
    retry_sleep = float(env("PKR_BENCH_RETRY_SLEEP", "20"))

    # The tunnel has a second failure mode besides the outright hang: it
    # stays responsive but every dispatch crawls (observed live 2026-08-19:
    # jax.devices() fine, 1k matmul 12x slow, bench median 520 emb/s vs the
    # committed healthy 6379).  A single "successful" attempt in that state
    # would record a number ~12x below reality, so an attempt whose median
    # lands under a quarter of the committed healthy median is treated like
    # a failed attempt (retry after a recovery sleep) — but its numbers are
    # kept and the BEST attempt is reported, annotated, if none recovers.
    degraded_floor = float(env("PKR_BENCH_DEGRADED_FLOOR",
                               str(0.25 * 6379.45)))  # bench_r5_sanity.json
    deadline = time.time() + budget
    load1 = os.getloadavg()[0]  # host load when the measure starts
    extract = train = None
    best = None  # (median, extract, train) across degraded attempts
    notes = []
    attempts = 0
    for attempt in range(1, max_attempts + 1):
        # quiesce registered heavy processes FIRST so the load threshold
        # below is actually reachable (re-issued every attempt: an external
        # supervisor may CONT long-stopped processes)
        quiesced = _quiesce_pids()
        try:
            _wait_quiet(min(quiet_wait, max(0.0, deadline - time.time())),
                        quiet_load)
            # the first attempt always gets the full timeout; later ones are
            # clipped to the remaining budget so the driver's own timeout can
            # never fire before we print our JSON line
            t = attempt_timeout if attempt == 1 else \
                min(attempt_timeout, max(10.0, deadline - time.time()))
            extract, train, note = _run_attempt(
                quick, t, keep_quiet=lambda: quiesced.extend(
                    p for p in _quiesce_pids() if p not in quiesced))
        finally:
            _resume_pids(quiesced)
        attempts = attempt
        if extract is not None:
            med = float(np.median(extract))
            if best is None or med > best[0]:
                best = (med, extract, train)
            if med >= degraded_floor:
                notes.append(f"attempt {attempt}: {note}")
                break
            notes.append(
                f"attempt {attempt}: {note} (degraded chip: median "
                f"{med:.0f} emb/s < floor {degraded_floor:.0f})")
        else:
            notes.append(f"attempt {attempt}: {note}")
        if time.time() >= deadline:
            notes.append("budget exhausted")
            break
        if attempt < max_attempts:
            time.sleep(min(retry_sleep, max(0.0, deadline - time.time())))
    if best is not None:
        _, extract, train = best

    result = {
        "metric": "wav→fbank→ResNet34 embedding throughput",
        "unit": "embeddings/sec/chip (6s utterances)",
        "host_load1": round(load1, 2),
        "bench_attempts": attempts,
    }
    if extract is None:
        # partial JSON instead of nothing (VERDICT r4 do #1): the driver
        # records a datapoint that SAYS the tunnel was down, not an empty file
        result.update({"value": None, "vs_baseline": None,
                       "error": "; ".join(notes)})
        print(json.dumps(result))
        return
    # median + IQR over K windows (VERDICT r3 do #3): makes round-over-round
    # drift distinguishable from host-load / tunnel noise
    value = float(np.median(extract))
    q1, q3 = np.percentile(extract, (25, 75))
    result.update({
        "value": round(value, 2),
        "vs_baseline": round(value / baseline, 2),
        "value_median": round(value, 2),
        "value_iqr": round(float(q3 - q1), 2),
        "value_best": round(float(max(extract)), 2),
        "n_windows": len(extract),
    })
    if value < degraded_floor:
        # the number is real but the chip never left its degraded state —
        # flag it so round-over-round comparisons don't read it as a code
        # regression (the committed healthy medians are the reference)
        result["suspect_degraded_chip"] = True
        result["healthy_median_ref"] = 6379.45
    if train is not None:
        tq1, tq3 = np.percentile(train["rates"], (25, 75))
        result.update({"train_ex_per_s": round(train["ex_s"], 1),
                       "train_ex_per_s_iqr": round(float(tq3 - tq1), 1),
                       "train_step_ms": round(train["step_ms"], 2),
                       "train_mfu_pct": round(train["mfu"], 1)})
    else:
        result["train_error"] = "train phase missing: " + "; ".join(notes)
    if any(not n.endswith(": ok") for n in notes):
        result["bench_notes"] = "; ".join(notes)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
