"""Headline benchmark: rot-equivariant PNEConv forward+backward throughput.

Measures the north-star metric of BASELINE.json — PNEConv points/sec/chip,
fwd+bwd — on one full equivariant conv layer (geometry transform + PNE MLP
+ basis projection + weight contraction + gradients w.r.t. parameters and
features), the exact per-layer workload of the reference's hot loop
(``PNEConvLayerRotEquiv.__compute_convolution__`` + CUDA feat_basis_proj
fwd/bwd, SURVEY §3.2).  The compute path is the fused Pallas kernel
(``ops/pallas/fused_equiv.py``).

Measurement discipline (hard-won platform facts, see
experiments/chip_residency.py and CLAUDE.md):

  * this axon setup serves identical (executable, inputs) executions from
    a cache ACROSS processes, and arrays do NOT stay device-resident
    between executions — every execution re-streams host-staged inputs at
    ~20 GB/s, so timings with large host inputs measure the tunnel;
  * therefore the timed jitted program takes ONE fresh entropy seed,
    builds the conv workload ON-DEVICE from it, and scans the conv S
    times with a carry-dependent perturbation of the features (epsilon
    scale — defeats CSE and the execution cache, costs nothing);
  * this matches production, where conv inputs are on-device
    intermediates of the jitted train step;
  * the analytic FLOP count, achieved TFLOP/s, and MFU against the
    197 TFLOP/s v5e bf16 spec peak are printed, and the bench HARD-FAILS
    if implied MFU exceeds 100% (physically impossible = invalid
    measurement).  For context, the measured single-chip ceilings through
    this stack are ~110 TFLOP/s matmul / ~110 GB/s HBM read / ~43 GB/s
    gather (experiments/chip_roofline.py).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}
where vs_baseline is value / 20e6 (the 20M pts/s/chip target).
"""
from __future__ import annotations

import json
import os
import sys
import threading
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: cold compiles of the full bench take ~10
# minutes through this tunnel's compile helper (r3 measurement) — past any
# sane watchdog — but cached re-compiles land in seconds and the cache
# works across processes on this platform (verified r3).  Warmed here, hit
# by the driver's run.  Namespaced per platform+host (utils/cache.py) so
# CPU-mesh entries never share a directory with the TPU entries.
from se3conv3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from se3conv3d_tpu.core.neighborhoods import Neighborhood
from se3conv3d_tpu.core.pointcloud import PointCloud
from se3conv3d_tpu.core.rotation import random_rotations
from se3conv3d_tpu.ops import pne_conv as ops

# Hard wall-clock watchdog (VERDICT r2: rc=124 with zero output is not a
# deliverable).  A daemon THREAD, not signal.alarm: a hung tunnel call can
# block in C without returning to the bytecode loop, so a SIGALRM handler
# might never run; a thread always can print + _exit.
WATCHDOG_SEC = float(os.environ.get("BENCH_WATCHDOG_SEC", "330"))
PROBE_SEC = float(os.environ.get("BENCH_PROBE_SEC", "235"))
# Absolute ceiling: the driver wraps bench.py in its own timeout (rc=124
# with NO output in rounds 1-2); we must always emit before it fires.
GLOBAL_SEC = float(os.environ.get("BENCH_GLOBAL_SEC", "480"))

# Workload: one trunk-level conv of the DFaust rot-equiv config.
B = 1
N = 65536  # points
K = 16  # neighbors
F = 2  # frames (pca_2F)
CB = 32  # basis functions
CI = CO = 64  # channels
TARGET = 20e6
S = 8  # conv steps per timed execution

# Cold-cache fallback workload: same conv math at a quarter of the query
# points (one m-chunk, no chunk scan) and fewer steps — compiles several
# times faster, so a round where the full bench's compile outlasts the
# watchdog still records a real measurement as best-so-far.
N_MINI = 16384
S_MINI = 4

# TPU v5e spec peak: 197 TFLOP/s bf16 — the MFU guard bound (nothing can
# legitimately exceed it; the tunnel-attached chip measures ~110).
PEAK_FLOPS = 197e12


def conv_flops_fwd_bwd(n: int = N) -> float:
    """Analytic matmul FLOPs of one conv fwd+bwd at the bench shapes.

    fwd: PNE projection (E x 9 @ 9 x CB), neighbor aggregation
    (contraction K*F), weight contraction (contraction CB*CI).
    bwd ~ 2x fwd-shaped contractions -> 3x total.  Elementwise work
    (gelu, masks) excluded: this is the matmul floor.
    """
    edges = B * n * K * F * F
    f_pne = 2.0 * edges * 9 * CB
    f_agg = 2.0 * B * n * F * CB * CI * (K * F)
    f_out = 2.0 * B * n * F * CI * CB * CO
    return 3.0 * (f_pne + f_agg + f_out)


def build_workload(key, n: int = N):
    """On-device: positions, frames, neighbor table, features, params.

    The neighbor table is random-but-valid: the conv's memory/compute
    pattern is identical to a kNN table, and building true kNN inside the
    timed region would benchmark the search instead of the conv.
    """
    ks = jax.random.split(key, 7)
    pts = jax.random.uniform(ks[0], (B, n, 3)) * 4.0
    frames = random_rotations(ks[1], B * n * F).reshape(B, n, F, 3, 3)
    idx = jax.random.randint(ks[2], (B, n, K), 0, n)
    feats = jax.random.normal(ks[3], (B, n, F, CI))
    pa = jax.random.normal(ks[4], (9, CB)) * 0.3
    pb = jax.random.normal(ks[5], (CB,)) * 0.02
    w = jax.random.normal(ks[6], (CI, CB, CO)) * 0.05
    return pts, frames, idx, feats, pa, pb, w


LAYERS = 2  # convs sharing one geometry build, like a hierarchy level

# Conv backward flavor (both are production configs, gradient-exact to
# each other — tests/test_fused_equiv.py):
#   BENCH_LEAN=1  lean inputs-only VJP (no [B,M,E,C] gathered-feature
#                 residual; backward re-gathers and calls the backward
#                 kernel) — the memory-lean default of big recipes
#                 (ScanNet), where it replaces layer remat;
#   BENCH_LEAN=0  XLA autodiff residuals (YAML `lean_vjp: false`) — ~5%
#                 faster at these shapes (the backward re-gather is
#                 row-op-latency bound) when the residuals fit HBM, as
#                 they do at DFaust bench scale.  Measured r3 session I:
#                 1.217M vs 1.157M pts/s.  Default: the faster config.
LEAN = os.environ.get("BENCH_LEAN", "0") != "0"


def make_bench(compute_dtype, n: int = N, s: int = S):
    def loss(feats, pts, frames, idx, pa, pb, w):
        pc = PointCloud(
            positions=pts, mask=jnp.ones((B, n), bool), frames=frames
        )
        neigh = Neighborhood(
            idx=idx, mask=jnp.ones((B, n, K), bool),
            query_mask=jnp.ones((B, n), bool),
        )
        # Geometry built once per neighborhood per step and shared by the
        # convs on it — the reference's rot-tensor cache semantics
        # (PNEConvLayerRotEquiv.py:53-71; FPNSegUNet stacks 2-4 convs per
        # level).  LAYERS chained convs consume it, like a level's blocks.
        geo_t = ops.packed_equiv_geometry(
            pc, pc, neigh, "bfloat16" if compute_dtype else None
        )
        neigh = neigh.replace(equiv_geo_t=geo_t)
        if ops.BWD_SCATTER_MODE == "sorted":
            # per-neighborhood sorted-edge tables, shared by the conv
            # stack like production (SE3CONV_BWD_MODE=sorted A/B runs)
            neigh = ops.backward_sort_tables(neigh, n)
        x = feats
        total = jnp.zeros(())
        for _ in range(LAYERS):
            x = ops.fused_equiv_conv(
                pc, pc, neigh, x, pa, pb, w,
                jnp.asarray(10.0), jnp.asarray(1.0 / K),
                compute_dtype=compute_dtype, lean_vjp=LEAN,
            )  # [B, N, F, CO] feeds the next conv (CO == CI)
            total = total + jnp.sum(x * x)
        return total

    vg = jax.value_and_grad(loss, argnums=(0, 4, 5, 6))

    @jax.jit
    def bench(seed):
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
        pts, frames, idx, feats, pa, pb, w = build_workload(key, n)

        def step(carry, _):
            f_i = feats * (1.0 + 1e-12 * carry)
            v, grads = vg(f_i, pts, frames, idx, pa, pb, w)
            gs = sum(jnp.sum(g.astype(jnp.float32)) for g in grads)
            return carry + v + gs, ()

        carry, _ = jax.lax.scan(step, jnp.zeros(()), None, length=s)
        return carry

    return bench


def fresh_seed() -> int:
    return int.from_bytes(os.urandom(4), "little") % (2**31)


class _Watchdog:
    """Emits a diagnostic (or best-so-far) JSON line and exits if the
    backend hangs past a deadline.  The driver then still gets a parsed
    BENCH_rN.json instead of rc=124 silence."""

    def __init__(self):
        self.t0 = time.monotonic()
        self.deadline = self.t0 + PROBE_SEC
        self.stage = "startup"
        self.best = None  # best full result dict so far
        self.emitted = False
        self.lock = threading.Lock()
        t = threading.Thread(target=self._run, daemon=True)
        t.start()

    def set_stage(self, stage: str, deadline_from_now: float):
        with self.lock:
            self.stage = stage
            self.deadline = min(
                time.monotonic() + deadline_from_now, self.t0 + GLOBAL_SEC
            )

    def emit(self, payload: dict, code: int = 0):
        with self.lock:
            if self.emitted:
                return
            self.emitted = True
        print(json.dumps(payload))
        sys.stdout.flush()
        if code == 0 and threading.current_thread() is threading.main_thread():
            return  # normal path: let main() return normally
        os._exit(code)

    def _run(self):
        while True:
            time.sleep(2.0)
            with self.lock:
                if self.emitted:
                    return
                expired = time.monotonic() > self.deadline
                stage, best = self.stage, self.best
            if expired:
                if best is not None:
                    best = dict(best)
                    best["note"] = (
                        f"watchdog fired during stage '{stage}'; reporting "
                        "best completed measurement"
                    )
                    self.emit(best, code=0)
                else:
                    self.emit(
                        {
                            "metric": "equiv_pneconv_fwd_bwd_points_per_sec",
                            "value": 0.0,
                            "unit": "points/sec/chip",
                            "vs_baseline": 0.0,
                            "error": (
                                f"watchdog: stage '{stage}' exceeded its "
                                f"deadline ({time.monotonic()-self.t0:.0f}s "
                                "elapsed); backend likely unhealthy"
                            ),
                        },
                        code=0,
                    )
                os._exit(0)


def _result_payload(pts_per_sec, sec_per_step, dtype, n: int = N,
                    s: int = S) -> dict:
    flops = conv_flops_fwd_bwd(n)
    mfu = flops / sec_per_step / PEAK_FLOPS
    return {
        "metric": "equiv_pneconv_fwd_bwd_points_per_sec",
        "value": round(pts_per_sec, 1),
        "unit": "points/sec/chip",
        "vs_baseline": round(pts_per_sec / TARGET, 4),
        "sec_per_step": round(sec_per_step, 6),
        "flops_per_step": flops,
        "achieved_tflops": round(flops / sec_per_step / 1e12, 3),
        "mfu_vs_bf16_peak": round(mfu, 4),
        "dtype": "bf16" if dtype else "f32",
        "kernel": "pallas_fused",
        "conv_vjp": "lean" if LEAN else "autodiff",
        "points": n,
        "steps_per_exec": s,
        "convs_per_geometry": LAYERS,
    }


def _subprocess_probe(timeout_s: float) -> bool:
    """One tiny device op in a child process.  A wedged tunnel hangs the
    calling THREAD unrecoverably, so retries must happen in children."""
    import subprocess

    # sitecustomize pre-imports jax, so the JAX_PLATFORMS env var alone
    # does not stick in children — apply it explicitly.  Production runs
    # leave it unset (real platform); tests force 'cpu' to stay hermetic
    # when the real chip is wedged.
    code = (
        "import os, jax; p = os.environ.get('JAX_PLATFORMS'); "
        "p and jax.config.update('jax_platforms', p); "
        "import jax.numpy as jnp; "
        "jax.device_get(jnp.ones(()) + 1.0)"
    )
    try:
        return (
            subprocess.run(
                [sys.executable, "-c", code],
                timeout=timeout_s, capture_output=True,
            ).returncode
            == 0
        )
    except subprocess.TimeoutExpired:
        return False


_DOG: "_Watchdog | None" = None  # exposed for the crash handler below


def main():
    global _DOG
    dog = _DOG = _Watchdog()

    # Fail-fast backend probes: child-process ops, retried — the chip
    # flaps (r3: responsive for ~a minute, wedged for tens), so one
    # failed probe must not forfeit the round's number.  Each retry's
    # timeout is cut to the REMAINING global budget (minus emission
    # headroom): at the 235/480 defaults that fits a second ~225 s probe
    # after a first full-length failure — the r3 arithmetic (fixed
    # elapsed-time guard) broke out before any retry could run.
    dog.set_stage("backend-probe", GLOBAL_SEC)  # children do the timing
    probe_ok = False
    for _ in range(5):
        remaining = GLOBAL_SEC - (time.monotonic() - dog.t0)
        budget = min(PROBE_SEC, remaining - 20.0)
        if budget < min(30.0, PROBE_SEC):
            break  # not enough budget left for a meaningful probe
        if _subprocess_probe(budget):
            probe_ok = True
            break
    if not probe_ok:
        dog.emit(
            {
                "metric": "equiv_pneconv_fwd_bwd_points_per_sec",
                "value": 0.0,
                "unit": "points/sec/chip",
                "vs_baseline": 0.0,
                "error": "backend probes failed; chip unresponsive",
            }
        )
        return

    # the main process's own first op (still watchdog-guarded: the chip
    # may wedge between the child probe and here)
    dog.set_stage("backend-first-op", PROBE_SEC)
    float(jax.device_get(jnp.zeros(()) + 1.0))

    # The backend is now real: if the tunnel silently fell back to CPU,
    # stop persisting under the accelerator cache namespace
    # (utils/cache.py:verify_cache_platform — SIGILL hazard otherwise).
    from se3conv3d_tpu.utils.cache import verify_cache_platform

    verify_cache_platform()

    # Mini workload first: a real (smaller) measurement lands in
    # dog.best within a couple of minutes even cold-cache, so a slow full
    # compile can no longer cost the round its number.
    if not os.environ.get("BENCH_SKIP_MINI"):
        mini = make_bench("bfloat16", N_MINI, S_MINI)
        dog.set_stage("compile-mini", WATCHDOG_SEC)
        float(jax.device_get(mini(fresh_seed())))
        t0 = time.perf_counter()
        dog.set_stage("measure-mini", 90.0)
        float(jax.device_get(mini(fresh_seed())))
        sec = (time.perf_counter() - t0) / (S_MINI * LAYERS)
        mini_payload = _result_payload(
            B * N_MINI / sec, sec, "bfloat16", N_MINI, S_MINI
        )
        mini_payload["note"] = "mini fallback workload"
        dog.best = mini_payload

    # bf16 is the production dtype and the headline number; the f32 sweep
    # doubles compile time for a strictly worse result — opt-in only.
    dtypes = ("bfloat16", None) if os.environ.get("BENCH_ALL_DTYPES") else (
        "bfloat16",
    )
    results = []
    for dtype in dtypes:
        tag = "bf16" if dtype else "f32"
        bench = make_bench(dtype)
        dog.set_stage(f"compile-{tag}", WATCHDOG_SEC)
        float(jax.device_get(bench(fresh_seed())))  # compile + warm
        times = []
        for i in range(3):
            dog.set_stage(f"measure-{tag}-{i}", 90.0)
            t0 = time.perf_counter()
            float(jax.device_get(bench(fresh_seed())))
            times.append(time.perf_counter() - t0)
        sec_per_step = min(times) / (S * LAYERS)  # per conv layer
        results.append((B * N / sec_per_step, sec_per_step, dtype))
        best = max(results, key=lambda r: r[0])
        dog.best = _result_payload(*best)  # emitted if a later stage hangs

    pts_per_sec, sec_per_step, dtype = max(results, key=lambda r: r[0])
    payload = _result_payload(pts_per_sec, sec_per_step, dtype)

    if payload["mfu_vs_bf16_peak"] > 1.0:
        print(
            f"BENCH INVALID: implied MFU {payload['mfu_vs_bf16_peak']:.2%} "
            f"exceeds 100% of the {PEAK_FLOPS/1e12:.0f} TFLOP/s chip peak "
            "- measurement artifact",
            file=sys.stderr,
        )
        # still a parseable line for the driver before the failing rc
        dog.emit(
            {
                "metric": "equiv_pneconv_fwd_bwd_points_per_sec",
                "value": 0.0,
                "unit": "points/sec/chip",
                "vs_baseline": 0.0,
                "error": (
                    f"implied MFU {payload['mfu_vs_bf16_peak']:.4f} exceeds "
                    "1.0 of spec peak - measurement artifact"
                ),
            }
        )
        sys.exit(1)

    dog.emit(payload)


def run_main():
    """main() + crash handling: ALWAYS exactly one JSON line, preferring
    the best completed measurement over a value-0 error (a flapping chip
    must not forfeit the round's number after the mini workload landed).
    The watchdog's `emitted` flag makes emit() single-shot even when the
    watchdog thread and this handler race."""
    try:
        main()
    except SystemExit:
        raise
    except BaseException as e:  # noqa: BLE001 - emit parseable diagnostics
        err = f"{type(e).__name__}: {e}"[:500]
        dog, best = _DOG, _DOG.best if _DOG is not None else None
        if best is not None:
            payload = dict(best)
            payload["note"] = (
                f"exception after best completed measurement: {err}"
            )
        else:
            payload = {
                "metric": "equiv_pneconv_fwd_bwd_points_per_sec",
                "value": 0.0,
                "unit": "points/sec/chip",
                "vs_baseline": 0.0,
                "error": err,
            }
        if dog is not None:
            dog.emit(payload)
        else:
            print(json.dumps(payload))
            sys.stdout.flush()
        # rc=0 on purpose: the driver must record a parsed JSON line (the
        # error field / note is self-describing) rather than rc-only.
        sys.exit(0)


if __name__ == "__main__":
    run_main()
