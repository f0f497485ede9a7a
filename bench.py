"""Benchmark: purified-images/sec/chip through the flagship NVAE defense.

Headline metric (default run): the hot inner loop of the evaluation harness
- the EoT-32 stochastic purification + classification forward (SURVEY.md
3.1: the dominant cost of every attack iteration) - at the REAL ids scale
(NVAE initial_channels=32, 24 latent groups, vgg11_bn/100) on one TPU chip,
in bfloat16 (the promoted fast path: weights cast once, f32 logits
contract; parity vs f32 is guarded by tests/test_precision.py).  Prints ONE
JSON line.

GAT_BENCH selects other measurements (each still prints one JSON line):
  flagship_bf16 (default) | flagship_f32 | apgd_bf16 | apgd_f32
  | gender_f32 | cars_f32 | all  (all = every entry, merged into the
  headline line's "extra" field)

Measurement integrity note: this runtime lazily cancels computations whose
output buffers are dropped, and block_until_ready alone has been observed
not to force execution - so every timed loop keeps all outputs and forces
execution with a single scalar fetch that depends on all of them
(verified linear in iteration count).

`vs_baseline` anchor: the reference publishes no throughput (BASELINE.md).
BASELINE_A100_IMG_S is derived from a MEASURED run of the reference torch
pipeline at the same flagship scale on this host's CPU
(tools/bench_reference_torch.py) scaled by a documented FLOPs ratio - see
BASELINE.md "Measured" for the arithmetic and provenance.
"""

import hashlib
import json
import os
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

# Anchor for vs_baseline: estimated A100 img/s for the reference torch
# pipeline (EoT-32 NVAE purify+classify, flagship ids scale).  Derived, not
# invented: the reference pipeline MEASURED on this host's CPU via its own
# checkpoint formats (tools/bench_reference_torch.py: 0.0544 img/s =
# 29.9 GFLOPS effective at 549 GFLOP/image, XLA cost analysis) scaled by an
# A100/CPU-core achieved-throughput band of 300-700x for f32/TF32 eager
# convs -> 16-38 img/s; midpoint 25.  Full arithmetic + provenance in
# BASELINE.md "Measured".
BASELINE_A100_IMG_S = 25.0

MODE = os.environ.get("GAT_BENCH", "flagship_bf16")
if os.environ.get("GAT_BENCH_DTYPE") == "float32" and MODE == "flagship_bf16":
    MODE = "flagship_f32"  # legacy round-1 env

EOT = 32


_T0 = time.perf_counter()
_WALL0 = time.time()


def _tlog(msg: str):
    """Worker stage log on stderr (stdout carries only JSON lines): lets a
    deadline miss be diagnosed from the supervisor's captured stderr."""
    print(f"[bench +{time.perf_counter() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _deadline_left() -> float:
    """Seconds left before the supervisor kills this worker, minus a safety
    margin for fetch latency + supervisor overhead.  GAT_BENCH_T0 (epoch
    seconds, set by the supervisor at its own start) anchors the clock;
    WITHOUT it (standalone worker runs, tool sweeps) there is no deadline
    and nothing is ever trimmed.  r03's driver bench died mid-timing at
    t=411.5s of a 420s deadline — every expensive optional stage now
    checks this first."""
    t0 = os.environ.get("GAT_BENCH_T0")
    if t0 is None:
        return float("inf")
    deadline = float(os.environ.get("GAT_BENCH_DEADLINE", "560"))
    return deadline - 25.0 - (time.time() - float(t0))


def _timed(step, args, iters: int, per_iter_images: int,
           deadline_aware: bool = True):
    """Time `iters` calls of jitted `step` (already warmed), rotating the
    key; returns img/s.  Forces execution via one scalar over all outputs.

    A SECOND forced warmup call runs before the timed window: the first
    dispatches of a fresh program through this remote backend carry
    one-time costs a single forced call does not flush (measured
    2026-08-19: a 13ms stage program read 548ms/iter when timed right
    after one warmup — tools/profile_flagship.py).  The warmup doubles as
    a per-call cost probe: when the remaining supervisor budget cannot fit
    `iters` calls, the window shrinks (floor 2) rather than get killed
    mid-window with nothing measured (the r03 failure mode)."""
    tw = time.perf_counter()
    float(step(*args, jax.random.PRNGKey(2)))
    per_call = time.perf_counter() - tw
    left = _deadline_left()
    if deadline_aware and np.isfinite(left):
        fit = int(max(2, left / max(per_call, 1e-9)))
        if fit < iters:
            _tlog(f"deadline-trim: {iters} -> {fit} timed iters "
                  f"(~{per_call:.1f}s/call, {left:.0f}s left)")
            iters = fit
    _tlog(f"second warmup done; timing {iters} iters")
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    outs = []
    for _ in range(iters):
        key, sub = jax.random.split(key)
        outs.append(step(*args, sub))
    total = float(jnp.sum(jnp.stack([jnp.sum(o) for o in outs])))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(total)
    return per_iter_images / dt


def _step_cost(step, *args) -> dict | None:
    """XLA cost analysis of one compiled call of jitted `step` (same source
    as BASELINE.md's 549 GFLOP/img figure): {'flops', 'bytes'} — bytes is
    'bytes accessed' (HBM traffic proxy, the roofline's other axis).  None
    if the backend doesn't expose it."""
    try:
        ca = step.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        if f <= 0:
            return None
        return {"flops": f, "bytes": float(ca.get("bytes accessed", 0.0))}
    except Exception:
        return None


def _peak_tflops(dtype: str) -> float | None:
    """Chip bf16 MXU peak (TFLOP/s).  f32 gets no %-peak: the MXU has no
    native f32 mode (XLA emulates via multi-pass bf16), so a single peak
    number would be misleading."""
    if dtype != "bfloat16":
        return None
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return None
    for tag, peak in (("v5 lite", 197.0), ("v5e", 197.0), ("v5p", 459.0),
                      ("v6", 918.0), ("v4", 275.0)):
        if tag in kind:
            return peak
    return None


def _perf_fields(rate: float, cost: dict | None, units_per_call: int,
                 dtype: str) -> dict:
    """MFU + roofline bookkeeping attached to every bench line: FLOPs per
    reported unit (image or image*iter), achieved TFLOP/s, % of the chip's
    bf16 peak, and achieved HBM GB/s with its % of peak bandwidth (VERDICT
    r2 items 2+3: make 'is it actually fast, and if not, is it at the
    bandwidth bound?' answerable from the artifact alone)."""
    if not cost:
        return {}
    flops_per_unit = cost["flops"] / units_per_call
    out = {"gflop_per_unit": round(flops_per_unit / 1e9, 1),
           "tflops": round(rate * flops_per_unit / 1e12, 2)}
    peak = _peak_tflops(dtype)
    if peak:
        out["pct_peak_bf16"] = round(100.0 * out["tflops"] / peak, 1)
    if cost.get("bytes"):
        gbps = rate * (cost["bytes"] / units_per_call) / 1e9
        out["hbm_gbps"] = round(gbps, 1)
        bw = _peak_hbm_gbps()
        if bw:
            out["pct_peak_hbm"] = round(100.0 * gbps / bw, 1)
    return out


def _peak_hbm_gbps() -> float | None:
    """Chip HBM bandwidth (GB/s)."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return None
    for tag, bw in (("v5 lite", 819.0), ("v5e", 819.0), ("v5p", 2765.0),
                    ("v6", 1640.0), ("v4", 1228.0)):
        if tag in kind:
            return bw
    return None


def _analytic_attack_perf(defense, rate: float, batch: int, dtype: str,
                          n_cotangents: int, remat: bool,
                          eot_chunk: int | None = 8) -> dict:
    """Analytic roofline fields for LOOP-CARRIED attack benches (VERDICT r4
    weak#5): XLA cost analysis counts a while/scan body once regardless of
    trip count, so the attack programs themselves undercount FLOPs
    ~n_iter-fold.  Instead, cost-analyze ONE straight-line EoT forward at
    the bench's exact (batch, chunk) point and scale:

      flops/iter = F_fwd * (1 + m*K)

    K = cotangent count of the per-iteration jacobian (APGD/C&W scalar
    loss: 1; DeepFool top-k: k; FAB: n_classes), m = backward cost in
    forward units (2 without remat; 3 under full remat, which recomputes
    the forward once per backward).  The one forward shared by all K
    cotangents (jax.vjp) is the +1.  Bytes are not modeled (no HBM claim).
    Fields carry an _analytic suffix + the model string so they can never
    be confused with measured cost-analysis numbers."""
    if _deadline_left() < 90.0:
        return {}
    from gen_adversarial_tpu.defenses.eot import eot_wrap

    @jax.jit
    def fwd(defense, x, key):
        net = eot_wrap(defense, eot_steps=EOT, chunk=eot_chunk)
        return jnp.sum(net(key, x).astype(jnp.float32))

    x = jnp.asarray(np.random.RandomState(0).rand(batch, 64, 64, 3),
                    jnp.float32)
    cost = _step_cost(fwd, defense, x, jax.random.PRNGKey(0))
    if not cost:
        return {}
    m = 3 if remat else 2
    flops_per_iter = cost["flops"] * (1 + m * n_cotangents)
    per_unit = flops_per_iter / batch          # one unit = img*iter
    out = {"gflop_per_unit_analytic": round(per_unit / 1e9, 1),
           "tflops_analytic": round(rate * per_unit / 1e12, 2),
           "analytic_model": f"fwd_cost x (1 + {m}K), K={n_cotangents}"
                             f" ({'full-remat' if remat else 'no-remat'}"
                             f" backward)"}
    peak = _peak_tflops(dtype)
    if peak:
        out["pct_peak_bf16_analytic"] = round(
            100.0 * out["tflops_analytic"] / peak, 1)
    return out


def _forward_bench(defense, batch: int, size: int, iters: int = 5,
                   eot_chunk: int | None = None, mesh=None,
                   scan_steps: int = 8, dtype: str = "float32",
                   on_rate=None, cost_analysis: bool = True):
    """`mesh`: optional 1-D data mesh - the defense is replicated and the
    batch axis sharded over it (`batch` is then the GLOBAL batch and must
    divide by the mesh size); XLA runs the same program per chip with no
    cross-chip collectives (the eval is embarrassingly parallel over
    images, like the reference's DistributedSampler split).

    `scan_steps`: EoT-forward steps run INSIDE one jitted program
    (lax.scan over rotated keys).  The host<->device tunnel costs a large,
    VARIABLE fixed latency per fetch (0.2-0.9s observed 2026-08-18), which
    swamps small-batch steps and made the gender numbers irreproducible
    (0.24 vs 4.02 img/s minutes apart).  Production amortizes exactly the
    same way: the eval harness compiles a whole attack (hundreds of EoT
    forwards) into one program per fetch, so in-program throughput is the
    production-representative metric.  With scan_steps=8 the gender point
    reproduces within +-0.5% across trials.

    The steps are UNROLLED (a Python loop inside one jit), not lax.scan:
    XLA holds a while-loop body at ~2x peak HBM and rematerializes under
    that pressure, which cost 30-50% measured throughput at every flagship
    operating point (b32/40/44 all plateaued at ~29 img/s scanned vs 57 at
    the unscanned b96 peak).  An accumulator alone does NOT serialize the
    unrolled forwards (the scheduler interleaves them and still OOMs), so
    each step's input carries a data dependency on the previous step's
    scalar (x + acc*1e-38: numerically subnormal-zero, structurally
    unremovable) — peak HBM stays at the single-forward profile."""
    from gen_adversarial_tpu.defenses.eot import eot_wrap

    # A/B knob: GAT_SHARED_ENCODE=0 forces the naive per-draw recompute even
    # when the defense supports encode sharing (eps == 0 configs)
    shared = os.environ.get("GAT_SHARED_ENCODE", "1") != "0"

    @jax.jit
    def step(defense, x, key):
        net = eot_wrap(defense, eot_steps=EOT, chunk=eot_chunk,
                       shared_encode=shared)
        keys = jax.random.split(key, scan_steps)
        acc = jnp.float32(0.0)
        for i in range(scan_steps):
            xi = x + (acc * jnp.float32(1e-38)).astype(x.dtype)
            acc = acc + jnp.mean(net(keys[i], xi).astype(jnp.float32))
        return acc

    x = jnp.asarray(np.random.RandomState(0).rand(batch, size, size, 3), jnp.float32)
    if mesh is not None:
        from gen_adversarial_tpu.core.mesh import batch_sharding, replicated
        assert batch % mesh.size == 0, (batch, mesh.size)
        defense = jax.device_put(defense, replicated(mesh))
        x = jax.device_put(x, batch_sharding(mesh))
    _tlog(f"inputs ready; compiling (batch {batch}, chunk {eot_chunk})")
    float(step(defense, x, jax.random.PRNGKey(0)))  # compile + one forced run
    _tlog("compile + first forced run done")
    rate = _timed(step, (defense, x), iters, batch * scan_steps)
    if on_rate is not None:
        on_rate(rate)  # let the caller print a provisional line: the cost
        # analysis below re-compiles outside jit's executable cache and can
        # eat minutes — a deadline kill there must not lose the rate
    if not cost_analysis or _deadline_left() < 90.0:
        # the roofline fields are diagnostics; a deadline kill inside the
        # cost-analysis recompile would downgrade a measured rate to the
        # supervisor's deadline_exceeded path — not worth it when tight
        _tlog(f"rate measured: {rate:.2f} img/s; skipping cost analysis "
              f"({_deadline_left():.0f}s budget left)")
        return rate, {}
    _tlog(f"rate measured: {rate:.2f} img/s; running cost analysis")
    cost = _step_cost(step, defense, x, jax.random.PRNGKey(0))
    _tlog("cost analysis done")
    # per-chip perf fields under a mesh (rate and cost are program-global)
    n = mesh.size if mesh is not None else 1
    return rate, _perf_fields(rate / n, cost, batch * scan_steps, dtype)


WARM_MARKER = "/root/repo/.jax_cache/WARM_MODES.json"
# env overrides that change the compiled program: any of them set means the
# committed cache entries may not cover this run, so the warm marker is void
# (ADVICE r4: keep this in sync with EVERY trace-time env knob the package
# reads — grep 'os.environ.get("GAT_' across gen_adversarial_tpu/)
_PROGRAM_ENVS = ("GAT_EPS", "GAT_TASK_BATCH", "GAT_TASK_CHUNK",
                 "GAT_SHARED_ENCODE", "GAT_APGD_REMAT", "GAT_COT_CHUNK",
                 "GAT_EOT_UNROLL", "GAT_SG2_PHASE_RGB",
                 "GAT_SG2_PHASE_MIN_RES", "GAT_SG2_PHASE_IN_UP",
                 "GAT_SG2_UP", "GAT_NVAE_BN_FOLD",
                 "GAT_NVAE_DW", "GAT_NVAE_PW", "GAT_DF_COT_CHUNK",
                 "GAT_STAGED_AA")


def program_fingerprint() -> str:
    """Hash of every source file that shapes the benched XLA programs, PLUS
    the jax/jaxlib/libtpu versions (ADVICE r4: XLA persistent-cache keys
    depend on the compiler version — a driver container with a different
    jaxlib would pass a source-only check yet miss every committed entry,
    reproducing the r03 cold-compile deadline failure).  The
    WARM_MODES.json marker stores it at prewarm time; a mismatch at bench
    time means the committed cache entries may be for different programs,
    so the worker falls back to cold-cache behavior (quick tier first).
    tools/prewarm_cache.py must re-run after any change to these files."""
    h = hashlib.sha256()
    root = Path(__file__).parent
    files = [root / "bench.py", root / "__graft_entry__.py"]
    files += sorted((root / "gen_adversarial_tpu").rglob("*.py"))
    for p in files:
        h.update(str(p.relative_to(root)).encode())
        h.update(p.read_bytes())
    import jax as _jax
    ver = [_jax.__version__]
    try:
        import jaxlib
        ver.append(jaxlib.__version__)
    except Exception:
        pass
    try:
        from jax._src.lib import version_str as _jaxlib_ver
        ver.append(str(_jaxlib_ver))
    except Exception:
        pass
    try:
        import libtpu
        ver.append(getattr(libtpu, "__version__", "?"))
    except Exception:
        pass
    h.update("|".join(ver).encode())
    return h.hexdigest()[:16]


def _cache_warm(mode: str) -> bool:
    """True when tools/prewarm_cache.py populated .jax_cache for `mode`'s
    exact programs (fingerprint match) and no program-shaping env override
    is active."""
    if any(os.environ.get(k) for k in _PROGRAM_ENVS):
        return False
    try:
        with open(WARM_MARKER) as f:
            marker = json.load(f)
        return (mode in marker.get("modes", [])
                and marker.get("fingerprint") == program_fingerprint())
    except Exception:
        return False


def bench_flagship(dtype: str):
    from __graft_entry__ import _flagship
    # GAT_EPS=0 measures the no_preprocessing/blur config variants (27/45
    # configs): deterministic preprocessing enables the shared-encode EoT
    # path (one encoder pass per image instead of 32, defenses/eot.py).
    # Default 2.0 = the ours_*_noise_ids configs (per-draw input noise).
    eps = float(os.environ.get("GAT_EPS", "2.0"))
    defense = _flagship(initial_noise_eps=eps)
    if dtype == "bfloat16":
        from gen_adversarial_tpu.core.precision import defense_astype
        defense = defense_astype(defense)
    # measured throughput peaks (tools/tune_bench.py sweeps): bf16 batch 96
    # unchunked (16->37.8, 32->40.9, 64->53.7, 96->60.4, 128->58.8 img/s;
    # the large dispatch amortizes the ~100ms/step host-tunnel gap) - f32
    # doubles the activation footprint, OOMs above batch 16 unchunked, and
    # peaks at batch 64 with the EoT vmap chunked to 8 (10.73 img/s).
    batch, chunk = (96, None) if dtype == "bfloat16" else (64, 8)
    batch = int(os.environ.get("GAT_TASK_BATCH", batch))
    chunk_env = os.environ.get("GAT_TASK_CHUNK")
    if chunk_env is not None:  # occupancy sweeps: batch 128/192 need the
        # EoT vmap chunked to bound peak activations (VERDICT r3 item 6)
        chunk = None if chunk_env in ("none", "0") else int(chunk_env)
    cfg = (f"ids flagship: NVAE c32/24-groups 64px + vgg11_bn/100, "
           f"batch {batch}" + (f", eot-chunk {chunk}" if chunk else "")
           + (f", eps {eps:g} (shared-encode EoT)" if eps == 0 else ""))

    if (MODE == "flagship_bf16" and dtype == "bfloat16"
            and np.isfinite(_deadline_left())  # supervisor runs only: the
            # quick tier exists to beat the driver deadline; standalone
            # sweeps (bench_queue items) must measure exactly one program
            and not _cache_warm("flagship_bf16")):
        # Cold-cache quick tier: a small program (batch 32, 4 unrolled EoT
        # forwards) whose compile fits well inside the budget prints a FRESH
        # headline line before the batch-96 compile starts.  If the full
        # tier then dies at the deadline, the driver's tail still carries a
        # fresh measured value instead of a stale one (the r02/r03 failure).
        # Known cost of the smaller operating point: ~41 img/s vs ~60 at
        # batch 96 (tools/tune_bench.py sweep) — honest, just not peak.
        _tlog("cache not warm for flagship_bf16: running quick tier first")
        q_rate, _ = _forward_bench(defense, batch=32, size=64, iters=2,
                                   scan_steps=4, dtype=dtype,
                                   cost_analysis=False)
        print(json.dumps(_finalize({
            "metric": "eot32_nvae_defense_images_per_sec_per_chip",
            "value": round(q_rate, 2), "unit": "img/s", "dtype": dtype,
            "config": "ids flagship quick tier (cold cache): batch 32, "
                      "4-step window", "tier": "quick"})), flush=True)
        if _deadline_left() < 60.0:
            _tlog("no budget left for the full tier; quick line stands")
            return {"metric": "eot32_nvae_defense_images_per_sec_per_chip",
                    "value": round(q_rate, 2), "unit": "img/s",
                    "dtype": dtype, "tier": "quick",
                    "config": "ids flagship quick tier (cold cache): "
                              "batch 32, 4-step window"}

    def provisional(rate):
        # fresh headline value on stdout the moment it exists — the cost
        # analysis after it can recompile for minutes, and the supervisor
        # deadline must never turn a measured rate into a stale line
        print(json.dumps(_finalize({
            "metric": "eot32_nvae_defense_images_per_sec_per_chip",
            "value": round(rate, 2), "unit": "img/s", "dtype": dtype,
            "config": cfg, "provisional": True})), flush=True)

    rate, perf = _forward_bench(defense, batch=batch, size=64,
                                eot_chunk=chunk, dtype=dtype,
                                on_rate=provisional)
    return {
        "metric": "eot32_nvae_defense_images_per_sec_per_chip",
        "value": round(rate, 2),
        "unit": "img/s", "dtype": dtype,
        "config": cfg,
        **perf,
    }


def bench_flagship_dp(dtype: str):
    """Data-parallel flagship forward over EVERY attached device: per-chip
    batch at the single-chip peak, global batch = per-chip x n_devices.
    Converts the 'near-linear DP scaling' claim (BASELINE.md) into a
    measured curve whenever a multi-chip slice is attached; on one device
    it degenerates to the single-chip bench (reported as such)."""
    from __graft_entry__ import _flagship
    from gen_adversarial_tpu.core.mesh import make_mesh

    n = len(jax.devices())
    defense = _flagship()
    if dtype == "bfloat16":
        from gen_adversarial_tpu.core.precision import defense_astype
        defense = defense_astype(defense)
    per_chip, chunk = (96, None) if dtype == "bfloat16" else (64, 8)
    mesh = make_mesh()
    value, perf = _forward_bench(defense, batch=per_chip * n, size=64,
                                 eot_chunk=chunk, mesh=mesh, dtype=dtype)
    return {
        "metric": "eot32_nvae_defense_images_per_sec_dp_all_chips",
        "value": round(value, 2), "unit": "img/s", "dtype": dtype,
        "n_devices": n, "per_chip": round(value / n, 2),
        "config": f"ids flagship DP over {n} device(s), "
                  f"global batch {per_chip * n}",
        **perf,
    }


def _apgd_remat_policy(dtype: str):
    """Remat policy for the APGD-step bench (also the factory default for
    memory-bound attack evals).  bf16 keeps non-batch-dim dot outputs
    (weights-side matmul results) instead of recomputing everything:
    measured +10% on this step (tools/tune_remat.py sweep; the policy
    fails remote-compile under f32, which stays full remat).

    `GAT_APGD_REMAT` overrides for A/B sweeps (tools/bench_queue.py items
    like apgd_bf16@GAT_APGD_REMAT=dots_saveable); "full"/"none" = plain
    full remat."""
    policy = ("dots_with_no_batch_dims_saveable"
              if dtype == "bfloat16" else None)
    policy_env = os.environ.get("GAT_APGD_REMAT")
    if policy_env is not None:
        policy = None if policy_env in ("full", "none") else policy_env
    return policy


def bench_apgd(dtype: str):
    """Per-attack-iteration throughput: APGD-CE through the EoT-32 flagship
    defense (forward+backward per iteration - the real eval cost,
    SURVEY.md 3.1)."""
    from __graft_entry__ import _flagship
    from gen_adversarial_tpu.defenses.eot import eot_wrap
    from gen_adversarial_tpu.attacks.apgd import apgd_attack

    defense = _flagship()
    # remat: the attack backward holds EoT-32 x batch purifier activations
    # otherwise (OOMs on a 16G chip); this is also how the factory
    # configures memory-bound attack evals (eval/factory.py remat).
    policy = _apgd_remat_policy(dtype)
    defense = defense.replace(remat=True, remat_policy=policy)
    if dtype == "bfloat16":
        from gen_adversarial_tpu.core.precision import defense_astype
        defense = defense_astype(defense)

    # EoT chunk 8: one APGD iteration's backward holds a remat'd purifier
    # slice of batch x 8 samples (unchunked EoT-32 x batch-16 needs 27G on
    # a 16G chip; chunking bounds it).  Batches are the swept peaks per
    # (dtype, policy); f32 OOMs at 16.
    BATCH, N_ITER = 8, 16

    @jax.jit
    def step(defense, x, y, key):
        net = eot_wrap(defense, eot_steps=EOT, chunk=8)
        succ, bound, adv = apgd_attack(key, net, x, y, n_iter=N_ITER,
                                       rho=0.75, max_bound=4.0, ce_loss=True)
        return jnp.sum(bound) + jnp.sum(adv)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, 64, 64, 3), jnp.float32)
    y = jnp.asarray(rng.randint(0, 100, BATCH))
    float(step(defense, x, y, jax.random.PRNGKey(0)))

    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    outs = []
    ITERS = 3
    for _ in range(ITERS):
        key, sub = jax.random.split(key)
        outs.append(step(defense, x, y, sub))
    total = float(jnp.sum(jnp.stack(outs)))
    dt = (time.perf_counter() - t0) / ITERS
    assert np.isfinite(total)
    rate = BATCH * N_ITER / dt
    # measured cost analysis is impossible here (XLA counts a while/scan
    # body ONCE regardless of trip count: 49 GFLOP/img*iter reported vs
    # ~1.7 TFLOP actual) — attach the ANALYTIC roofline instead
    # (_analytic_attack_perf; scalar CE loss = 1 cotangent)
    return {
        "metric": "apgd16_eot32_nvae_defense_image_iters_per_sec_per_chip",
        "value": round(rate, 2),
        "unit": "img*iter/s", "dtype": dtype,
        "config": f"APGD-CE {N_ITER} iters, EoT-32, ids flagship, "
                  f"batch {BATCH}, remat {policy or 'full'}",
        **_analytic_attack_perf(defense, rate, BATCH, dtype,
                                n_cotangents=1, remat=True),
    }


def _flagship_attack_defense(dtype: str):
    from __graft_entry__ import _flagship
    defense = _flagship().replace(remat=True)
    if dtype == "bfloat16":
        from gen_adversarial_tpu.core.precision import defense_astype
        defense = defense_astype(defense)
    return defense


def bench_cw(dtype: str):
    """C&W per-optimizer-step throughput through the EoT-32 flagship
    defense.  The program is ONE tanh-space Adam step — the exact body the
    production budget loops 8 restarts x 1024 times (attacks/cw.py:66-91,
    reference load_defense.py:48-52) — host-looped with the optimizer state
    chained call-to-call.

    Root cause of the 2026-08-19 failures (2x relay crash after ~30 min,
    then RESOURCE_EXHAUSTED): the step closed over `defense`, inlining the
    2.7GB weight tree as XLA program constants (constant-folding blowup +
    on-chip duplication).  Weights must always be jit ARGUMENTS."""
    from gen_adversarial_tpu.defenses.eot import eot_wrap

    defense = _flagship_attack_defense(dtype)
    BATCH, HOST_ITERS = 8, 6
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, 64, 64, 3), jnp.float32)
    y = jnp.asarray(rng.randint(0, 100, BATCH))
    c = jnp.float32(1.0)

    # defense MUST be a jit argument, not a closure: closed-over weight
    # trees become program constants — the 2.7GB flagship tree as inline
    # constants OOMed the 16G chip and drove a ~30-min constant-folding
    # compile that crashed the remote-compile relay (observed 2026-08-19).
    # The chained optimizer state (w,m,v,t) is donated: each call consumes
    # the previous call's buffers, like the production attack loop carries
    # its state inside one program.
    from functools import partial as _partial

    @_partial(jax.jit, donate_argnums=(1, 2, 3, 4))
    def adam_step(defense, w, m, v, t, key):
        net = eot_wrap(defense, eot_steps=EOT, chunk=8)

        def loss_fn(w_):
            adv_ = 0.5 * (jnp.tanh(w_) + 1.0)
            l2 = jnp.sum((adv_ - x) ** 2, axis=(1, 2, 3))
            logits = net(key, adv_)
            one_hot = jax.nn.one_hot(y, logits.shape[1], dtype=logits.dtype)
            real = jnp.sum(one_hot * logits, 1)
            other = jnp.max((1 - one_hot) * logits - one_hot * 1e4, 1)
            return jnp.sum(l2 + c * jnp.maximum(real - other, 0.0))

        g = jax.grad(loss_fn)(w)
        gn = jnp.sqrt(jnp.sum(g.reshape(BATCH, -1) ** 2, 1)
                      ).reshape(BATCH, 1, 1, 1)
        g = g * jnp.minimum(1.0, 1.0 / jnp.maximum(gn, 1e-12))
        t = t + 1.0
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g ** 2
        mhat = m / (1 - 0.9 ** t)
        vhat = v / (1 - 0.999 ** t)
        w = w - 1e-2 * mhat / (jnp.sqrt(vhat) + 1e-8)
        return w, m, v, t

    w = jnp.arctanh(jnp.clip(x, 1e-6, 1 - 1e-6) * 2.0 - 1.0)
    m, v, t = jnp.zeros_like(w), jnp.zeros_like(w), jnp.float32(0)
    # reassign at warmup too: the donated input buffers are dead afterwards
    w, m, v, t = adam_step(defense, w, m, v, t, jax.random.PRNGKey(0))
    jax.block_until_ready(w)

    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for _ in range(HOST_ITERS):  # state chained: each call depends on the
        key, sub = jax.random.split(key)  # previous one, nothing cancellable
        w, m, v, t = adam_step(defense, w, m, v, t, sub)
    total = float(jnp.sum(w))
    dt = (time.perf_counter() - t0) / HOST_ITERS
    assert np.isfinite(total)
    return {
        "metric": "cw_eot32_nvae_defense_image_iters_per_sec_per_chip",
        "value": round(BATCH / dt, 2),
        "unit": "img*iter/s", "dtype": dtype,
        "config": f"C&W single tanh-Adam step (production loops it 8x1024), "
                  f"EoT-32, ids flagship, batch {BATCH}, host-looped "
                  f"{HOST_ITERS}",
        **_analytic_attack_perf(defense, BATCH / dt, BATCH, dtype,
                                n_cotangents=1, remat=True),
    }


def bench_deepfool(dtype: str):
    """DeepFool per-iteration throughput through the EoT-32 flagship defense
    (top-10 class jacobian per iteration - the heaviest per-iter attack;
    production budget <=128 iters, load_defense.py:48).

    DeepFool's while_loop trip count is data-dependent, so this bench
    labels each input with its own clean prediction (everything starts
    active) and divides by the REALIZED iteration count
    (deepfool_attack(..., return_iters=True)), not the max_iter budget."""
    from gen_adversarial_tpu.defenses.eot import eot_wrap
    from gen_adversarial_tpu.attacks.deepfool import deepfool_attack

    defense = _flagship_attack_defense(dtype)
    # the 10-class jacobian multiplies the backward's cotangent count ~10x
    # vs APGD's scalar loss; batch stays small.  defense is a jit ARGUMENT
    # everywhere (closure capture inlines the 2.7GB tree as program
    # constants — OOM + relay-killing compiles, see bench_cw note)
    BATCH, MAX_ITER = (4 if dtype == "bfloat16" else 2), 8
    BATCH = int(os.environ.get("GAT_TASK_BATCH", BATCH))
    # sweep knob: sequential cotangent blocks trade VJP live memory for
    # batch size (attacks/utils.py class_grads; VERDICT r3 item 5)
    COT = int(os.environ.get("GAT_COT_CHUNK", "0")) or None

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, 64, 64, 3), jnp.float32)

    @jax.jit
    def predict(defense, x, key):
        net = eot_wrap(defense, eot_steps=EOT, chunk=8)
        return jnp.argmax(net(key, x), axis=1)

    y = predict(defense, x, jax.random.PRNGKey(42))

    @jax.jit
    def step(defense, x, y, key):
        net = eot_wrap(defense, eot_steps=EOT, chunk=8)
        succ, bound, adv, iters = deepfool_attack(
            key, net, x, y, num_classes=10, max_iter=MAX_ITER,
            return_iters=True, cotangent_chunk=COT)
        return jnp.sum(jnp.where(jnp.isfinite(bound), bound, 0.0)) \
            + jnp.sum(adv), iters

    s, it = step(defense, x, y, jax.random.PRNGKey(0))
    float(s), int(it)  # compile + force

    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    outs, total_iters = [], 0
    ITERS = 3
    for _ in range(ITERS):
        key, sub = jax.random.split(key)
        s, it = step(defense, x, y, sub)
        outs.append(s)
        total_iters += int(it)
    total = float(jnp.sum(jnp.stack(outs)))
    dt = time.perf_counter() - t0
    assert np.isfinite(total) and total_iters > 0
    return {
        "metric": "deepfool_eot32_nvae_defense_image_iters_per_sec_per_chip",
        "value": round(BATCH * total_iters / dt, 2),
        "unit": "img*iter/s", "dtype": dtype,
        "config": f"DeepFool top-10 jacobian, EoT-32, ids flagship, "
                  f"batch {BATCH}, {total_iters} realized iters over "
                  f"{ITERS} runs (budget {MAX_ITER})",
        **_analytic_attack_perf(defense, BATCH * total_iters / dt, BATCH,
                                dtype, n_cotangents=10, remat=True),
    }


def bench_fab(dtype: str):
    """FAB per-iteration throughput through the EoT-32 flagship defense.
    FAB takes gradients of ALL C logits per iteration (C=100 cotangents on
    the ids task - the heaviest backward in the AutoAttack ensemble;
    production budget 128 iters, load_defense.py:48-52)."""
    from gen_adversarial_tpu.defenses.eot import eot_wrap
    from gen_adversarial_tpu.attacks.fab import fab_attack

    defense = _flagship_attack_defense(dtype)
    BATCH, N_ITER = (2 if dtype == "bfloat16" else 1), 4
    BATCH = int(os.environ.get("GAT_TASK_BATCH", BATCH))
    COT = int(os.environ.get("GAT_COT_CHUNK", "0")) or None

    @jax.jit
    def step(defense, x, y, key):
        # defense as a jit argument, never a closure — see bench_cw note
        net = eot_wrap(defense, eot_steps=EOT, chunk=8)
        succ, bound, adv = fab_attack(key, net, x, y, n_iter=N_ITER,
                                      cotangent_chunk=COT)
        return jnp.sum(jnp.where(jnp.isfinite(bound), bound, 0.0)) \
            + jnp.sum(adv)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, 64, 64, 3), jnp.float32)
    y = jnp.asarray(rng.randint(0, 100, BATCH))
    float(step(defense, x, y, jax.random.PRNGKey(0)))  # compile + force

    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    outs = []
    ITERS = 3
    for _ in range(ITERS):
        key, sub = jax.random.split(key)
        outs.append(step(defense, x, y, sub))
    total = float(jnp.sum(jnp.stack(outs)))
    dt = (time.perf_counter() - t0) / ITERS
    assert np.isfinite(total)
    rate = BATCH * N_ITER / dt
    return {
        "metric": "fab_eot32_nvae_defense_image_iters_per_sec_per_chip",
        "value": round(rate, 2),
        "unit": "img*iter/s", "dtype": dtype,
        "config": f"FAB 100-class jacobian, {N_ITER} iters, EoT-32, "
                  f"ids flagship, batch {BATCH}",
        **_analytic_attack_perf(defense, rate, BATCH, dtype,
                                n_cotangents=100, remat=True),
    }


def _synth_mlvgm_defense(task: str):
    """Real-scale gender (E4E/1024px + resnet50) and cars (Style-Transformer
    512px + resnext50) defenses with synthesized weights (throughput is
    value-independent; see __graft_entry__._synth_variables)."""
    from __graft_entry__ import _synth_variables
    from gen_adversarial_tpu.defenses.base import MLVGMDefense, make_classifier_apply
    from gen_adversarial_tpu.models.classifiers import make_classifier

    key = jax.random.PRNGKey(0)
    if task == "gender":
        from gen_adversarial_tpu.models.e4e.psp import PSP
        from gen_adversarial_tpu.defenses.purify import make_e4e_purify_split
        model = PSP(stylegan_size=1024)
        x0 = jnp.zeros((1, 256, 256, 3))
        variables = _synth_variables(
            lambda k, x: model.init(k, x, method=PSP.init_all), key, x0,
            cache_key="psp_1024")
        split, n_alphas, size, n_classes, clf = (
            make_e4e_purify_split(model), 18, 256, 2, "resnet")
    else:
        from gen_adversarial_tpu.models.style_transformer.model import StyleTransformer
        from gen_adversarial_tpu.defenses.purify import make_trans_purify_split
        model = StyleTransformer(output_size=512)
        x0 = jnp.zeros((1, 192, 256, 3))
        variables = _synth_variables(
            lambda k, x: model.init(k, x), key, x0, cache_key="trans_512")
        split, n_alphas, size, n_classes, clf = (
            make_trans_purify_split(model), 16, 128, 4, "resnext")

    clf_model = make_classifier(clf, n_classes)
    clf_vars = _synth_variables(
        lambda k, x: clf_model.init(k, x, train=False), key,
        jnp.zeros((1, size, size, 3)), cache_key=f"{clf}_{task}")
    alphas = jnp.linspace(0.04, 1.0, n_alphas) * (1.0 if task == "gender" else 0.7)
    from gen_adversarial_tpu.defenses.purify import _compose
    encode_apply, decode_apply = split
    # GAT_EPS=0 = the no_preprocessing/blur config variants (shared-encode
    # EoT path); default 4.0 = the ours_*_noise configs
    eps = float(os.environ.get("GAT_EPS", "4.0"))
    return MLVGMDefense(
        purify_variables=variables, classifier_variables=clf_vars,
        alphas=alphas, purify_apply=_compose(encode_apply, decode_apply),
        purify_encode_apply=encode_apply, purify_decode_apply=decode_apply,
        classifier_apply=make_classifier_apply(clf_model), image_size=size,
        initial_noise_eps=eps, normalize_before_purify=True)


def bench_task(task: str, dtype: str):
    defense = _synth_mlvgm_defense(task)
    if dtype == "bfloat16":
        from gen_adversarial_tpu.core.precision import defense_astype
        defense = defense_astype(defense)
    # high-res decodes: chunk the EoT vmap so peak activations stay on-chip
    # (1024^2 decodes for gender, 512^2 for cars).  Batch per (task, dtype)
    # is the measured peak from tools/tune_bench.py sweeps; bf16 halves
    # activation memory so it sustains larger batches before OOM (cars f32
    # fails at batch 8, bf16 peaks at 16 -> 13.09 img/s).
    # gender batch 1 chunk 16 (unrolled-step sweep 2026-08-18: c8 3.36,
    # c16 4.05 img/s; the 16-wide chunk fills the chip at 1024^2, larger
    # batches only add memory pressure).
    if task == "gender":
        batch, chunk = 1, 16
    else:
        batch, chunk = (16 if dtype == "bfloat16" else 4), 8
    # sweep overrides (tools/bench_queue.py mode@KEY=V items)
    batch = int(os.environ.get("GAT_TASK_BATCH", batch))
    chunk_env = os.environ.get("GAT_TASK_CHUNK")
    if chunk_env is not None:
        chunk = None if chunk_env in ("none", "0") else int(chunk_env)
    size = defense.image_size
    rate, perf = _forward_bench(defense, batch=batch, size=size,
                                iters=3, eot_chunk=chunk, dtype=dtype)
    return {
        "metric": f"eot32_{task}_defense_images_per_sec_per_chip",
        "value": round(rate, 2),
        "unit": "img/s", "dtype": dtype,
        **perf,
        "config": (f"gender: E4E+StyleGAN2-1024 + resnet50/2, batch {batch}, eot-chunk {chunk}"
                   if task == "gender"
                   else f"cars: StyleTransformer-512 + resnext50/4, batch {batch}, eot-chunk {chunk}")
        + (", eps 0 (shared-encode EoT)"
           if defense.initial_noise_eps == 0 else ""),
    }


BENCHES = {
    "flagship_bf16": lambda: bench_flagship("bfloat16"),
    "flagship_f32": lambda: bench_flagship("float32"),
    "flagship_bf16_dp": lambda: bench_flagship_dp("bfloat16"),
    "apgd_bf16": lambda: bench_apgd("bfloat16"),
    "apgd_f32": lambda: bench_apgd("float32"),
    "cw_bf16": lambda: bench_cw("bfloat16"),
    "deepfool_bf16": lambda: bench_deepfool("bfloat16"),
    "fab_bf16": lambda: bench_fab("bfloat16"),
    "gender_f32": lambda: bench_task("gender", "float32"),
    "gender_bf16": lambda: bench_task("gender", "bfloat16"),
    "cars_f32": lambda: bench_task("cars", "float32"),
    "cars_bf16": lambda: bench_task("cars", "bfloat16"),
}


LAST_GOOD = "/root/repo/BENCH_LAST_GOOD.json"


def _load_last_good():
    try:
        with open(LAST_GOOD) as f:
            return json.loads(f.read())
    except Exception:
        return None


def supervisor_main():
    """Un-losable wrapper (VERDICT r2 item 1: round 2's headline number was
    lost to a driver timeout, rc=124 with nothing printed).  Guarantees a
    parseable JSON perf line on stdout and exit 0 under ALL conditions:

    1. The most recent MEASURED result (BENCH_LAST_GOOD.json) is printed
       FIRST, tagged "stale": true — so even a SIGKILL mid-measurement
       leaves a parseable tail.
    2. The actual measurement runs in a CHILD process (a down TPU tunnel
       hangs backend init in uninterruptible C code — observed 2026-08-17 —
       so an in-process watchdog thread could never fire) with a hard
       deadline (GAT_BENCH_DEADLINE, default 560s: the driver's own budget
       is >=600s — it let the r03 dryrun run >10 min before killing — and
       r03's fully cold bench needed ~485s but died at the old 420s with
       one timing window left).  The worker gets the supervisor's start
       time (GAT_BENCH_T0) and trims optional work to fit the deadline.
    3. At the deadline the child is killed and the best line it produced so
       far (the worker streams one after every completed sub-bench) — or
       the stale line — is re-printed last, and we exit 0.
    A fresh line printed later supersedes the stale one (drivers read the
    tail)."""
    import subprocess
    import tempfile

    deadline = float(os.environ.get("GAT_BENCH_DEADLINE", "560"))
    stale = _load_last_good()
    if stale is not None:
        print(json.dumps(dict(stale, stale=True)), flush=True)

    out_path = tempfile.NamedTemporaryFile(
        suffix=".bench.out", delete=False).name
    timed_out = False
    with open(out_path, "wb") as out_f:
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            stdout=out_f,
            env=dict(os.environ, GAT_BENCH_WORKER="1",
                     GAT_BENCH_T0=repr(_WALL0)))
        try:
            proc.wait(timeout=deadline)
        except subprocess.TimeoutExpired:
            timed_out = True
            proc.kill()
            proc.wait()

    best = None
    try:
        with open(out_path, "rb") as f:
            for raw in f.read().decode(errors="replace").splitlines():
                raw = raw.strip()
                if not raw.startswith("{"):
                    continue
                try:
                    d = json.loads(raw)
                except json.JSONDecodeError:
                    continue
                if "metric" in d:
                    best = d  # last complete line wins (most coverage)
    finally:
        try:
            os.unlink(out_path)
        except OSError:
            pass

    if best is not None:
        if timed_out:
            best = dict(best, deadline_exceeded=True)
        print(json.dumps(best), flush=True)
    elif stale is not None:
        note = ("worker hit the deadline (backend hang or cold compile); "
                "value is the most recent measured result"
                if timed_out else "worker produced no fresh line")
        print(json.dumps(dict(stale, stale=True, note=note)), flush=True)
    else:
        print(json.dumps({
            "metric": "eot32_nvae_defense_images_per_sec_per_chip",
            "value": None, "unit": "img/s", "vs_baseline": None,
            "error": "no fresh measurement (worker "
                     + ("deadline" if timed_out else "failure")
                     + ") and no last-good cache"}), flush=True)
    raise SystemExit(0)


def _finalize(out: dict) -> dict:
    """Attach vs_baseline and persist the last-good cache."""
    if out.get("metric", "").startswith("eot32_nvae_defense"):
        out["vs_baseline"] = (round(out["value"] / BASELINE_A100_IMG_S, 2)
                              if out.get("value") is not None else None)
        if out.get("value") is not None:
            # the A100 anchor is a 300-700x CPU->A100 band (16-38 img/s,
            # BASELINE.md "vs_baseline derivation"); report the bound
            # spread next to the midpoint, not just the midpoint
            out["vs_baseline_band"] = [round(out["value"] / 38.0, 2),
                                       round(out["value"] / 16.0, 2)]
    else:
        out.setdefault("vs_baseline", None)  # anchor is headline-only
    # a quick-tier (batch-32) point must not clobber a banked FULL-tier
    # headline: in the quick tier's own target scenario (full tier dies at
    # the deadline) the ~60 img/s last-good would be overwritten by ~41
    # and later stale fallbacks would under-report peak (ADVICE r4)
    quick_over_full = False
    if out.get("tier") == "quick":
        try:
            with open(LAST_GOOD) as f:
                quick_over_full = json.load(f).get("tier") != "quick"
        except Exception:
            quick_over_full = False
    if (out.get("value") is not None
            and MODE in ("flagship_bf16", "all")  # the stale-fallback line
            # must always be the HEADLINE metric, never a side bench
            and not quick_over_full
            and not os.environ.get("GAT_BENCH_NO_LAST_GOOD")):
        try:
            with open(LAST_GOOD, "w") as f:
                json.dump(dict(out, measured_at=time.strftime("%Y-%m-%d %H:%M"),
                               provenance=f"bench.py GAT_BENCH={MODE}"), f)
        except Exception:
            pass
    return out


def worker_main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if MODE == "all":
        # headline first, then the rest; after EVERY completed sub-bench the
        # current merged line is re-printed so a deadline kill loses at most
        # one sub-bench, never the whole run
        results = {}
        head = None
        for name, fn in BENCHES.items():
            if name == "flagship_bf16_dp" and len(jax.devices()) < 2:
                continue  # degenerates to flagship_bf16 on one chip
            try:
                r = fn()
            except Exception as e:  # report partial coverage, never crash
                r = {"error": f"{type(e).__name__}: {e}"}
            if name == "flagship_bf16":
                head = r
            else:
                results[name] = r
            if head is not None and head.get("value") is not None:
                out = _finalize(dict(head, extra=dict(results)))
            else:
                out = {"metric": "eot32_nvae_defense_images_per_sec_per_chip",
                       "value": None, "unit": "img/s", "vs_baseline": None,
                       "error": (head or {}).get("error", "flagship pending"),
                       "extra": dict(results)}
            print(json.dumps(out), flush=True)
    else:
        print(json.dumps(_finalize(BENCHES[MODE]())), flush=True)


def main():
    if os.environ.get("GAT_BENCH_WORKER"):
        worker_main()
    else:
        supervisor_main()


if __name__ == "__main__":
    main()
