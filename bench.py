"""Benchmark: physics-informed diffusion train throughput on Darcy 64x64.

Measures the full training step of the flagship study — UNet(dim=32)
forward, FD Darcy residual, data + residual log-likelihood loss, backward
through everything, Adam + grad clip, EMA — at the reference's batch size 64
(`/root/reference/main.py:79-83`), plus the residual-evaluation throughput
and the mechanics study's train-step time (UNet(dim=128), FEM residual,
batch 6; `/root/reference/main.py:102-109`). The shipped training
configurations are timed: per-dispatch (one jitted step per host call) vs
chunked (the drivers' --chunk-steps lax.scan path, which amortises the
per-step RPC latency a tunneled/remote TPU pays), each optionally with the
big-tile attention config (PIDM_ATTN_TILE_CAP, docs/PERF_WALL.md); the
headline value is the best of them, with `headline_attn_tile_cap`
recording whether the non-default attention tiling won.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Robustness: the tunneled TPU backend dies for hours at a time and its init
can hang uninterruptibly, so the measurement runs in a child process under a
hard timeout with bounded retry/backoff. Every successful measurement is
cached to BENCH_CACHE.json; if all attempts fail, the most recent cached
result is emitted with ``"provenance": "cached"`` so a backend outage can
never zero a round's perf artifact.

Baseline derivation (the reference publishes no numbers, BASELINE.md):

1. MEASURED same-silicon anchor: scripts/measure_reference_baseline.py runs
   the torch reference train step VERBATIM (via tests/reference_shims) and
   this framework's identical step on the same host CPU —
   BASELINE_MEASURED.json: 0.264 vs 0.268 samples/s, ratio 1.02. The two
   frameworks do the same work at the same speed on equal silicon, so the
   comparison reduces to hardware + how well each maps onto it.
2. ANALYTIC FLOPs: XLA's compiled cost analysis counts the FLOPs of the
   full train step (fwd + physics + bwd + clip/Adam/EMA). The reference's
   step is the same architecture, batch, and loss, so its FLOPs/step match
   to within a few per cent.
3. A100 CEILING: the torch reference trains fp32 -> TF32 tensor cores,
   156 TFLOP/s peak dense. Granting it a GENEROUS 40% MFU (small-conv
   UNets at 64x64 under an eager python loop measure far lower) bounds the
   reference at ref_sps = batch / (flops_per_step / (156e12 * 0.40)).

vs_baseline = measured samples/s/chip / ref_sps — a FLOP-derived,
measurement-anchored denominator, conservative in the reference's favor.
The JSON also reports this chip's own MFU against the v5e bf16 peak.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys
import time

# Persistent XLA compile cache: the driver invokes bench.py WITHOUT the
# chain scripts' env, and a cold compile over the tunnel can eat an entire
# attempt budget (~8 min observed). Set it here, before jax initializes, so
# every entry point (driver, chains, manual) shares the warm cache.
import os  # noqa: E402

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.pidm_xla_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

A100_TF32_PEAK = 156e12  # dense TF32 tensor-core peak, FLOP/s
REF_GRANTED_MFU = 0.40  # generous model-FLOP utilization granted to the ref
# Realistic eager-torch MFU estimate for this workload: a dim=32 UNet at
# 64x64 is dominated by small convs (C in {32,64,128}) driven one kernel per
# op from a Python loop. Published eager-mode utilization for small conv
# nets on A100 sits in the 5-15% band; our own XLA-fused TPU path achieves
# 9.2% on the same model against a ~33% structural lane ceiling
# (docs/PERF_WALL.md), and eager torch forgoes that fusion entirely. 10% is
# the midpoint estimate used for the realistic bracket row.
REF_REALISTIC_MFU = 0.10
V5E_BF16_PEAK = 197e12  # TPU v5e bf16 peak, FLOP/s

CACHE_PATH = pathlib.Path(__file__).parent / "BENCH_CACHE.json"


# --------------------------------------------------------------------------
# measurement (runs in the child process, --_measure)
# --------------------------------------------------------------------------


def build_darcy(batch: int, pixels: int, compute_dtype, c_residual: float = 1e-3):
    import jax
    import jax.numpy as jnp

    from physicsinformeddiffusionmodels_tpu.diffusion import (
        LossWeights,
        create_schedule,
        pidm_loss,
        uniform_timesteps,
    )
    from physicsinformeddiffusionmodels_tpu.models.unet import UNet
    from physicsinformeddiffusionmodels_tpu.physics.darcy import DarcyResidual
    from physicsinformeddiffusionmodels_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    sched = create_schedule(100)
    physics = DarcyResidual(pixels_per_dim=pixels)
    model = UNet(dim=32, channels=2, dtype=compute_dtype)

    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, pixels, pixels, 2)),
        jnp.zeros((1,), jnp.int32),
    )
    tx = make_optimizer(1e-4)
    state = create_train_state(params, tx)

    def loss_fn(p, batch_x, key, step):
        t_key, n_key = jax.random.split(key)
        t = uniform_timesteps(t_key, batch_x.shape[0], 100)
        return pidm_loss(
            sched, batch_x, t, n_key,
            denoise_fn=lambda x, tt: model.apply(p, x, tt).astype(jnp.float32),
            physics_fn=physics,
            weights=LossWeights(c_data=1.0, c_residual=c_residual),
        )

    train_step = make_train_step(loss_fn, tx)
    residual_eval = jax.jit(lambda x: physics.residual(x))
    return state, train_step, residual_eval, loss_fn, tx


def measure_mechanics(steps: int, warmup: int) -> dict:
    """Train-step time of the conditional mechanics study at the showcase
    batch size 6 (reference study: `/root/reference/main.py:102-109`)."""
    import jax
    import jax.numpy as jnp

    from physicsinformeddiffusionmodels_tpu.config import RunConfig
    from physicsinformeddiffusionmodels_tpu.diffusion import create_schedule
    from physicsinformeddiffusionmodels_tpu.physics.mechanics import MechanicsResidual
    from physicsinformeddiffusionmodels_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )
    from train_mechanics import build_mech_model, build_mechanics_loss_fn

    batch_size = 6
    cfg = RunConfig(
        gov_eqs="mechanics", train_batch_size=batch_size,
        c_residual=1e-3, c_ineq=1e-3, lambda_opt=1e-6,
    )
    sched = create_schedule(cfg.diff_steps)
    mech = MechanicsResidual(pixels_per_dim=cfg.pixels_per_dim)
    model = build_mech_model(cfg)
    P = cfg.pixels_per_dim
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, P, P, cfg.model_channels)),
        jnp.zeros((1,), jnp.int32),
    )
    tx = make_optimizer(cfg.lr, cfg.grad_clip)
    state = create_train_state(params, tx)
    loss_fn = build_mechanics_loss_fn(model, sched, mech, cfg)
    train_step = make_train_step(loss_fn, tx)

    # synthetic batch: timing only depends on shapes (the FEM residual is a
    # fixed-work matrix-free matvec, no data-dependent iteration in the loss)
    batch = jax.random.normal(jax.random.key(1), (batch_size, P + 1, P + 1, 10))
    key = jax.random.key(0)
    for _ in range(warmup):
        state, aux = train_step(state, batch, key)
    jax.block_until_ready(aux.loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, aux = train_step(state, batch, key)
    jax.block_until_ready(aux.loss)
    dt = time.perf_counter() - t0
    n_chips = jax.device_count()
    return {
        "mech_train_step_ms": round(dt / steps * 1000, 2),
        "mech_train_samples_per_sec_per_chip": round(
            batch_size * steps / dt / n_chips, 2
        ),
        "mech_batch": batch_size,
    }


def _apply_baselines(result: dict, best_sps: float, flops_per_step: float,
                     batch: int) -> None:
    """(Re)derive every headline-dependent row from ``best_sps`` — called
    again if a later-measured configuration upgrades the headline."""
    sec_per_step = batch / best_sps
    ref_a100_sps = batch / (flops_per_step / (A100_TF32_PEAK * REF_GRANTED_MFU))
    result["vs_baseline"] = round(best_sps / ref_a100_sps, 3)
    result["flops_per_step"] = flops_per_step
    result["mfu_vs_v5e_bf16_peak"] = round(
        flops_per_step / sec_per_step / V5E_BF16_PEAK, 4
    )
    result["ref_a100_bound_samples_per_sec"] = round(ref_a100_sps, 2)
    result["baseline_provenance"] = (
        "XLA-counted flops/step / (A100 TF32 156e12 * 0.40 MFU granted); "
        "same-silicon torch-vs-jax anchor in BASELINE_MEASURED.json"
    )
    # Bracket row: the same FLOP count at a REALISTIC eager-torch MFU
    # (REF_REALISTIC_MFU above). The 0.40-granted row is a deliberately
    # unreachable ceiling; this row is the defensible point estimate.
    ref_real_sps = batch / (flops_per_step / (A100_TF32_PEAK * REF_REALISTIC_MFU))
    result["vs_baseline_realistic"] = round(best_sps / ref_real_sps, 3)
    result["ref_a100_realistic_samples_per_sec"] = round(ref_real_sps, 2)
    result["realistic_provenance"] = (
        "same FLOPs / (A100 TF32 156e12 * 0.10 eager-torch MFU estimate "
        "for small-conv UNets; see bench.py REF_REALISTIC_MFU note)"
    )


def _write_cache(result: dict) -> None:
    """Incremental loss-proofing: persist the partial result after every
    completed measurement phase. If a later phase (a cold compile over the
    tunnel) blows the attempt timeout, the orchestrator's cache fallback
    still emits TODAY's headline instead of a stale round's. CPU smoke runs
    (JAX_PLATFORMS=cpu --_measure) must never clobber the on-chip cache."""
    if "cpu" in str(result.get("device", "")).lower():
        return
    try:
        CACHE_PATH.write_text(json.dumps(result, indent=1))
    except OSError:  # pragma: no cover - defensive
        pass


def run_measurement(args) -> dict:
    from physicsinformeddiffusionmodels_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    n_chips = jax.device_count()
    compute_dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None

    state, train_step, residual_eval, loss_fn, tx = build_darcy(
        args.batch, args.pixels, compute_dtype
    )

    key = jax.random.key(0)
    x = jax.random.normal(jax.random.key(1), (args.batch, args.pixels, args.pixels, 2))

    # XLA-counted FLOPs of the full train step (for the A100 bound + MFU)
    flops_per_step = None
    try:
        cost = train_step.lower(state, x, key).compile().cost_analysis()
        flops_per_step = float(cost["flops"])
    except Exception:
        pass

    # warmup (compile). One base key: the per-step key derives inside the
    # jitted step from state.step (no per-step split dispatch).
    for i in range(args.warmup):
        state, aux = train_step(state, x, key)
    jax.block_until_ready(aux.loss)

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, aux = train_step(state, x, key)
    jax.block_until_ready(aux.loss)
    dt = time.perf_counter() - t0
    train_sps = args.batch * args.steps / dt / n_chips

    # chunked-dispatch path (the drivers' production loop, --chunk-steps):
    # `chunk` optimizer steps per host->device call via lax.scan, which
    # removes the per-step RPC overhead a tunneled/remote TPU pays
    train_sps_chunked = None
    try:
        from physicsinformeddiffusionmodels_tpu.training import (
            make_chunked_resident_step,
        )

        chunk = args.chunk_steps
        data = jax.random.normal(
            jax.random.key(2), (4 * args.batch, args.pixels, args.pixels, 2)
        )
        cstate, *_ = build_darcy(args.batch, args.pixels, compute_dtype)
        chunked = make_chunked_resident_step(loss_fn, tx, args.batch, chunk)
        # comparable sampling to the per-step path: >=2 warmup dispatches
        # and enough timed dispatches to cover >= args.steps optimizer steps
        for _ in range(2):
            cstate, caux = chunked(cstate, data, key)
        jax.block_until_ready(caux.loss)
        n_disp = max(2, -(-args.steps // chunk))
        t0 = time.perf_counter()
        for _ in range(n_disp):
            cstate, caux = chunked(cstate, data, key)
        jax.block_until_ready(caux.loss)
        train_sps_chunked = (
            args.batch * chunk * n_disp / (time.perf_counter() - t0) / n_chips
        )
    except Exception as e:  # never lose the per-step number to this
        print(f"chunked measurement failed: {e}", file=sys.stderr)

    # residual-evaluation throughput (the physics layer alone)
    r = residual_eval(x)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    reps = max(args.steps, 50)
    for _ in range(reps):
        r = residual_eval(x)
    jax.block_until_ready(r)
    res_eps = args.batch * reps / (time.perf_counter() - t0) / n_chips

    # headline = the best shipped training configuration measured so far;
    # upgraded in place if the big-tile attention config (below) wins
    sps_bigtile = sps_bigtile_chunked = None
    best_sps = max(train_sps, train_sps_chunked or 0.0)
    result = {
        "metric": "darcy64_train_samples_per_sec_per_chip",
        "value": round(best_sps, 2),
        "unit": "samples/s/chip",
        "train_sps_per_dispatch_path": round(train_sps, 2),
        "train_sps_chunked_path": (
            round(train_sps_chunked, 2) if train_sps_chunked else None
        ),
        "train_sps_attn_bigtile": (
            round(sps_bigtile, 2) if sps_bigtile else None
        ),
        "train_sps_attn_bigtile_chunked": (
            round(sps_bigtile_chunked, 2) if sps_bigtile_chunked else None
        ),
        "attn_bigtile_cap": args.attn_tile_cap_exp or None,
        "attn_tile_cap_default": __import__(
            "physicsinformeddiffusionmodels_tpu.ops.pallas_attention",
            fromlist=["get_attention_tile_cap"],
        ).get_attention_tile_cap(),
        "headline_attn_tile_cap": (
            args.attn_tile_cap_exp
            if best_sps in (sps_bigtile, sps_bigtile_chunked)
            else None  # None = default cap (ops/pallas_attention, 512)
        ),
        "chunk_steps": args.chunk_steps,
        "residual_evals_per_sec_per_chip": round(res_eps, 1),
        "batch": args.batch,
        "pixels": args.pixels,
        "compute_dtype": args.dtype,
        "device": str(dev),
        "n_chips": n_chips,
        "final_loss": float(jax.device_get(aux.loss)),
        "provenance": "measured",
        "captured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }

    # FLOP-derived A100 bound for the torch reference (see module docstring)
    if flops_per_step is not None:
        _apply_baselines(result, best_sps, flops_per_step, args.batch)
    else:
        # cost analysis unavailable on this backend: fall back to the CPU
        # same-silicon anchor scaled by a documented (generous) CPU->A100
        # factor of 2000x for this workload
        try:
            m = json.loads(CACHE_PATH.with_name("BASELINE_MEASURED.json").read_text())
            ref_a100_sps = m["torch_cpu_samples_per_sec"] * 2000.0
            result["vs_baseline"] = round(best_sps / ref_a100_sps, 3)
            result["ref_a100_bound_samples_per_sec"] = round(ref_a100_sps, 2)
            result["baseline_provenance"] = (
                "measured torch-reference CPU step (BASELINE_MEASURED.json) "
                "x 2000 CPU->A100 scaling"
            )
        except Exception:
            result["vs_baseline"] = None

    _write_cache(result)  # darcy headline is now loss-proof

    # mechanics study step time (flagship conditional model); never let a
    # failure here lose the Darcy number
    if not args.skip_mechanics:
        try:
            result.update(measure_mechanics(steps=max(10, args.steps // 2),
                                            warmup=min(3, args.warmup)))
        except Exception as e:  # pragma: no cover - defensive
            result["mech_error"] = f"{type(e).__name__}: {e}"
        _write_cache(result)

    # big-tile attention config (PIDM_ATTN_TILE_CAP: the finest 64x64 level
    # runs whole-row — 8x fewer, larger matmuls per kernel phase, see
    # ops/pallas_attention._choose_tile and docs/PERF_WALL.md). Shipped,
    # env-selectable config, measured last (two cold compiles): per-dispatch
    # first; if competitive, the production chunked path too. A win upgrades
    # the headline and its derived baseline rows.
    if args.attn_tile_cap_exp:
        try:
            from physicsinformeddiffusionmodels_tpu.ops import (
                pallas_attention as _pa,
            )

            if args.attn_tile_cap_exp != _pa.get_attention_tile_cap():
                _pa.set_attention_tile_cap(args.attn_tile_cap_exp)
                try:
                    estate, estep, *_ = build_darcy(
                        args.batch, args.pixels, compute_dtype
                    )
                    for _ in range(args.warmup):
                        estate, eaux = estep(estate, x, key)
                    jax.block_until_ready(eaux.loss)
                    t0 = time.perf_counter()
                    for _ in range(args.steps):
                        estate, eaux = estep(estate, x, key)
                    jax.block_until_ready(eaux.loss)
                    sps_bigtile = (
                        args.batch * args.steps
                        / (time.perf_counter() - t0) / n_chips
                    )
                    result["train_sps_attn_bigtile"] = round(sps_bigtile, 2)
                    _write_cache(result)
                    if sps_bigtile > 0.98 * train_sps:
                        from physicsinformeddiffusionmodels_tpu.training import (
                            make_chunked_resident_step,
                        )

                        data = jax.random.normal(
                            jax.random.key(2),
                            (4 * args.batch, args.pixels, args.pixels, 2),
                        )
                        cstate, _, _, eloss_fn, etx = build_darcy(
                            args.batch, args.pixels, compute_dtype
                        )
                        echunked = make_chunked_resident_step(
                            eloss_fn, etx, args.batch, args.chunk_steps
                        )
                        for _ in range(2):
                            cstate, caux = echunked(cstate, data, key)
                        jax.block_until_ready(caux.loss)
                        n_disp = max(2, -(-args.steps // args.chunk_steps))
                        t0 = time.perf_counter()
                        for _ in range(n_disp):
                            cstate, caux = echunked(cstate, data, key)
                        jax.block_until_ready(caux.loss)
                        sps_bigtile_chunked = (
                            args.batch * args.chunk_steps * n_disp
                            / (time.perf_counter() - t0) / n_chips
                        )
                        result["train_sps_attn_bigtile_chunked"] = round(
                            sps_bigtile_chunked, 2
                        )
                finally:
                    _pa.set_attention_tile_cap(None)
        except Exception as e:  # pragma: no cover - defensive
            print(f"bigtile measurement failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

        new_best = max(best_sps, sps_bigtile or 0.0, sps_bigtile_chunked or 0.0)
        if new_best > best_sps:
            best_sps = new_best
            result["value"] = round(best_sps, 2)
            result["headline_attn_tile_cap"] = args.attn_tile_cap_exp
            if flops_per_step is not None:
                _apply_baselines(result, best_sps, flops_per_step, args.batch)
        _write_cache(result)

    return result


# --------------------------------------------------------------------------
# orchestrator (default mode): retry/backoff + cached fallback
# --------------------------------------------------------------------------


def orchestrate(args, argv_tail) -> int:
    # The whole orchestration (attempts + backoff + cache fallback) must fit
    # inside the DRIVER's own timeout (1500s historically): round 4 lost its
    # perf artifact because one internal attempt consumed the full external
    # budget and the retry/cache path never ran. A deadline guard makes the
    # cache fallback unreachable only if the first attempt itself is killed
    # externally — which the reduced per-attempt timeout prevents.
    deadline = time.monotonic() + args.budget
    last_err = ""
    for attempt in range(args.attempts):
        if attempt:
            time.sleep(args.backoff)
        remaining = deadline - time.monotonic()
        if remaining < 60:
            last_err += "; budget exhausted before attempt %d" % (attempt + 1)
            break
        attempt_timeout = min(args.attempt_timeout, remaining)
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--_measure", *argv_tail],
                capture_output=True, text=True, timeout=attempt_timeout,
            )
        except subprocess.TimeoutExpired:
            last_err = f"attempt {attempt + 1}: timeout after {attempt_timeout:.0f}s"
            print(last_err, file=sys.stderr)
            continue
        line = next(
            (l for l in reversed(proc.stdout.strip().splitlines())
             if l.startswith("{")), None,
        )
        if proc.returncode == 0 and line:
            try:
                result = json.loads(line)
            except json.JSONDecodeError:
                result = None
            if result and "metric" in result:
                try:
                    CACHE_PATH.write_text(json.dumps(result, indent=1))
                except OSError:
                    pass
                print(json.dumps(result))
                return 0
        last_err = (
            f"attempt {attempt + 1}: rc={proc.returncode} "
            f"stderr_tail={proc.stderr.strip().splitlines()[-3:]}"
        )
        print(last_err, file=sys.stderr)

    # all attempts failed: fall back to the most recent successful result
    if CACHE_PATH.exists():
        result = json.loads(CACHE_PATH.read_text())
        result["provenance"] = "cached"
        # older cache entries predate the realistic-bracket row; derive it
        # from the cached FLOP count so the artifact always carries both
        if result.get("flops_per_step") and "vs_baseline_realistic" not in result:
            ref_real_sps = result["batch"] / (
                result["flops_per_step"] / (A100_TF32_PEAK * REF_REALISTIC_MFU)
            )
            result["vs_baseline_realistic"] = round(result["value"] / ref_real_sps, 3)
            result["ref_a100_realistic_samples_per_sec"] = round(ref_real_sps, 2)
            result["realistic_provenance"] = (
                "same FLOPs / (A100 TF32 156e12 * 0.10 eager-torch MFU "
                "estimate for small-conv UNets; see bench.py REF_REALISTIC_MFU)"
            )
        result["cache_note"] = (
            f"live measurement failed ({last_err}); value is the most recent "
            f"successful on-chip run, captured_at={result.get('captured_at')}"
        )
        print(json.dumps(result))
        return 0
    print(json.dumps({"metric": "darcy64_train_samples_per_sec_per_chip",
                      "value": None, "unit": "samples/s/chip",
                      "vs_baseline": None, "error": last_err}))
    return 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--pixels", type=int, default=64)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--chunk-steps", type=int, default=20,
                    help="steps per dispatch for the chunked-path measurement")
    ap.add_argument("--skip-mechanics", action="store_true")
    ap.add_argument("--attn-tile-cap-exp", type=int, default=4096,
                    help="measure an extra scenario with the attention "
                    "token-tile cap raised to this (0 disables)")
    ap.add_argument("--_measure", action="store_true",
                    help="internal: run the measurement in-process")
    ap.add_argument("--attempts", type=int, default=2,
                    help="orchestrator: measurement attempts before cache fallback")
    ap.add_argument("--attempt-timeout", type=int, default=650,
                    help="orchestrator: hard timeout per attempt (s); backend "
                    "init can hang uninterruptibly over the tunnel")
    ap.add_argument("--backoff", type=int, default=30,
                    help="orchestrator: sleep between attempts (s)")
    ap.add_argument("--budget", type=int, default=1350,
                    help="orchestrator: total wall budget (s) for attempts + "
                    "backoff, sized to fit inside the driver's 1500s timeout "
                    "with the cache fallback still reachable")
    args = ap.parse_args()

    if args._measure:
        print(json.dumps(run_measurement(args)))
        return 0

    # forward only the measurement-relevant args to the child
    tail = [
        "--batch", str(args.batch), "--pixels", str(args.pixels),
        "--steps", str(args.steps), "--warmup", str(args.warmup),
        "--dtype", args.dtype, "--chunk-steps", str(args.chunk_steps),
    ]
    if args.skip_mechanics:
        tail.append("--skip-mechanics")
    tail += ["--attn-tile-cap-exp", str(args.attn_tile_cap_exp)]
    return orchestrate(args, tail)


if __name__ == "__main__":
    sys.exit(main())
