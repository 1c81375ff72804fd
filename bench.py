"""Benchmark: train-step throughput per stage on one chip.

Prints ONE JSON line. The headline metric stays the flagship rigid
stage (EfficientNetB5 depth + PoseNetImproved, KITTI low-res 128x512,
full jitted train step in bfloat16); a ``stages`` dict carries one
entry per additional stage so non-rigid regressions are visible
round-over-round (VERDICT r2 weak #5):

    {"metric": "train_images_per_sec_per_chip_effb5_rigid_128x512",
     "value": N, "unit": "images/sec", "vs_baseline": N,
     "stages": {"joint": {...}, "flow": {...}, "stereo": {...},
                "highres": {...}, "predict": {...}}}

Stage menu (mirrors the reference's training plans, SURVEY.md §6):
rigid | joint (adds PWC-Net flow + cmb losses, the TRAINING_PLAN_28
fine-tune rows) | flow (PWC-Net pre-training alone under LOSS_FLOW) |
stereo (the "MS" recipe behind the published Table-4 numbers) |
highres (256x1024 rigid at batch 8) | predict (inference forward).

Env knobs: BENCH_STAGE=<name> benches ONE stage and prints the legacy
single-stage line (probes/profiling use this); BENCH_STAGES=a,b,c
selects the matrix; BENCH_BATCH/HEIGHT/WIDTH override shapes;
BENCH_REPEATS windows per stage (best-of, because the shared tunnel
dips 10-30% under contention); BENCH_STAGE_MIN_S a flat override of
the per-stage minimum-budget floors; BENCH_DEADLINE_S wall-clock budget
(default 1200 s, 0 disables): when it trips, the stage loop stops and
whatever is already measured is printed (VERDICT r3 #1 -- the r3
six-stage matrix compiled ~6 programs through the slow remote compile
service and timed out the driver, leaving NO artifact). The persistent
XLA compilation cache is enabled, but measured r4 (CLAUDE.md): on the
axon backend the per-process remote compile/load roundtrip dominates
even on fully-cached reruns -- budget every fresh process as cold.

vs_baseline: the reference publishes NO throughput (BASELINE.md); the
denominator is a documented estimate of the TF2.4 single-GPU pipeline
for this stage (~8 img/s). Stage entries additionally carry
flops_per_step / tf_per_sec / mfu from XLA's cost analysis against the
v5e bf16 peak (197 TF/s) so "at the floor" is a tracked number
(VERDICT r3 weak #3).
"""

from __future__ import annotations

import json
import os as _os
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

TF2_GPU_IMAGES_PER_SEC_ESTIMATE = 8.0
V5E_PEAK_BF16_TFS = 197.0

BATCH = int(_os.environ.get("BENCH_BATCH", 8))
HEIGHT = int(_os.environ.get("BENCH_HEIGHT", 128))
WIDTH = int(_os.environ.get("BENCH_WIDTH", 512))
STAGE = _os.environ.get("BENCH_STAGE", "")
STAGES = _os.environ.get(
    "BENCH_STAGES", "rigid,joint,flow,stereo,highres,predict").split(",")
WARMUP_STEPS = 3
SHORT_STEPS = 3
MEASURE_STEPS = 20
REPEATS = int(_os.environ.get("BENCH_REPEATS", 3))
DEADLINE_S = float(_os.environ.get("BENCH_DEADLINE_S", 1200))
# don't even START a stage without this much budget left: each stage is
# a fresh XLA program and the axon remote compile (~500-900 s cold,
# uncancellable -- SIGALRM queues behind the blocking RPC) would blow
# way past the deadline before the alarm can fire. PER-STAGE minimums
# (VERDICT r4 #2): a flat 550 s could never admit a second stage after
# rigid's measured ~730 s of a 1200 s budget, yet predict is a far
# cheaper forward-only program -- it gets a realistic floor so the
# driver artifact accumulates at least rigid + predict every round.
_STAGE_MIN_DEFAULT = {"predict": 120, "flow": 550, "joint": 550,
                      "stereo": 550, "highres": 650}
_STAGE_MIN_FLAT = _os.environ.get("BENCH_STAGE_MIN_S")


def _stage_min_s(stage: str) -> float:
    if _STAGE_MIN_FLAT is not None:
        return float(_STAGE_MIN_FLAT)
    return _STAGE_MIN_DEFAULT.get(stage, 550.0)


T_START = time.time()


def _setup_compile_cache():
    """Persistent XLA compilation cache so only the first-ever run pays
    the remote compile service; verified to hit on the axon TPU backend.
    Keyed implicitly by backend+program, shared across rounds and with
    the benchmarks/check_*.py scripts."""
    from xpt_mde_tpu.utils.compile_cache import enable
    enable()


class _Deadline(Exception):
    pass


def _install_deadline_handlers(partial_emit):
    """SIGALRM bounds each stage at the remaining budget; SIGTERM (what
    ``timeout`` sends) emits the partial result line before dying, so
    even a driver-side kill leaves a parseable artifact tail."""
    def on_alarm(signum, frame):
        raise _Deadline()

    def on_term(signum, frame):
        partial_emit()
        _os._exit(1)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.signal(signal.SIGTERM, on_term)


def _time_left() -> float:
    if DEADLINE_S <= 0:
        return float("inf")
    return DEADLINE_S - (time.time() - T_START)


def build_stage(stage=STAGE or "rigid", batch=BATCH, height=HEIGHT,
                width=WIDTH):
    """Build (model, total_loss, features, step_kwargs) for a bench stage.

    ``step_kwargs`` go straight into ``make_train_step`` (frozen nets,
    flow regularizer). Shared by bench.py and benchmarks/profile_step.py
    so the profiled program is exactly the benchmarked one.
    """
    from xpt_mde_tpu import config as cfg
    from xpt_mde_tpu.losses import loss_factory
    from xpt_mde_tpu.models import ModelFactory

    rng = np.random.RandomState(0)
    features = {
        "image5d": jnp.asarray(
            rng.rand(batch, 5, height, width, 3).astype(np.float32) * 2 - 1),
        "intrinsic": jnp.asarray(np.tile(np.array(
            [[358.0, 0, width / 2], [0, 370.0, height / 2], [0, 0, 1]],
            np.float32), (batch, 1, 1))),
    }

    nets = {"depth": "EfficientNetB5", "camera": "PoseNetImproved"}
    recipe = {"L1": 0.5, "SSIM": 0.5, "smoothe": 20.0}
    step_kwargs = {}
    stereo = stage == "stereo"
    keys = ["image", "intrinsic"]
    if stage == "joint":
        nets["flow"] = "PWCNet"
        recipe = {"cmbL1": 5.0, "cmbSSIM": 0.5, "smoothe": 20.0}
        # joint stages freeze the flownet (model_main.py:88-90); the
        # step prunes its backward pass entirely
        step_kwargs["frozen_nets"] = ["flownet"]
    elif stage == "flow":
        # the flow pre-training stage: PWC-Net alone under flowL2 +
        # weight regularization (config-example.py:110-113)
        nets = {"flow": "PWCNet"}
        recipe = dict(cfg.LOSS_FLOW)
        recipe.pop("flowL2_R", None)  # mono bench: no _R views
        step_kwargs["regularize_net"] = "flownet"
    elif stereo:
        # the PUBLISHED MS recipe (config-example.py:84-97 via
        # mini_plan.RECIPE_STEREO): stereoL1/stereoSSIM at 0.5, not the
        # 0.01 T1 variant -- measured r4, 0.01 is ~50x too weak to pin
        # metric scale, so the benched program must carry the real
        # cross-synthesis SSIM cost (VERDICT r4 weak #3)
        recipe = {"L1": 0.5, "SSIM": 0.5, "smoothe": 20.0,
                  "L1_R": 0.5, "SSIM_R": 0.5, "smoothe_R": 20.0,
                  "stereoL1": 0.5, "stereoSSIM": 0.5, "stereoPose": 1.0}
        keys += ["image_R", "intrinsic_R", "stereo_T_LR"]
        features["image5d_R"] = jnp.asarray(
            rng.rand(batch, 5, height, width, 3).astype(np.float32) * 2 - 1)
        features["intrinsic_R"] = features["intrinsic"]
        t_lr = np.eye(4, dtype=np.float32)
        t_lr[0, 3] = -0.54  # KITTI-ish baseline
        features["stereo_T_LR"] = jnp.asarray(
            np.tile(t_lr, (batch, 1, 1)))

    factory = ModelFactory(keys, nets,
                           stereo=stereo, high_res=(height > 128),
                           compute_dtype="bfloat16")
    model = factory.get_model()
    total_loss = loss_factory(keys, recipe,
                              cfg.SCALE_WEIGHT_T1, stereo=stereo,
                              batch_size=batch)
    return model, total_loss, features, step_kwargs


def _cost_analysis(jitted, *args):
    """flops per call from XLA's cost analysis; None when the backend
    can't provide one (never fatal to the bench). On the axon TPU
    backend ``lower().cost_analysis()`` returns None but the COMPILED
    analysis works; call this only after the program is warm so the
    extra ``.compile()`` is a persistent-cache hit, not a recompile."""
    try:
        lowered = jitted.lower(*args)
        cost = lowered.cost_analysis()
        if not cost or "flops" not in cost:
            cost = lowered.compile().cost_analysis()
        flops = float(cost.get("flops", 0.0)) if cost else 0.0
        return flops if flops > 0 else None
    except Exception:
        return None


def _perf_fields(ips, batch, flops):
    """Derived per-stage throughput fields (VERDICT r3 weak #3)."""
    if not flops:
        return {}
    tfs = flops * ips / batch / 1e12
    return {"flops_per_step": flops,
            "tf_per_sec": round(tfs, 2),
            "mfu": round(tfs / V5E_PEAK_BF16_TFS, 4)}


def _bench_train(stage, batch=BATCH, height=HEIGHT, width=WIDTH,
                 repeats=REPEATS):
    from xpt_mde_tpu.training import (create_train_state, make_train_step,
                                      optimizer_factory)

    model, total_loss, features, step_kwargs = build_stage(
        stage, batch, height, width)
    tx = optimizer_factory("adam_constant", 1e-4,
                           frozen_nets=step_kwargs.get("frozen_nets", ()))
    state = create_train_state(model, features, tx)
    step = make_train_step(model, total_loss, **step_kwargs)

    # steps serialize through the donated train state; a host fetch of
    # the final loss is the only reliable sync on the axon remote
    # platform (block_until_ready can return before the result exists --
    # verified r2). Timing two run lengths and taking the slope cancels
    # the dispatch + tunnel round-trip constant.
    step_rng = jax.random.PRNGKey(0)

    def run_steps(state, rng, n):
        metrics = None
        for _ in range(n):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, features, sub)
        float(metrics["loss"])  # true host sync
        return state, rng

    state, step_rng = run_steps(state, step_rng, WARMUP_STEPS)
    # after warmup: the .compile() inside is a persistent-cache hit
    flops = _cost_analysis(step, state, features, jax.random.PRNGKey(0))
    # best of N windows: the least-contended one is the true device rate
    images_per_sec = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, step_rng = run_steps(state, step_rng, SHORT_STEPS)
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        state, step_rng = run_steps(state, step_rng,
                                    SHORT_STEPS + MEASURE_STEPS)
        t_long = time.perf_counter() - t0
        images_per_sec = max(
            images_per_sec,
            batch * MEASURE_STEPS / max(t_long - t_short, 1e-9))
    return images_per_sec, _perf_fields(images_per_sec, batch, flops)


def _bench_predict(batch=BATCH, height=HEIGHT, width=WIDTH,
                   repeats=REPEATS):
    from xpt_mde_tpu.training import create_train_state, optimizer_factory
    from xpt_mde_tpu.training.train_step import make_predict_step

    model, _, features, _ = build_stage("rigid", batch, height, width)
    tx = optimizer_factory("adam_constant", 1e-4)
    state = create_train_state(model, features, tx)
    predict = make_predict_step(model)

    def run_predict(n):
        preds = None
        for _ in range(n):
            preds = predict(state, features)
        float(jnp.sum(preds["depth_ms"][0]))  # true host sync

    run_predict(WARMUP_STEPS)
    flops = _cost_analysis(predict, state, features)
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        run_predict(SHORT_STEPS)
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        run_predict(SHORT_STEPS + MEASURE_STEPS)
        t_long = time.perf_counter() - t0
        best = max(best, batch * MEASURE_STEPS / max(t_long - t_short, 1e-9))
    return best, _perf_fields(best, batch, flops)


def _stage_entry(stage):
    """(metric_name, images_per_sec, extras) for one matrix stage."""
    if stage == "predict":
        ips, extras = _bench_predict()
        return (f"predict_images_per_sec_per_chip_effb5_{HEIGHT}x{WIDTH}",
                ips, extras)
    if stage == "highres":
        # the reference's high-res config at batch 8 (its GPU ceiling
        # was 4; v5e fits 8 and is 56% faster per image -- CLAUDE.md)
        ips, extras = _bench_train("rigid", batch=8, height=256, width=1024,
                                   repeats=max(REPEATS - 1, 1))
        return "train_images_per_sec_per_chip_effb5_rigid_256x1024", ips, \
            extras
    tag = "pwcnet" if stage == "flow" else "effb5"
    ips, extras = _bench_train(stage,
                               repeats=REPEATS if stage == "rigid"
                               else max(REPEATS - 1, 1))
    return (f"train_images_per_sec_per_chip_{tag}_{stage}_"
            f"{HEIGHT}x{WIDTH}", ips, extras)


# compile-cost order: the headline rigid stage first, then cheapest
# programs first so a deadline cut loses the most expensive extras only
_STAGE_ORDER = ["rigid", "predict", "flow", "joint", "stereo", "highres"]


def _driver_measured_stages():
    """Stage names that already carry a driver-verified value in any
    committed BENCH_r*.json -- successive driver rounds then prioritize
    the still-unmeasured extras (round-robin accumulation, VERDICT r4
    #2). Never fatal: bench must run outside the repo too."""
    import glob
    measured = set()
    here = _os.path.dirname(_os.path.abspath(__file__))
    for path in glob.glob(_os.path.join(here, "BENCH_r*.json")):
        try:
            with open(path) as f:
                artifact = json.load(f)
        except (OSError, ValueError):
            continue
        # the driver wraps bench's JSON line under "parsed"
        parsed = artifact.get("parsed") if "parsed" in artifact else artifact
        if not isinstance(parsed, dict):
            continue
        if "value" in parsed and "rigid" in parsed.get("metric", ""):
            measured.add("rigid")
        for name, entry in parsed.get("stages", {}).items():
            if isinstance(entry, dict) and "value" in entry:
                measured.add(name)
    return measured


def _result_json(headline, stages):
    if headline is None:
        return json.dumps({"error": "no stage completed", "stages": stages})
    out = {
        "metric": headline["metric"],
        "value": headline["value"],
        "unit": "images/sec",
        # the reference publishes no throughput; denominator is our
        # documented TF2.4-GPU estimate (see module docstring)
        "vs_baseline": round(
            headline["value"] / TF2_GPU_IMAGES_PER_SEC_ESTIMATE, 2),
        "baseline_is_estimate": True,
    }
    out.update({k: headline[k] for k in
                ("flops_per_step", "tf_per_sec", "mfu") if k in headline})
    out["stages"] = stages
    return json.dumps(out)


def main():
    _setup_compile_cache()
    if STAGE:
        # legacy single-stage mode (probes, BENCH_STAGE=... runs)
        metric, ips, extras = _stage_entry(STAGE)
        print(json.dumps({
            "metric": metric, "value": round(ips, 2), "unit": "images/sec",
            "vs_baseline": round(ips / TF2_GPU_IMAGES_PER_SEC_ESTIMATE, 2),
            "baseline_is_estimate": True, **extras,
        }))
        return

    selected = [s.strip() for s in STAGES if s.strip()]
    ordered = ([s for s in _STAGE_ORDER if s in selected]
               + [s for s in selected if s not in _STAGE_ORDER])
    # keep the headline first; among the extras, never-driver-measured
    # stages go before already-measured ones (stable within each group)
    if len(ordered) > 1:
        measured = _driver_measured_stages()
        ordered = ordered[:1] + sorted(
            ordered[1:], key=lambda s: (s in measured, ordered.index(s)))
    stages = {}
    state = {"headline": None}

    def emit_partial():
        # headline falls back to the first successful stage when the
        # preferred one failed or was not selected (ADVICE r3)
        headline, shown = state["headline"], dict(stages)
        if headline is None:
            for name, entry in stages.items():
                if "value" in entry:
                    headline = entry
                    shown.pop(name)
                    break
        print(_result_json(headline, shown), flush=True)

    _install_deadline_handlers(emit_partial)
    headline_stage = "rigid" if "rigid" in ordered else ordered[0]
    for stage in ordered:
        left = _time_left()
        # the headline stage always gets a shot (its provisional emit is
        # the artifact's reason to exist); extras need a realistic budget
        min_budget = 1 if stage == headline_stage else _stage_min_s(stage)
        if left < min_budget:
            stages[stage] = {"skipped": "deadline"}
            continue
        if left != float("inf"):
            signal.alarm(max(int(left), 1))
        t0 = time.time()
        print(f"[bench] stage {stage} starting "
              f"(t={time.time() - T_START:.0f}s, left={left:.0f}s)",
              file=sys.stderr, flush=True)
        try:
            metric, ips, extras = _stage_entry(stage)
            entry = {"metric": metric, "value": round(ips, 2),
                     "unit": "images/sec", **extras,
                     "secs": round(time.time() - t0, 1)}
        except _Deadline:
            stages[stage] = {"skipped": "deadline"}
            continue
        except Exception as exc:  # a broken stage must not hide the rest
            entry = {"error": f"{type(exc).__name__}: {exc}"[:300]}
        finally:
            signal.alarm(0)
        print(f"[bench] stage {stage} done: {entry}",
              file=sys.stderr, flush=True)
        if stage == headline_stage and "error" not in entry:
            state["headline"] = entry
            # provisional emit: measured r4, the axon remote compile
            # service ignores the persistent cache and blocks signals,
            # so a driver SIGKILL mid-stage would otherwise leave no
            # parseable tail; the final emit repeats the same format
            # with the full stages dict (last JSON line wins)
            emit_partial()
        if stage != headline_stage or "error" in entry:
            stages[stage] = entry
    emit_partial()
    if not (state["headline"] or any("value" in e for e in stages.values())):
        raise SystemExit(f"no stage completed (headline '{headline_stage}')")


if __name__ == "__main__":
    main()
