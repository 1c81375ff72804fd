"""On-chip proof the flow-guided joint objective EARNS ITS KEEP on
dynamic scenes (VERDICT r3 #2).

The reference's CombinedLoss exists to mask pixels violating the
rigid-scene assumption -- moving objects
(/root/reference/model/loss_and_metric/losses.py:235-279). This check
trains on the moving-object synthetic world (data/synthetic.py,
``moving_object=True``): a textured row-band at depth d_obj moving at
r x the camera's step, for which rigid photometric consistency is
satisfied by the WRONG depth d_obj/(1-r) (the classic moving-object
bias, pinned analytically in tests/test_synthetic_worlds.py, which also
pins the OBJECTIVE-level version of this check: the rigid L1 strictly
prefers the biased band depth, cmb does not).

Protocol (v3; the v1 from-scratch-on-dynamic run left both arms far
from convergence -- rest-AbsRel ~0.63 on both, band numbers noise --
and v2's default-step world put ~15 px between frames at 64x128,
degrading static depth identically under BOTH objectives; see the
STEP_M note below): first a shared rigid pre-train on the STATIC
world at 32x64
(the r3-proven recipe: AbsRel 0.533 -> ~0.03 at ~1000 steps), the way
real plans converge on mostly-static data before moving objects
matter. Then two arms fine-tune on the DYNAMIC world at 64x128 from
the same weights:

  arm RIGID: keeps training the plain L1/SSIM rigid objective -- the
             band's photometric gradient drags its depth from the true
             d_obj toward the bias d_obj/(1-r);
  arm CMB:   flow pre-train -> joint fine-tune under the cmb recipe --
             the loss masks band pixels the flow branch explains
             better, removing that incentive.

Both arms see identical dynamic-world epochs. Held-out metrics split
the Garg crop into the moving band vs the static rest
(mini_plan.band_abs_rel), all evaluated at 64x128 on the dynamic val
world.

Expected (v4 metrics -- scale attribution): the rigid arm's band/rest
relative-depth ratio RISES from ~1 toward the analytic 1/(1-r) = 2.5
(the trap materializes) while the cmb arm's stays near 1, without
losing static-rest accuracy or overall AbsRel. v3's gates read the
band/rest split under FULL-IMAGE median scaling and were inverted by
the v3 run itself (measured r5): the rigid arm drove the relative
ratio to the full 2.5 but the median anchored inside the band, so
"band" read 0.045 and the intact "rest" read 0.597 = |1/2.5 - 1|.
mini_plan.band_abs_rel now anchors the scaler on the static rows and
reports the scale-free ratio; the training protocol is unchanged.

v5 (the masking-dynamics fix, measured r5): in the v3 run BOTH arms
slid into the trap identically (band rel depth 3.55 vs 3.57, per-arm
diagnostics). Mechanism: the cmb mask ``static * (static < flow)`` is
ONE-SIDED -- band pixels that agree with the (partial) trap state have
LOW static error, stay in the loss, and are the only gradient on the
band-specific features; dissenting pixels are merely silent, never a
counterweight. The trap remains an attractor whenever the trap-state
static error undercuts the flow branch's band error -- and the 252-step
flownet's band L1 was 0.139 vs the trap state's ~0.11, so the trap sat
INSIDE the unmasked set (at the good init the band was 94% masked at
every scale; that only slows entry, it does not remove the
equilibrium). v5 therefore pre-trains the flownet to the r3-measured
photometric floor (~4000 steps -> flow L1 ~0.08, below the trap state)
so the trap is OUTSIDE the unmasked set, and keeps the joint stage's
depth budget matched 1:1 to the rigid arm's (12 epochs each).

Run:  python benchmarks/check_dynamic_cmb_tpu.py
Env:  CMB_SHARED_EPOCHS (static pre-train), CMB_EXTRA_EPOCHS (dynamic
      depth fine-tune per arm, matched), CMB_FLOW_EPOCHS (cmb arm flow
      pre-train; aux, not depth budget), CMB_EVAL_ONLY=1 (re-evaluate
      existing checkpoints under current metrics), CMB_REUSE=shared or
      shared,rigid (keep those completed stage dirs, retrain the rest)
"""

from __future__ import annotations

import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from xpt_mde_tpu.utils.compile_cache import enable as enable_cache
from xpt_mde_tpu.utils.results import record

WORKDIR = Path("/tmp/xpt_dynamic_cmb")
T0 = time.time()
VEL_RATIO = 0.6
# on-chip epochs are ~5-10 s; compiles dominate the run, so err long
SHARED_EPOCHS = int(os.environ.get("CMB_SHARED_EPOCHS", 30))
EXTRA_EPOCHS = int(os.environ.get("CMB_EXTRA_EPOCHS", 12))
# flow pre-train: ~4000 steps reaches the r3-measured photometric floor
# (~0.08 L1, below the trap-state static error -- see v5 note above)
FLOW_EPOCHS = int(os.environ.get("CMB_FLOW_EPOCHS", 95))
TRAIN_BATCHES = int(os.environ.get("CMB_TRAIN_BATCHES", 42))
# v3 (measured r4): pixel shift = fx*step/d and fx doubles at 64x128,
# so the world's default step 0.5 m puts up to ~15 px between frames --
# outside bilinear gradient reach -- and BOTH arms' fine-tune (rigid
# AND cmb, v2 run) degraded static-row depth 0.18 -> 0.60 identically;
# cmb's masking covers the band, not a globally broken photometric
# signal. step 0.25 m at 64x128 reproduces the r3-proven 32x64 pixel
# regime (~2 px mean), and the fine-tune lr drops to the adaptation
# rate the r3 joint stage was proven at.
STEP_M = float(os.environ.get("CMB_STEP_M", 0.25))
LR_FT = float(os.environ.get("CMB_LR_FT", 5e-5))
# v6: accelerating band (data/synthetic.py object_accel) -- at constant
# velocity the trap state closes the warp exactly (measured static L1
# ~0.012, below any achievable flow error), so prevention cannot be
# guaranteed by ANY mask criterion; with accel the trap keeps a high
# photometric floor the learned flow undercuts. 0 reproduces v5.
ACCEL = float(os.environ.get("CMB_OBJECT_ACCEL", 0.4))
PROTOCOL = "v6" if ACCEL else "v5"


def log(*args):
    print(f"[{time.time() - T0:6.1f}s]", *args, flush=True)


def evaluate(cfg, val_data, restore=True):
    from xpt_mde_tpu.training import mini_plan as mp

    metrics = mp.evaluate_checkpoint(cfg, mp.RIGID_NETS, val_data,
                                     restore=restore, return_results=True)
    results = metrics.pop("_results")
    r0, r1 = val_data.object_rows()
    metrics.update(mp.band_abs_rel(results, r0, r1))
    return metrics


def main():
    enable_cache()
    from xpt_mde_tpu.config import TrainStage
    from xpt_mde_tpu.data import SyntheticDataset
    from xpt_mde_tpu.training import mini_plan as mp
    from xpt_mde_tpu.training.trainer import train_by_plan

    eval_only = os.environ.get("CMB_EVAL_ONLY", "0") == "1"
    reuse = {d for d in os.environ.get("CMB_REUSE", "").split(",") if d}
    if not eval_only:
        if reuse:
            # completed stage dirs resume as done inside train_by_plan;
            # the rest retrain from a fresh fork
            for d in ("shared", "rigid", "cmb"):
                if d not in reuse:
                    shutil.rmtree(WORKDIR / d, ignore_errors=True)
        else:
            shutil.rmtree(WORKDIR, ignore_errors=True)
    sw = mp.SCALE_WEIGHT_T1
    lr = 3e-4
    lr_ft = LR_FT  # fine-tune rate on the dynamic world (see STEP_M note)
    world = dict(moving_object=True, object_vel_ratio=VEL_RATIO,
                 object_accel=ACCEL, step_m=STEP_M)
    static_factory = mp.synthetic_factory(train_batches=TRAIN_BATCHES,
                                          val_batches=2)
    dynamic_factory = mp.synthetic_factory(train_batches=TRAIN_BATCHES,
                                           val_batches=2, **world)

    # stage 0 (shared): the r3-proven static-world recipe at 32x64
    stage_shared = TrainStage(mp.RIGID_NETS, "synthetic_small",
                              SHARED_EPOCHS, lr, mp.RECIPE_RIGID, sw, True)
    # arm stages: dynamic world at 64x128 ("synthetic")
    stage_rigid_ft = TrainStage(mp.RIGID_NETS, "synthetic", EXTRA_EPOCHS,
                                lr_ft, mp.RECIPE_RIGID, sw, True)
    stage_flow = TrainStage(mp.FLOW_NETS, "synthetic", FLOW_EPOCHS,
                            1e-4, mp.RECIPE_FLOW, sw, True)
    # depth budget matched 1:1 with the rigid arm (flow is aux)
    stage_joint = TrainStage(mp.JOINT_NETS, "synthetic", EXTRA_EPOCHS,
                             lr_ft, mp.RECIPE_JOINT, sw, True)

    val = SyntheticDataset(batch_size=8, height=mp.FLOW_SIZE[0],
                           width=mp.FLOW_SIZE[1], num_batches=2,
                           varying_depth=True, vary_motion=True,
                           seed=99, **world)

    cfg = mp.make_config(WORKDIR / "shared", [stage_shared], batch=8)
    init = evaluate(cfg, val, restore=False)
    log("init        :", {k: round(v, 4) for k, v in init.items()})

    if not eval_only:
        train_by_plan(cfg, static_factory)
    shared = evaluate(cfg, val)
    log("shared rigid:", {k: round(v, 4) for k, v in shared.items()})

    # fork the two arms from the same pre-trained weights
    arms = {}
    for arm, plan in (("rigid", [stage_shared, stage_rigid_ft]),
                      ("cmb", [stage_shared, stage_flow, stage_joint])):
        arm_dir = WORKDIR / arm
        cfg_arm = mp.make_config(arm_dir, plan, batch=8)
        if not eval_only:
            if not arm_dir.exists():
                shutil.copytree(WORKDIR / "shared", arm_dir)
            train_by_plan(cfg_arm, dynamic_factory)  # stage 0 resumes done
        arms[arm] = evaluate(cfg_arm, val)
        log(f"arm {arm:5s}   :", {k: round(v, 4)
                                  for k, v in arms[arm].items()})

    trap_ratio = 1.0 / (1.0 - VEL_RATIO)  # 2.5 at r=0.6
    log(f"analytic band/rest ratio if rigid fully converges: "
        f"{trap_ratio:.2f}")
    rigid_dev = abs(arms["rigid"]["ratio"] - 1.0)
    cmb_dev = abs(arms["cmb"]["ratio"] - 1.0)
    ok = (
        # the trap materializes: rigid-only fine-tuning drives the
        # band's relative depth at least halfway to the analytic bias
        rigid_dev > 0.5 * (trap_ratio - 1.0)
        # ...and cmb refuses the trade
        and cmb_dev < 0.5 * rigid_dev
        # cmb keeps overall held-out AbsRel at least as good
        and arms["cmb"]["abs_rel"] <= arms["rigid"]["abs_rel"]
        # and the static rest stays in the shared stage's regime (the
        # v2 failure mode: a too-fast fine-tune poisons static depth
        # under BOTH objectives, drowning the band comparison)
        and arms["cmb"]["rest"] <= shared["rest"] * 1.3)
    record("dynamic_cmb", {
        "ok": bool(ok),
        "protocol": PROTOCOL,
        "object_accel": ACCEL,
        "flow_epochs": FLOW_EPOCHS,
        "analytic_trap_ratio": trap_ratio,
        "shared_ratio": round(shared["ratio"], 4),
        "rigid_ratio": round(arms["rigid"]["ratio"], 4),
        "cmb_ratio": round(arms["cmb"]["ratio"], 4),
        "shared_band": round(shared["band"], 4),
        "rigid_band": round(arms["rigid"]["band"], 4),
        "cmb_band": round(arms["cmb"]["band"], 4),
        "shared_rest": round(shared["rest"], 4),
        "rigid_rest": round(arms["rigid"]["rest"], 4),
        "cmb_rest": round(arms["cmb"]["rest"], 4),
        "shared_abs_rel": round(shared["abs_rel"], 4),
        "rigid_abs_rel": round(arms["rigid"]["abs_rel"], 4),
        "cmb_abs_rel": round(arms["cmb"]["abs_rel"], 4),
    })
    assert ok, "cmb did not beat the rigid-only arm on the moving band"


if __name__ == "__main__":
    main()
