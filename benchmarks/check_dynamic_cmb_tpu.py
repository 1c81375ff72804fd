"""On-chip proof the flow-guided joint objective EARNS ITS KEEP on
dynamic scenes (VERDICT r3 #2).

The reference's CombinedLoss exists to mask pixels violating the
rigid-scene assumption -- moving objects
(/root/reference/model/loss_and_metric/losses.py:235-279). This check
trains on the moving-object synthetic world (data/synthetic.py,
``moving_object=True``): a textured row-band at depth d_obj moving at
r x the camera's step, for which rigid photometric consistency is
satisfied by the WRONG depth d_obj/(1-r) (the classic moving-object
bias, pinned analytically in tests/test_synthetic_worlds.py).

Protocol: shared rigid pre-train, then two arms from the same weights:
  arm RIGID: keeps training the plain L1/SSIM rigid objective
  arm CMB:   flow pre-train -> joint fine-tune under the cmb recipe
Both arms see identical extra epochs. Held-out metrics split the Garg
crop into the moving band vs the static rest (mini_plan.band_abs_rel).

Expected: the rigid arm's band AbsRel converges toward the analytic
bias |1/(1-r) - 1| while the cmb arm, whose loss masks the band where
the flow branch explains it better, stays clear of it -- and overall
metrics do not regress.

Run:  python benchmarks/check_dynamic_cmb_tpu.py
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from xpt_mde_tpu.utils.compile_cache import enable as enable_cache

WORKDIR = Path("/tmp/xpt_dynamic_cmb")
T0 = time.time()
VEL_RATIO = 0.6


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

    shutil.rmtree(WORKDIR, ignore_errors=True)
    sw = mp.SCALE_WEIGHT_T1
    lr = 3e-4
    shared_epochs, extra_epochs = 10, 6
    world = dict(moving_object=True, object_vel_ratio=VEL_RATIO)
    factory = mp.synthetic_factory(train_batches=42, val_batches=2, **world)

    # every stage runs at FLOW_SIZE (the "synthetic" dataset name): the
    # PWC pyramid needs >= 64x128 and both arms must share resolution
    stage_rigid = TrainStage(mp.RIGID_NETS, "synthetic", shared_epochs, lr,
                             mp.RECIPE_RIGID, sw, True)
    stage_rigid_more = TrainStage(mp.RIGID_NETS, "synthetic",
                                  extra_epochs, lr * 0.1,
                                  mp.RECIPE_RIGID, sw, True)
    stage_flow = TrainStage(mp.FLOW_NETS, "synthetic", extra_epochs // 2,
                            lr * 0.3, mp.RECIPE_FLOW, sw, True)
    stage_joint = TrainStage(mp.JOINT_NETS, "synthetic",
                             extra_epochs - extra_epochs // 2, lr * 0.1,
                             mp.RECIPE_JOINT, sw, True)

    val = SyntheticDataset(batch_size=8, height=mp.FLOW_SIZE[0],
                           width=mp.FLOW_SIZE[1], num_batches=2,
                           varying_depth=True, vary_motion=True,
                           seed=99, **world)

    cfg = mp.make_config(WORKDIR / "shared", [stage_rigid], batch=8)
    init = evaluate(cfg, val, restore=False)
    log("init        :", {k: round(v, 4) for k, v in init.items()})

    train_by_plan(cfg, factory)
    shared = evaluate(cfg, val)
    log("shared rigid:", {k: round(v, 4) for k, v in shared.items()})

    # fork the two arms from the same pre-trained weights
    arms = {}
    for arm, plan in (("rigid", [stage_rigid, stage_rigid_more]),
                      ("cmb", [stage_rigid, stage_flow, stage_joint])):
        arm_dir = WORKDIR / arm
        shutil.copytree(WORKDIR / "shared", arm_dir)
        cfg_arm = mp.make_config(arm_dir, plan, batch=8)
        train_by_plan(cfg_arm, factory)
        arms[arm] = evaluate(cfg_arm, val)
        log(f"arm {arm:5s}   :", {k: round(v, 4)
                                  for k, v in arms[arm].items()})

    bias = abs(1.0 / (1.0 - VEL_RATIO) - 1.0)
    log(f"analytic band bias AbsRel if rigid fully converges: {bias:.2f}")
    ok = (arms["cmb"]["band"] < arms["rigid"]["band"] * 0.8
          and arms["cmb"]["abs_rel"] <= arms["rigid"]["abs_rel"] * 1.1
          and arms["cmb"]["abs_rel"] <= shared["abs_rel"] * 1.1)
    print(json.dumps({
        "ok": bool(ok),
        "init_band": round(init["band"], 4),
        "shared_band": round(shared["band"], 4),
        "rigid_band": round(arms["rigid"]["band"], 4),
        "cmb_band": round(arms["cmb"]["band"], 4),
        "rigid_abs_rel": round(arms["rigid"]["abs_rel"], 4),
        "cmb_abs_rel": round(arms["cmb"]["abs_rel"], 4),
        "rigid_rest": round(arms["rigid"]["rest"], 4),
        "cmb_rest": round(arms["cmb"]["rest"], 4),
    }))
    assert ok, "cmb did not beat the rigid-only arm on the moving band"


if __name__ == "__main__":
    main()
