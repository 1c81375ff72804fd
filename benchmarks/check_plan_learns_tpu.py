"""On-chip proof that the multi-stage plan LEARNS (VERDICT r2 next #1).

Runs the miniature TRAINING_PLAN_28 (training/mini_plan.py) through the
REAL plan driver (train_by_plan) stage by stage on GT-bearing synthetic
data and prints the held-out metric trajectory:

  rigid pre-train   -> held-out AbsRel and trajectory error collapse
  flow pre-train    -> flownet trains; depth/pose weights untouched
  joint fine-tune   -> flownet restored from the flow stage's checkpoint
                       and frozen (model_main.py:88-106), depth keeps
                       or improves its metrics under the cmb recipe

Run:  python benchmarks/check_plan_learns_tpu.py
(~25 min: 3 stage compiles via the remote compile service + ~750 steps)
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

WORKDIR = Path("/tmp/xpt_plan_learns")
T0 = time.time()


def log(*args):
    print(f"[{time.time() - T0:6.1f}s]", *args, flush=True)


def main():
    from xpt_mde_tpu.utils.compile_cache import enable as enable_cache
    enable_cache()
    from xpt_mde_tpu.data import SyntheticDataset
    from xpt_mde_tpu.training import mini_plan as mp
    from xpt_mde_tpu.training.trainer import train_by_plan

    shutil.rmtree(WORKDIR, ignore_errors=True)
    plan = mp.miniature_plan(rigid_epochs=12, flow_epochs=3, joint_epochs=3)
    cfg = mp.make_config(WORKDIR, plan, batch=8)
    factory = mp.synthetic_factory(train_batches=42, val_batches=2)

    val_rigid = SyntheticDataset(batch_size=8, height=mp.RIGID_SIZE[0],
                                 width=mp.RIGID_SIZE[1], num_batches=2,
                                 varying_depth=True, vary_motion=True,
                                 seed=99)
    val_joint = SyntheticDataset(batch_size=8, height=mp.FLOW_SIZE[0],
                                 width=mp.FLOW_SIZE[1], num_batches=2,
                                 varying_depth=True, vary_motion=True,
                                 seed=99)

    init = mp.evaluate_checkpoint(cfg, mp.RIGID_NETS, val_rigid,
                                  restore=False)
    log("init           :", {k: round(v, 4) for k, v in init.items()})
    epe_init = mp.evaluate_flow_epe(cfg, val_joint, restore=False)
    log(f"init flow EPE  : {epe_init:.3f} px (untrained PWC-Net)")

    trajectory = {"init": init}
    # walking the growing plan prefix exercises the history.csv stage
    # resume exactly like a restarted reference run does
    for n_stages, name in ((1, "after_rigid"), (2, "after_flow"),
                           (3, "after_joint")):
        cfg.training_plan = plan[:n_stages]
        train_by_plan(cfg, factory)
        val = val_joint if n_stages == 3 else val_rigid
        metrics = mp.evaluate_checkpoint(cfg, mp.RIGID_NETS, val)
        trajectory[name] = metrics
        log(f"{name:15s}:", {k: round(v, 4) for k, v in metrics.items()})
        if n_stages >= 2:
            # diagnostic only: photometric flow on this low-texture
            # world is ill-posed wrt TRUE flow -- the trained net's
            # flowL2 loss (0.34 -> 0.08 measured) beats even the
            # analytic GT flow's 0.18 by also fitting interp/border
            # artifacts, so EPE does not have to improve (and the
            # reference's photometric flow training never claimed EPE)
            epe = mp.evaluate_flow_epe(cfg, val_joint)
            trajectory[name]["flow_epe"] = epe
            log(f"{name:15s}: flow EPE {epe:.3f} px (init {epe_init:.3f},"
                " diagnostic)")

    # cross-stage handoff: the joint stage restored the flownet from the
    # flow stage's checkpoint and froze it -> byte-identical at plan end
    rigid_end = 12
    flow_end, joint_end = rigid_end + 3, rigid_end + 6
    flow_bytes = mp.net_checkpoint_bytes(cfg, "flownet", f"ep{flow_end:02d}")
    flow_final = mp.net_checkpoint_bytes(cfg, "flownet", f"ep{joint_end:02d}")
    depth_mid = mp.net_checkpoint_bytes(cfg, "depthnet", f"ep{rigid_end:02d}")
    depth_final = mp.net_checkpoint_bytes(cfg, "depthnet",
                                          f"ep{joint_end:02d}")
    assert flow_bytes == flow_final, "frozen flownet changed in joint stage"
    assert depth_mid != depth_final, "joint stage did not train depth"
    log("handoff ok: flownet frozen+restored byte-exact, depth fine-tuned")

    ok = (trajectory["after_rigid"]["abs_rel"] < 0.5 * init["abs_rel"]
          and trajectory["after_rigid"]["trj_rel_err"]
          < 0.5 * init["trj_rel_err"]
          and trajectory["after_joint"]["abs_rel"] < 0.5 * init["abs_rel"])
    from xpt_mde_tpu.utils.results import record
    record("plan_learns", {"ok": bool(ok),
                           **{f"{k}_abs_rel": round(v["abs_rel"], 4)
                              for k, v in trajectory.items()},
                           **{f"{k}_trj_rel": round(v.get("trj_rel_err", -1),
                                                    4)
                              for k, v in trajectory.items()}})
    assert ok, "metrics did not clearly improve"


if __name__ == "__main__":
    main()
