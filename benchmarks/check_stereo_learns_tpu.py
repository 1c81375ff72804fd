"""On-chip proof the stereo "MS" recipe LEARNS (VERDICT r3 #3).

The published Table-4 numbers come from the monocular+stereo recipe
(/root/reference/config-example.py:218,223-248; losses.py:443-494). The
r3 learning proof was monocular-only; this check trains the stereo
terms on the stereo synthetic world and demonstrates the two properties
only stereo supervision can deliver:

  1. depth becomes METRIC -- unscaled AbsRel (no GT-median alignment)
     collapses, because the known-baseline stereo warp pins absolute
     scale (monocular photometric losses are scale-blind);
  2. the predicted L->R extrinsic twist converges to the GT baseline
     (StereoPoseLoss's target, losses.py:481-494).

Absorbing-trap note (CLAUDE.md "Learning facts"): a fixed LARGE
baseline from a bad init black-outs every stereo warp -> zero gradient
forever. The plan avoids it exactly like the reference's does: a
monocular co-adaptation stage first (pose starts ~0, depth and pose
walk into the right scale basin), then the stereo terms switch on; the
baseline (0.6 m on the 8..32 m world) keeps stereo disparities inside
the frame even at moderately wrong depth.

Run:  python benchmarks/check_stereo_learns_tpu.py
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

WORKDIR = Path("/tmp/xpt_stereo_learns")
T0 = time.time()
BASELINE_M = 0.6
MONO_EPOCHS = int(os.environ.get("STEREO_MONO_EPOCHS", 8))
STEREO_EPOCHS = int(os.environ.get("STEREO_STEREO_EPOCHS", 10))
DEPTH_M = 16.0  # scene 8..32 m: off the Exponential init's ~10 m scale,
# so monocular training (scale-blind) cannot land metric by luck


def log(*args):
    print(f"[{time.time() - T0:6.1f}s]", *args, flush=True)


def main():
    enable_cache()
    from xpt_mde_tpu.config import TrainStage
    from xpt_mde_tpu.data import SyntheticDataset
    from xpt_mde_tpu.training import mini_plan as mp
    from xpt_mde_tpu.training.trainer import train_by_plan

    shutil.rmtree(WORKDIR, ignore_errors=True)
    sw = mp.SCALE_WEIGHT_T1
    lr = 3e-4
    # stage 1: monocular co-adaptation (reference plan order -- rigid
    # pre-train before the stereo fine-tune rows); stage 2: the MS
    # recipe with L/R twins + stereo photometric + stereo pose terms
    plan = [
        TrainStage(mp.RIGID_NETS, "synthetic_small", MONO_EPOCHS, lr,
                   mp.RECIPE_RIGID, sw, True),
        TrainStage(mp.RIGID_NETS, "synthetic_small", STEREO_EPOCHS,
                   lr * 0.5, mp.RECIPE_STEREO, sw, True),
    ]
    factory = mp.synthetic_factory(train_batches=42, val_batches=2,
                                   stereo=True, baseline_m=BASELINE_M,
                                   depth_m=DEPTH_M)
    cfg = mp.make_config(WORKDIR, plan, batch=8, stereo=True)

    val = SyntheticDataset(batch_size=8, height=mp.RIGID_SIZE[0],
                           width=mp.RIGID_SIZE[1], num_batches=2,
                           varying_depth=True, vary_motion=True,
                           stereo=True, baseline_m=BASELINE_M,
                           depth_m=DEPTH_M, seed=99)

    def snapshot(restore):
        metrics = mp.evaluate_checkpoint(cfg, mp.RIGID_NETS, val,
                                         restore=restore,
                                         return_results=True)
        results = metrics.pop("_results")
        metrics["unscaled_abs_rel"] = mp.unscaled_abs_rel(results)
        metrics.update({f"lr_{k}": v for k, v in
                        mp.evaluate_stereo_extrinsic(
                            cfg, mp.RIGID_NETS, val,
                            restore=restore).items()})
        return metrics

    init = snapshot(restore=False)
    log("init        :", {k: round(v, 4) for k, v in init.items()})

    trajectory = {"init": init}
    for n_stages, name in ((1, "after_mono"), (2, "after_stereo")):
        cfg.training_plan = plan[:n_stages]
        train_by_plan(cfg, factory)
        trajectory[name] = snapshot(restore=True)
        log(f"{name:12s}:", {k: round(v, 4)
                             for k, v in trajectory[name].items()})

    mono, stereo = trajectory["after_mono"], trajectory["after_stereo"]
    ok = (stereo["abs_rel"] < 0.5 * init["abs_rel"]
          # metric scale: stereo must fix what mono cannot
          and stereo["unscaled_abs_rel"] < 0.5 * mono["unscaled_abs_rel"]
          and stereo["unscaled_abs_rel"] < 0.15
          # predicted L->R twist converges to the GT extrinsic
          and stereo["lr_trans_err"] < 0.25 * init["lr_trans_err"]
          and stereo["lr_trans_err"] < 0.05 * BASELINE_M * 3)
    record("stereo_learns", {
        "ok": bool(ok),
        **{f"{k}_abs_rel": round(v["abs_rel"], 4)
           for k, v in trajectory.items()},
        **{f"{k}_unscaled": round(v["unscaled_abs_rel"], 4)
           for k, v in trajectory.items()},
        **{f"{k}_lr_trans": round(v["lr_trans_err"], 5)
           for k, v in trajectory.items()},
    })
    assert ok, "stereo MS recipe did not demonstrate metric learning"


if __name__ == "__main__":
    main()
