"""Close the int8-warp question AT CONVERGENCE (VERDICT r3 #7).

The default ``warp_kernel="pallas"`` samples through int8 MXU dots,
quantizing warp coordinates onto the uint8 pixel grid (exact for
unaugmented frames, <=1/255 otherwise -- ops/pallas/warp.py). The r3
bound stopped at 300 steps (1.6% loss gap); this runs the FULL
miniature plan twice with identical rngs -- int8 default vs the exact
bf16-split kernel -- and compares the end-of-plan held-out AbsRel and
trajectory errors at matched budget (756 steps through every stage at
64x128, the kernel's minimum width), so the default's effect on
trained accuracy is a measured number, not an extrapolation.
Measured r4 on-chip: int8 0.215 vs exact 0.1969 AbsRel (delta 0.0181),
trajectory rel err 0.0161 vs 0.0155 (delta 0.0006).

Run:  python benchmarks/check_int8_convergence_tpu.py
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

WORKDIR = Path("/tmp/xpt_int8_convergence")
T0 = time.time()
# r4 measured delta_abs_rel 0.0181 at 1x budget (756 steps) -- 90% of
# the 0.02 gate. VERDICT r4 #4: settle the default with a longer run
# (INT8_BUDGET_X=2..3) and/or augmentation on (INT8_AUGMENT=1 -- keeps
# warp coords off the uint8 grid, where the <=1/255 quantization bites).
BUDGET_X = int(os.environ.get("INT8_BUDGET_X", 1))
AUGMENT = os.environ.get("INT8_AUGMENT", "0") == "1"


def log(*args):
    print(f"[{time.time() - T0:6.1f}s]", *args, flush=True)


def run_arm(warp_kernel: str) -> dict:
    from xpt_mde_tpu.config import TrainStage
    from xpt_mde_tpu.data import SyntheticDataset
    from xpt_mde_tpu.training import mini_plan as mp
    from xpt_mde_tpu.training.trainer import train_by_plan

    workdir = WORKDIR / warp_kernel
    shutil.rmtree(workdir, ignore_errors=True)
    # every stage at FLOW_SIZE (64x128): the Pallas kernel requires
    # width % 128 == 0 (ops/pallas/warp.py supported()), so a 32x64
    # rigid stage would never exercise the int8 path at all -- the
    # whole comparison must train through the kernel
    lr, sw = 3e-4, mp.SCALE_WEIGHT_T1
    plan = [
        TrainStage(mp.RIGID_NETS, "synthetic", 12 * BUDGET_X, lr,
                   mp.RECIPE_RIGID, sw, True),
        TrainStage(mp.FLOW_NETS, "synthetic", 3 * BUDGET_X, lr * 0.3,
                   mp.RECIPE_FLOW, sw, True),
        TrainStage(mp.JOINT_NETS, "synthetic", 3 * BUDGET_X, lr * 0.1,
                   mp.RECIPE_JOINT, sw, True),
    ]
    overrides = {}
    if AUGMENT:
        overrides["augment_probs"] = {"CropAndResize": 0.3,
                                      "HorizontalFlip": 0.3,
                                      "ColorJitter": 0.3}
    cfg = mp.make_config(workdir, plan, batch=8, warp_kernel=warp_kernel,
                         **overrides)
    factory = mp.synthetic_factory(train_batches=42, val_batches=2)
    train_by_plan(cfg, factory)

    val = SyntheticDataset(batch_size=8, height=mp.FLOW_SIZE[0],
                           width=mp.FLOW_SIZE[1], num_batches=2,
                           varying_depth=True, vary_motion=True, seed=99)
    metrics = mp.evaluate_checkpoint(cfg, mp.RIGID_NETS, val)
    log(f"{warp_kernel:13s}:", {k: round(v, 4) for k, v in metrics.items()})
    return metrics


def main():
    enable_cache()
    int8 = run_arm("pallas")         # the int8 default
    exact = run_arm("pallas_exact")  # bf16 3-term split, ~2e-7 exact
    # end-of-plan accuracy deltas; the worlds/rngs/plans are identical
    d_abs = int8["abs_rel"] - exact["abs_rel"]
    d_trj = int8["trj_rel_err"] - exact["trj_rel_err"]
    # the int8 default must not cost meaningful end-of-plan accuracy.
    # Measured r4 regime: the budgeted full plan at 64x128 (the Pallas
    # kernel's minimum width) lands both arms at AbsRel ~0.20-0.22
    # (mid-convergence -- 64x128 from scratch needs ~4x the steps of
    # the r3 32x64 proof); the sanity gate pins that regime, the delta
    # gates carry the claim (measured: d_abs 0.0181, d_trj 0.0006)
    ok = (abs(d_abs) < 0.02 and abs(d_trj) < 0.03
          and int8["abs_rel"] < 0.35)
    record("int8_convergence", {
        "ok": bool(ok),
        "budget_x": BUDGET_X,
        "augment": AUGMENT,
        "int8_abs_rel": round(int8["abs_rel"], 4),
        "exact_abs_rel": round(exact["abs_rel"], 4),
        "delta_abs_rel": round(d_abs, 4),
        "int8_trj_rel": round(int8["trj_rel_err"], 4),
        "exact_trj_rel": round(exact["trj_rel_err"], 4),
        "delta_trj_rel": round(d_trj, 4),
    })
    assert ok, "int8 warp default costs converged accuracy"


if __name__ == "__main__":
    main()
