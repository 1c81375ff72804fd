"""On-chip probe: which (recipe, activation, lr) learn on the synthetic world?

    ACT=Exponential python benchmarks/probe_synthetic_learning.py l1ssim 3e-4 2000 [H W B]

recipes: l1ssim | md2 | stereoonly | ms (mono+stereo).

Measured findings (v5e, r3) -- the evidence behind training/mini_plan.py:
- l1ssim + Exponential + lr 3e-4 @32x64 b8: AbsRel 0.533 -> 0.19 at 250
  steps -> 0.009 at 2000; trj_rel 1.07 -> 0.004. THE working recipe.
- Same with the default InverseSigmoid: rails to its saturated extremes
  (0.99/100 m rows) and never recovers -- out-of-view warps give black
  pixels with ZERO depth gradient, so the rails are absorbing. (The
  activation inits at ~2 m vs the scene's 5..20 m.)
- Constant lr 3e-4 blows up around ~10k steps (depth jumps to the 148 m
  rail): per-stage lr decay is load-bearing.
- ms (fixed 1 m stereo baseline) from a bad init is an absorbing trap:
  depth rails low -> ALL stereo warps leave the frame -> zero gradient.
- batch 4 learns like batch 8 but with a worse-before-better transient
  (AbsRel 0.68 at ~190 steps) and a later knee (~0.06 at 560 steps).
"""
import os, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
t0=time.time()
def log(*a): print(f"[{time.time()-t0:6.1f}s]", *a, flush=True)

from xpt_mde_tpu import config as cfg
from xpt_mde_tpu.data import SyntheticDataset
from xpt_mde_tpu.losses import loss_factory
from xpt_mde_tpu.models import ModelFactory
from xpt_mde_tpu.training import (create_train_state, make_train_step,
                                  optimizer_factory)
from xpt_mde_tpu.training.train_step import make_predict_step
from xpt_mde_tpu.evaluate.evaluate_main import (predict_dataset,
                                                evaluate_depth_results,
                                                evaluate_pose_results)

RECIPE = sys.argv[1]; LR = float(sys.argv[2]); STEPS = int(sys.argv[3])
H = int(sys.argv[4]) if len(sys.argv) > 4 else 64
W = int(sys.argv[5]) if len(sys.argv) > 5 else 128
B = int(sys.argv[6]) if len(sys.argv) > 6 else 8
stereo = RECIPE in ("stereoonly", "ms")
recipes = {
    "l1ssim": {"L1": 0.5, "SSIM": 0.5, "smoothe": 0.5},
    "md2": {"md2L1": 0.5, "md2SSIM": 0.5, "smoothe": 0.5},
    "stereoonly": {"stereoL1": 1.0, "stereoSSIM": 0.5, "smoothe": 0.5},
    "ms": {"L1": 0.5, "SSIM": 0.5, "smoothe": 0.5,
           "L1_R": 0.5, "SSIM_R": 0.5, "smoothe_R": 0.5,
           "stereoL1": 0.5, "stereoSSIM": 0.5, "stereoPose": 1.0},
}
mk = dict(height=H, width=W, varying_depth=True, vary_motion=True,
          stereo=stereo, baseline_m=1.0)
train = SyntheticDataset(batch_size=B, num_batches=6, seed=0, **mk)
val = SyntheticDataset(batch_size=B, num_batches=2, seed=99, **mk)
log("rendering...")
batches = [ {k: jnp.asarray(v) for k, v in b.items()} for b in train ]
nets = {"depth": "DepthNetBasic", "camera": "PoseNetBasic"}
ACT = os.environ.get("ACT", "InverseSigmoid")
model = ModelFactory(train.config_keys(), nets, ACT, stereo=stereo,
                     compute_dtype="float32").get_model()
loss = loss_factory(train.config_keys(), recipes[RECIPE],
                    cfg.SCALE_WEIGHT_T1, stereo=stereo, batch_size=B)
tx = optimizer_factory("adam_constant", LR)
state = create_train_state(model, batches[0], tx)
step = make_train_step(model, loss)
predict = make_predict_step(model)

def metrics(state):
    res = predict_dataset(model, state, val, predict)
    d = evaluate_depth_results(res).mean(axis=0)
    out = {"abs_rel": round(float(d[0]),4), "a1": round(float(d[4]),3)}
    if "pose" in res:
        p = evaluate_pose_results(res).mean(axis=0)
        out["trj_rel"] = round(float(p[1]),4)
        out["trj_abs"] = round(float(p[0]),4)
    pr = np.asarray(predict(state, batches[0])["depth_ms"][0][0,:,:,0]).mean(1)
    out["rows"] = [round(float(pr[r]),1) for r in (H//4, H//2, 3*H//4)]
    return out

log(f"{RECIPE} act={ACT} lr={LR} steps={STEPS} init:", metrics(state))
rng = jax.random.PRNGKey(0)
for i in range(STEPS):
    sub = jax.random.fold_in(rng, i)
    state, m = step(state, batches[i % len(batches)], sub)
    if (i+1) % max(STEPS//8, 1) == 0:
        log(f"step{i+1} loss={float(m['loss']):.4f}", metrics(state))
