"""Preemption-safe mid-epoch resume (Config.ckpt_every_steps).

The reference resumes at epoch granularity only (history.csv,
util_funcs.py:129-143) -- on preemptible TPU pods that loses up to a
full epoch of work. With ckpt_every_steps > 0 the trainer checkpoints
the full train state + running metric sums every N steps and a killed
run resumes at the last saved step BIT-EXACTLY: per-step rngs are
fold_in(epoch_key, step) chains and the loader order is a pure function
of (seed, epoch), so the resumed run replays the identical remainder.
"""

from pathlib import Path

import numpy as np
import pytest

from xpt_mde_tpu.config import SCALE_WEIGHT_T1, Config, TrainStage
from xpt_mde_tpu.data import SyntheticDataset
from xpt_mde_tpu.training.trainer import train_by_plan

NETS = {"depth": "DepthNetBasic", "camera": "PoseNetImproved"}
NUM_BATCHES = 3


class _Preempted(RuntimeError):
    pass


class _PreemptingLoader:
    """Wraps SyntheticDataset; dies after yielding ``die_after`` train
    batches (counted across epochs), simulating a pod preemption."""

    def __init__(self, ds, die_after: int):
        self.ds = ds
        self.remaining = die_after

    def config_keys(self):
        return self.ds.config_keys()

    def __len__(self):
        return len(self.ds)

    def example_batch(self):
        return next(iter(self.ds))  # side-effect free (no crash budget)

    def __iter__(self):
        for batch in self.ds:
            if self.remaining <= 0:
                raise _Preempted("simulated preemption")
            self.remaining -= 1
            yield batch


def _cfg(workdir, every: int) -> Config:
    return Config(stereo=False, per_replica_batch=2, compute_dtype="float32",
                  augment_probs={}, datapath=str(workdir), ckpt_name="pre",
                  ckpt_every_steps=every,
                  training_plan=[TrainStage(NETS, "synthetic", 2, 1e-4,
                                            {"L1": 1.0}, SCALE_WEIGHT_T1)])


def _factory(die_after=None):
    state = {"budget": die_after}

    def factory(name, split, batch_size):
        if split == "val":
            raise FileNotFoundError("no val split")
        ds = SyntheticDataset(batch_size=batch_size, height=32, width=64,
                              num_batches=NUM_BATCHES, seed=5)
        if state["budget"] is None:
            return ds
        loader = _PreemptingLoader(ds, state["budget"])
        state["budget"] = 0  # a re-created loader stays dead
        return loader

    return factory


def _final_state_bytes(workdir) -> bytes:
    return (Path(workdir) / "checkpts" / "pre"
            / "trainstate_latest.msgpack").read_bytes()


@pytest.mark.slow  # heavy plan-integration compile (fast-lane budget, r4)
def test_midway_resume_is_bit_exact(tmp_path):
    # reference: uninterrupted 2-epoch run, no periodic checkpoints
    ref_dir = tmp_path / "ref"
    train_by_plan(_cfg(ref_dir, every=0), _factory())

    # preempted run: dies on epoch 1's 2nd step (4 of 6 total steps
    # yielded; midway checkpoint at epoch 1 step 1 exists)
    pre_dir = tmp_path / "pre"
    with pytest.raises(_Preempted):
        train_by_plan(_cfg(pre_dir, every=1), _factory(die_after=4))
    ckpt_dir = Path(pre_dir) / "checkpts" / "pre"
    assert (ckpt_dir / "midway.json").exists()
    import json
    meta = json.loads((ckpt_dir / "midway.json").read_text())
    assert (meta["stage"], meta["epoch"], meta["steps_done"]) == (0, 1, 1)

    # resume: finishes epoch 1 from step 1 and must reproduce the
    # uninterrupted run's final train state bit for bit
    train_by_plan(_cfg(pre_dir, every=1), _factory())
    assert _final_state_bytes(pre_dir) == _final_state_bytes(ref_dir)
    # the midway marker is cleared once its epoch completes
    assert not (ckpt_dir / "midway.json").exists()

    # history.csv epoch means also match (restored running sums)
    import csv
    rows = {}
    for d in (ref_dir, pre_dir):
        with open(Path(d) / "checkpts" / "pre" / "history.csv") as f:
            rows[d] = list(csv.DictReader(f))
    assert len(rows[ref_dir]) == len(rows[pre_dir]) == 2
    for r_ref, r_pre in zip(rows[ref_dir], rows[pre_dir]):
        np.testing.assert_allclose(float(r_pre["train_loss"]),
                                   float(r_ref["train_loss"]), rtol=1e-6)
