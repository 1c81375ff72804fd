"""Checkpointing: per-net weights + full-state resume.

Layout mirrors the reference's per-net H5 files
(/root/reference/model/build_model/model_wrappers.py:101-117): each
sub-net's params are a separate ``{netname}_{suffix}.msgpack`` so a plan
stage with a different net set (rigid vs joint, model_main.py:99-106)
loads exactly the nets it shares. Improvements over the reference:

- full optimizer state + step are ALSO checkpointed
  (``trainstate_{suffix}.msgpack``) for exact mid-stage resume -- the
  reference dropped optimizer state entirely (SURVEY.md §5);
- config snapshot drift check on resume (logger.py:256-287 role).

Kept behaviors: "latest" every epoch, "ep{NN}" at stage ends; resume
epoch derived from history.csv (util_funcs.py:129-143).
"""

from __future__ import annotations

import json
from pathlib import Path

import flax
import jax
import numpy as np

from xpt_mde_tpu.utils.util_class import WrongInputError


def _write_atomic(path: Path, data: bytes) -> None:
    """tmp + rename so a crash mid-save never leaves a truncated
    checkpoint that restore would half-load (same discipline as the
    shard writer's atomic drive dirs)."""
    import os
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(data)
    os.replace(tmp, path)


class CheckpointManager:
    def __init__(self, ckpt_dir):
        self.ckpt_dir = Path(ckpt_dir)
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)

    def save(self, state, suffix: str = "latest", stage_idx: int = -1):
        """Per-net params + batch stats + the full train state (tagged
        with the plan stage it belongs to, so full-state resume never
        leaks one stage's optimizer moments into the next)."""
        for net, params in state.params.items():
            data = flax.serialization.to_bytes(params)
            _write_atomic(self.ckpt_dir / f"{net}_{suffix}.msgpack", data)
        if state.batch_stats is not None:
            data = flax.serialization.to_bytes(state.batch_stats)
            _write_atomic(self.ckpt_dir / f"batchstats_{suffix}.msgpack",
                          data)
        full = {"params": state.params, "opt_state": state.opt_state,
                "step": state.step, "stage": np.int32(stage_idx)}
        if state.batch_stats is not None:
            full["batch_stats"] = state.batch_stats
        data = flax.serialization.to_bytes(full)
        _write_atomic(self.ckpt_dir / f"trainstate_{suffix}.msgpack", data)

    def restore_params(self, state, suffix: str = "latest"):
        """Load per-net params that exist on disk AND in the model; nets
        without a file train from scratch (model_main.py:99-106)."""
        params = dict(state.params)
        loaded_any = False
        for net in params.keys():
            path = self.ckpt_dir / f"{net}_{suffix}.msgpack"
            if not path.is_file():
                print(f"[ckpt] no weights for {net}, train from scratch")
                continue
            try:
                params[net] = flax.serialization.from_bytes(
                    params[net], path.read_bytes())
                loaded_any = True
                print(f"[ckpt] loaded {net} from {path.name}")
            except Exception as e:
                print(f"[ckpt] FAILED to load {net}: {e}")
        state = state.replace(params=flax.core.freeze(params)
                              if isinstance(state.params, flax.core.FrozenDict)
                              else params)
        bs_path = self.ckpt_dir / f"batchstats_{suffix}.msgpack"
        if state.batch_stats is not None and bs_path.is_file():
            try:
                state = state.replace(batch_stats=flax.serialization.from_bytes(
                    state.batch_stats, bs_path.read_bytes()))
            except Exception as e:
                print(f"[ckpt] FAILED to load batch stats: {e}")
        return state, loaded_any

    def restore_full(self, state, suffix: str = "latest",
                     stage_idx: int = -1):
        """Exact resume (params + optimizer + step) when the tree matches
        AND the checkpoint belongs to the same plan stage; returns None
        otherwise (a new stage must start a fresh optimizer even when
        its net set happens to match the previous stage's)."""
        path = self.ckpt_dir / f"trainstate_{suffix}.msgpack"
        if not path.is_file():
            return None
        target = {"params": state.params, "opt_state": state.opt_state,
                  "step": state.step, "stage": np.int32(-1)}
        if state.batch_stats is not None:
            target["batch_stats"] = state.batch_stats
        raw = path.read_bytes()
        try:
            restored = flax.serialization.from_bytes(target, raw)
        except Exception as e:
            # checkpoints written before the stage-scoping change carry no
            # "stage" key; retry without it and treat them as same-stage so
            # in-flight runs keep their exact optimizer state on upgrade
            try:
                target_v0 = dict(target)
                target_v0.pop("stage")
                restored = flax.serialization.from_bytes(target_v0, raw)
                restored["stage"] = stage_idx
                print("[ckpt] restored pre-stage-scoping full state "
                      "(assuming same stage)")
            except Exception:
                print(f"[ckpt] full-state restore incompatible ({e}); "
                      "falling back to per-net weights")
                return None
        if int(np.asarray(restored.get("stage", -1))) != stage_idx:
            print("[ckpt] full state belongs to another stage; "
                  "loading per-net weights with a fresh optimizer")
            return None
        state = state.replace(params=restored["params"],
                              opt_state=restored["opt_state"],
                              step=np.asarray(restored["step"]).item())
        if "batch_stats" in restored:
            state = state.replace(batch_stats=restored["batch_stats"])
        return state


    # --- mid-epoch (preemption-safe) checkpoints ---------------------------
    # The reference resumes at epoch granularity only (history.csv,
    # util_funcs.py:129-143). For preemptible TPU pods that loses up to
    # a full epoch; save_midway() checkpoints the full train state plus
    # (stage, epoch, completed steps, running metric sums) every N steps
    # (Config.ckpt_every_steps). The sidecar JSON is written AFTER the
    # state file, so its presence commits the pair atomically.

    def save_midway(self, state, stage_idx: int, epoch: int,
                    steps_done: int, metric_sums: dict, count: int):
        full = {"params": state.params, "opt_state": state.opt_state,
                "step": state.step, "stage": np.int32(stage_idx)}
        if state.batch_stats is not None:
            full["batch_stats"] = state.batch_stats
        _write_atomic(self.ckpt_dir / "trainstate_midway.msgpack",
                      flax.serialization.to_bytes(full))
        meta = {"stage": stage_idx, "epoch": epoch, "steps_done": steps_done,
                "metric_sums": {k: float(v) for k, v in metric_sums.items()},
                "count": count}
        _write_atomic(self.ckpt_dir / "midway.json",
                      json.dumps(meta).encode())

    def restore_midway(self, state, stage_idx: int, epoch: int):
        """(state, steps_done, metric_sums, count) if a midway
        checkpoint exists for exactly this (stage, epoch), else None."""
        meta_path = self.ckpt_dir / "midway.json"
        if not meta_path.is_file():
            return None
        try:
            meta = json.loads(meta_path.read_text())
        except ValueError:
            return None
        if meta.get("stage") != stage_idx or meta.get("epoch") != epoch:
            return None
        restored = self.restore_full(state, "midway", stage_idx)
        if restored is None:
            return None
        print(f"[ckpt] mid-epoch resume: stage {stage_idx} epoch {epoch} "
              f"at step {meta['steps_done']}")
        return (restored, int(meta["steps_done"]),
                dict(meta["metric_sums"]), int(meta["count"]))

    def clear_midway(self):
        """Drop the midway marker once the epoch completes (the
        epoch-end 'latest' checkpoint + history.csv take over)."""
        for name in ("midway.json", "trainstate_midway.msgpack"):
            path = self.ckpt_dir / name
            if path.is_file():
                path.unlink()


def read_previous_epoch(ckpt_dir) -> int:
    """Next epoch to run, from history.csv (util_funcs.py:129-143)."""
    hist = Path(ckpt_dir) / "history.csv"
    if not hist.is_file():
        return 0
    epochs = []
    for line in hist.read_text().strip().splitlines()[1:]:
        try:
            epochs.append(int(float(line.split(",")[0])))
        except (ValueError, IndexError):
            continue
    return max(epochs) + 1 if epochs else 0


def snapshot_config(ckpt_dir, config_dict: dict):
    """Save the config next to the checkpoint; on resume assert the fixed
    options are unchanged (logger.py:256-287)."""
    path = Path(ckpt_dir) / "config_snapshot.json"
    if path.exists():
        old = json.loads(path.read_text())
        fixed_keys = ["stereo", "high_res", "snippet_len", "min_depth",
                      "max_depth", "depth_activation"]
        for key in fixed_keys:
            if key in old and old.get(key) != config_dict.get(key):
                raise WrongInputError(
                    f"config drift on resume: {key}: "
                    f"{old.get(key)} != {config_dict.get(key)}")
    else:
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(config_dict, indent=2, default=str))


def load_pretrained_backbone(state, pretrained_path):
    """Graft converted ImageNet backbone weights (see
    scripts/convert_backbone_weights.py) into the depthnet's backbone
    subtree. Returns the updated state, or the original if the file is
    missing/incompatible."""
    path = Path(pretrained_path)
    if not path.is_file():
        return state, False
    if "depthnet" not in state.params or \
            "backbone" not in state.params["depthnet"]:
        return state, False
    import flax

    try:
        target = {"params": state.params["depthnet"]["backbone"]}
        if state.batch_stats is not None and \
                "backbone" in state.batch_stats.get("depthnet", {}):
            target["batch_stats"] = state.batch_stats["depthnet"]["backbone"]
        restored = flax.serialization.from_bytes(target, path.read_bytes())
    except Exception as e:
        print(f"[ckpt] pretrained backbone incompatible ({e})")
        return state, False
    params = dict(state.params)
    params["depthnet"] = dict(params["depthnet"])
    params["depthnet"]["backbone"] = restored["params"]
    state = state.replace(params=params)
    if "batch_stats" in restored and state.batch_stats is not None:
        bs = dict(state.batch_stats)
        bs["depthnet"] = dict(bs["depthnet"])
        bs["depthnet"]["backbone"] = restored["batch_stats"]
        state = state.replace(batch_stats=bs)
    print(f"[ckpt] loaded pretrained backbone from {path}")
    return state, True
