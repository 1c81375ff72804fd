"""Export AOT serving artifacts for every TEST_PLAN stage.

Mirrors the checkpoint/plan walk of predict_by_plan
(/root/reference/model/model_main.py:132-160) but instead of running
predictions it serializes the compiled inference step per stage:

    python scripts/export_serving_main.py

Artifacts land in ``{datapath_prd}/{ckpt_name}/serving_{dataset}_{suffix}/``
and load anywhere with ``xpt_mde_tpu.serving.load_predictor``.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax.numpy as jnp

    from scripts.train_main import load_user_config
    from xpt_mde_tpu.models import ModelFactory
    from xpt_mde_tpu.serving import export_predictor
    from xpt_mde_tpu.training.checkpoint import CheckpointManager
    from xpt_mde_tpu.training.optimizers import optimizer_factory
    from xpt_mde_tpu.training.train_step import (create_train_state,
                                                 decode_image_features)
    from xpt_mde_tpu.training.trainer import default_dataset_factory

    cfg = load_user_config()
    dataset_factory = default_dataset_factory(cfg)
    for stage in cfg.test_plan:
        out_dir = (Path(cfg.datapath_prd) / stage.ckpt_name
                   / f"serving_{stage.dataset}_{stage.weight_suffix}")
        if (out_dir / "predict.jaxexport").exists():
            print(f"[export_serving] exists, skip: {out_dir}")
            continue
        loader = dataset_factory(stage.dataset, "test", cfg.batch_size)
        keys = loader.config_keys() if hasattr(loader, "config_keys") else \
            loader.ds.keys()
        model = ModelFactory(keys, stage.net_names, cfg.depth_activation,
                             stereo=cfg.stereo, high_res=cfg.high_res,
                             compute_dtype=cfg.compute_dtype).get_model()
        # init on decoded floats; export with the RAW batch so the
        # artifact takes uint8 and decodes on device (export.py)
        from xpt_mde_tpu.data import example_batch
        batch = {k: jnp.asarray(v) for k, v in example_batch(loader).items()}
        state = create_train_state(model, decode_image_features(batch),
                                   optimizer_factory(cfg.optimizer, 1e-4))
        ckpt = CheckpointManager(Path(cfg.datapath_ckp) / stage.ckpt_name)
        state, loaded = ckpt.restore_params(state, stage.weight_suffix)
        if not loaded:
            print(f"[export_serving] no weights for {stage.ckpt_name}, skip")
            continue
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        path = export_predictor(
            model, variables, batch, out_dir,
            description=f"{stage.net_names} on {stage.dataset} "
                        f"({stage.ckpt_name}/{stage.weight_suffix})")
        print(f"[export_serving] wrote {path}")


if __name__ == "__main__":
    main()
