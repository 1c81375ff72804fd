"""Export/load AOT-compiled inference artifacts (jax.export).

Artifact layout (a directory):

- ``predict.jaxexport``  serialized ``jax.export.Exported`` of the jitted
  forward step, weights baked in as constants (standalone -- loading
  needs jax only, none of this package's model code)
- ``meta.json``          input/output spec, platform, model description

Shapes are static by design (TPU rule: one compile per shape); export one
artifact per serving shape. The forward step is the same computation as
``training.train_step.make_predict_step`` (reference parity:
/root/reference/model/model_main.py:132-160 predictions), minus the
train-only branches.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Mapping

import jax
import jax.numpy as jnp

_ARTIFACT = "predict.jaxexport"
_META = "meta.json"


def _tree_spec(tree) -> Any:
    return jax.tree_util.tree_map(
        lambda x: {"shape": list(x.shape), "dtype": str(x.dtype)}, tree)


def export_predictor(model, variables: Mapping[str, Any],
                     example_features: Mapping[str, Any],
                     out_dir, description: str = "") -> Path:
    """Trace ``model.apply(variables, features, train=False)`` at the
    example's shapes and serialize it with the weights baked in.

    :param model: a built (Flax) model, e.g. ``ModelFactory().get_model()``
    :param variables: the full variable tree (params [+ batch_stats])
    :param example_features: one feature batch fixing shapes/dtypes
    :param out_dir: artifact directory (created; overwritten if present)
    :return: the artifact directory path
    """
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    from xpt_mde_tpu.training.train_step import decode_image_features

    def predict(features):
        # uint8 image5d* decodes to [-1,1] float IN the artifact (no-op
        # for float inputs): exporting from a raw_images loader yields a
        # uint8-input artifact -- 4x smaller serving transfers -- and
        # the normalization can never be forgotten by the client
        return model.apply(variables, decode_image_features(features),
                           train=False)

    specs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        dict(example_features))
    exported = jax.export.export(jax.jit(predict))(specs)
    (out_dir / _ARTIFACT).write_bytes(exported.serialize())
    meta = {
        "description": description,
        "platforms": list(exported.platforms),
        "input_spec": _tree_spec(dict(example_features)),
        "jax_version": jax.__version__,
    }
    (out_dir / _META).write_text(json.dumps(meta, indent=2))
    return out_dir


class ServingPredictor:
    """A loaded artifact: ``predictor(features) -> preds`` with zero
    retracing (shapes must match the exported spec)."""

    def __init__(self, exported, meta: dict):
        self._exported = exported
        self.meta = meta

    def __call__(self, features: Mapping[str, Any]):
        return self._exported.call(dict(features))


def load_predictor(artifact_dir) -> ServingPredictor:
    artifact_dir = Path(artifact_dir)
    blob = (artifact_dir / _ARTIFACT).read_bytes()
    meta = json.loads((artifact_dir / _META).read_text())
    return ServingPredictor(jax.export.deserialize(blob), meta)
