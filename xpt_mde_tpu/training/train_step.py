"""Pure-functional train/eval steps.

The reference's hot loop (/root/reference/model/train_val.py:78-155) is
re-designed TPU-first:

- ONE jitted function per stage: augment -> forward -> total loss ->
  grad -> update, all on device; metrics stay on device and the host
  syncs every N steps (the reference synced per step, train_val.py:159);
- BatchNorm running stats live in ``state.batch_stats`` and are updated
  through the mutable-collection mechanism;
- distribution is orthogonal: the same step function jits over a device
  mesh with sharded batches (parallel/sharding.py), XLA inserting the
  gradient all-reduce over ICI.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, Optional, Sequence

import flax
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from xpt_mde_tpu.training import metrics as tm


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def create_train_state(model, example_features: Mapping[str, Any],
                       tx: optax.GradientTransformation,
                       rng: Optional[jax.Array] = None) -> TrainState:
    """Initialize model variables and wrap them in a TrainState."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    variables = model.init(rng, example_features, train=False)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=tx,
    )


# exact twin of the loaders' host decode (u * 2/255 - 1, shard_io.py /
# native/shard_reader.cpp): running it inside the jitted step lets the
# loader ship raw uint8 snippets -- 4x less host decode work and 4x
# fewer host->device bytes (benchmarks/loader_bench.py)
_IMG_DECODE_SCALE = 2.0 / 255.0


def decode_image_features(features: Mapping[str, Any]) -> dict:
    """uint8 ``image5d*`` entries -> float32 [-1, 1]; no-op for floats."""
    out = dict(features)
    for key, value in features.items():
        if key.startswith("image5d") and value.dtype == jnp.uint8:
            out[key] = value.astype(jnp.float32) * _IMG_DECODE_SCALE - 1.0
    return out


def _forward(model, state: TrainState, params, features, train: bool):
    variables = {"params": params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
        if train:
            preds, new_state = model.apply(variables, features, train=True,
                                           mutable=["batch_stats"])
            return preds, new_state["batch_stats"]
        preds = model.apply(variables, features, train=False)
        return preds, state.batch_stats
    preds = model.apply(variables, features, train=train)
    return preds, None


def _compute_metrics(preds, features, loss, loss_by_type):
    metrics = {"loss": loss}
    metrics.update({f"loss/{k}": v for k, v in loss_by_type.items()})
    if "depth_ms" in preds and "depth_gt" in features:
        metrics["depth_abs_rel"] = jnp.mean(
            tm.depth_abs_rel(preds["depth_ms"][0], features["depth_gt"]))
        # center-region mean depth magnitude (train_val.py:212-236)
        d = preds["depth_ms"][0]
        h, w = d.shape[1:3]
        metrics["depth_center_mean"] = jnp.mean(
            d[:, h // 4: h * 3 // 4, w // 4: w * 3 // 4])
    if "pose" in preds and "pose_gt" in features:
        metrics.update(tm.pose_metrics(preds["pose"], features["pose_gt"]))
    return metrics


def make_train_step(model, total_loss, augmenter=None,
                    regularize_net: Optional[str] = None,
                    jit: bool = True,
                    frozen_nets: Sequence[str] = ()) -> Callable:
    """Build the train step (jitted unless ``jit=False`` -- the
    reference's "eager" TRAIN_MODE for step-through debugging,
    config-example.py:255 / train_val.py:12).

    :param model: VodeModel (Flax module)
    :param total_loss: TotalLoss callable (preds, features) -> (loss, dict)
    :param augmenter: optional TotalAugment applied on device pre-forward
    :param regularize_net: net whose params feed the flow_reg L2 loss
    :param frozen_nets: top-level param groups whose backward pass is
        pruned via stop_gradient. The reference freezes the flownet in
        joint stages with Keras ``trainable=False`` (model_main.py:88-90),
        and TF's ``tape.gradient(loss, trainable_weights)`` never BUILDS
        the frozen net's backward graph. Here the pruning is explicit
        rather than load-bearing: the optimizer's ``set_to_zero`` mask
        already lets XLA dead-code the frozen backward (measured A/B on
        the joint stage: 53.1 vs 52.9 ms/step, benchmarks/
        probe_frozen_prune.py), so this guarantees the pruning at the
        graph level instead of relying on the compiler, with
        bit-identical updates either way.
    """
    frozen = set(frozen_nets) - {regularize_net}

    def train_step(state: TrainState, features: Mapping[str, Any], rng):
        features = decode_image_features(features)
        if augmenter is not None:
            aug_rng, rng = jax.random.split(rng)
            features = augmenter(dict(features), aug_rng)

        def loss_fn(params):
            if frozen:
                params = {k: (jax.lax.stop_gradient(v) if k in frozen else v)
                          for k, v in params.items()}
            preds, new_batch_stats = _forward(model, state, params, features,
                                              train=True)
            if regularize_net is not None and regularize_net in params:
                preds = dict(preds)
                preds["regularize_weights"] = params[regularize_net]
            loss, loss_by_type = total_loss(preds, features)
            return loss, (loss_by_type, new_batch_stats, preds)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (loss_by_type, new_batch_stats, preds)), grads = grad_fn(state.params)
        state = state.apply_gradients(grads=grads)
        if new_batch_stats is not None:
            state = state.replace(batch_stats=new_batch_stats)
        metrics = _compute_metrics(preds, features, loss, loss_by_type)
        return state, metrics

    if not jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(model, total_loss) -> Callable:
    """Validation step: forward + loss + metrics, no update."""

    def eval_step(state: TrainState, features: Mapping[str, Any]):
        features = decode_image_features(features)
        preds, _ = _forward(model, state, state.params, features, train=False)
        loss, loss_by_type = total_loss(preds, features)
        return _compute_metrics(preds, features, loss, loss_by_type)

    return jax.jit(eval_step)


def make_predict_step(model) -> Callable:
    """Inference step returning the full prediction dict."""

    def predict_step(state: TrainState, features: Mapping[str, Any]):
        features = decode_image_features(features)
        preds, _ = _forward(model, state, state.params, features, train=False)
        return preds

    return jax.jit(predict_step)
