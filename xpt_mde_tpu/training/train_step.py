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
                    frozen_nets: Sequence[str] = (),
                    grad_accum_steps: int = 1) -> Callable:
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
    :param grad_accum_steps: split each batch into this many sequential
        microbatches (``lax.scan``), summing gradients before ONE
        optimizer update — activation memory drops ~k× so batch sizes
        beyond HBM (the reference's high-res batch-4 GPU limit,
        README.md:12-16) fit a single chip. Every TotalLoss term is
        sum-over-samples / GLOBAL batch (losses.py:49 semantics), so
        summed microbatch grads equal the full-batch grads up to float
        addition order — EXACT for BN-free models (tested). Two known
        deviations: (a) BatchNorm (pretrained backbones) normalizes by
        the CURRENT microbatch's statistics in train mode, so
        activations — and its running stats — see k batches of size
        batch/k, the standard grad-accum BN caveat; (b) md2cmb* recipes
        normalize by a batch-GLOBAL valid-pixel count (total.py:152,
        the reference's count_nonzero quirk, losses.py:324-374), which
        becomes per-microbatch. Augmentation is applied ONCE to the
        full batch before the split, preserving the reference's
        batch-shared crop box (augmentation.py:66-129).
    """
    frozen = set(frozen_nets) - {regularize_net}
    if grad_accum_steps < 1:
        raise ValueError(f"grad_accum_steps must be >= 1, got {grad_accum_steps}")
    if grad_accum_steps > 1 and getattr(total_loss, "batch_size", None) is None:
        # without a pinned global batch each microbatch loss would be
        # sum / (batch/k) and the accumulated sum k x too large
        raise ValueError("grad_accum_steps > 1 requires total_loss built "
                         "with batch_size = the GLOBAL batch size")

    def loss_fn_for(state, features):
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
        return loss_fn

    def train_step(state: TrainState, features: Mapping[str, Any], rng):
        features = decode_image_features(features)
        if augmenter is not None:
            aug_rng, rng = jax.random.split(rng)
            features = augmenter(dict(features), aug_rng)

        grad_fn = jax.value_and_grad(loss_fn_for(state, features),
                                     has_aux=True)
        (loss, (loss_by_type, new_batch_stats, preds)), grads = grad_fn(state.params)
        state = state.apply_gradients(grads=grads)
        if new_batch_stats is not None:
            state = state.replace(batch_stats=new_batch_stats)
        metrics = _compute_metrics(preds, features, loss, loss_by_type)
        return state, metrics

    def train_step_accum(state: TrainState, features: Mapping[str, Any], rng):
        features = decode_image_features(features)
        if augmenter is not None:
            aug_rng, rng = jax.random.split(rng)
            features = augmenter(dict(features), aug_rng)

        k = grad_accum_steps
        batch = next(iter(features.values())).shape[0]
        if batch % k:
            raise ValueError(f"batch {batch} must divide by "
                             f"grad_accum_steps {k}")

        micro = {key: v.reshape((k, batch // k) + v.shape[1:])
                 for key, v in features.items()}
        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)

        def body(carry, mfeat):
            grads_acc, bstats = carry
            st = state.replace(batch_stats=bstats)
            grad_fn = jax.value_and_grad(loss_fn_for(st, mfeat), has_aux=True)
            (loss, (loss_by_type, new_bstats, preds)), grads = grad_fn(
                state.params)
            metrics = _compute_metrics(preds, mfeat, loss, loss_by_type)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            return (grads_acc, new_bstats), metrics

        (grads, new_batch_stats), mstack = jax.lax.scan(
            body, (zero_grads, state.batch_stats), micro)
        # loss terms are already sum / GLOBAL batch per microbatch -> sum;
        # quality metrics are per-microbatch means of equal sizes -> mean
        metrics = {key: (jnp.sum(v) if key == "loss" or key.startswith("loss/")
                         else jnp.mean(v)) for key, v in mstack.items()}
        state = state.apply_gradients(grads=grads)
        if new_batch_stats is not None:
            state = state.replace(batch_stats=new_batch_stats)
        return state, metrics

    if grad_accum_steps > 1:
        train_step = train_step_accum

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
