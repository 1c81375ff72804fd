"""Keras -> Flax EfficientNet weight-conversion parity.

Builds a randomly initialized tf.keras EfficientNetB0 (no downloads),
converts its weights into our Flax EfficientNet, and checks that all 5
tap feature maps match keras' intermediate outputs. This proves the
ImageNet-pretrained-backbone pathway (SURVEY.md hard part #3) works the
moment real weight files are available offline.
"""

import numpy as np
import pytest

# keras/TF-twin builds dominate suite wall time (~50+ min of the
# 89-min full run, VERDICT r2 weak #7); full parity lane: --runslow
pytestmark = pytest.mark.slow

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from xpt_mde_tpu.models.backbones.convert_keras import (  # noqa: E402
    convert_efficientnet, load_into_variables)
from xpt_mde_tpu.models.backbones.efficientnet import EfficientNet  # noqa: E402

H, W = 64, 128


@pytest.fixture(scope="module")
def keras_b0():
    tf.keras.utils.set_random_seed(0)
    return tf.keras.applications.EfficientNetB0(
        include_top=False, weights=None, input_shape=(H, W, 3))


def _keras_tap_layers(model):
    """Last layer of stages 1, 2, 3, 5, 7 (strides 2..32), scanning the
    layer order like the reference's scaled_layers.json tap points."""
    taps = {}
    for layer in model.layers:
        name = layer.name
        if name.startswith("block") and (name.endswith("_add")
                                         or name.endswith("project_bn")):
            taps[int(name[5])] = layer
    return [taps[i] for i in (1, 2, 3, 5, 7)]


def test_efficientnet_conversion_matches_keras(keras_b0):
    model = keras_b0
    rng = np.random.RandomState(0)
    x_raw = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)

    # keras preprocesses internally (Rescaling + Normalization); with
    # weights=None the Normalization is 0-mean/1-var. Pin it to the
    # imagenet stats so the conversion path (which reads the layer's
    # weights into our input_mean/input_var batch_stats) is non-trivial.
    # finalize_state() refreshes the call-path snapshot keras 3 keeps.
    for layer in model.layers:
        if type(layer).__name__ == "Normalization":
            layer.set_weights([np.array([0.485, 0.456, 0.406], np.float32),
                               np.array([0.229 ** 2, 0.224 ** 2,
                                         0.225 ** 2], np.float32),
                               np.array(0, np.int64)])
            layer.finalize_state()

    tap_layers = _keras_tap_layers(model)
    keras_taps = tf.keras.Model(model.input,
                                [l.output for l in tap_layers])(x_raw)
    keras_taps = [np.asarray(t) for t in keras_taps]

    flax_model = EfficientNet(variant="B0")
    variables = flax_model.init(jax.random.PRNGKey(0), jnp.asarray(x_raw),
                                train=False)
    params, stats = convert_efficientnet(model, "B0")
    variables = load_into_variables(variables, params, stats)
    flax_taps = flax_model.apply(variables, jnp.asarray(x_raw), train=False)

    assert len(flax_taps) == 5
    for i, (ours, theirs) in enumerate(zip(flax_taps, keras_taps)):
        ours = np.asarray(ours)
        assert ours.shape == theirs.shape, (i, ours.shape, theirs.shape)
        diff = np.abs(ours - theirs).max()
        assert diff < 2e-3, f"tap {i}: max diff {diff}"


def test_pretrained_graft_into_train_state(keras_b0, tmp_path):
    """convert -> save msgpack -> load into a DepthNetPretrained train
    state (the PRETRAINED_WEIGHT=True path)."""
    import flax

    from xpt_mde_tpu.models import ModelFactory
    from xpt_mde_tpu.training import create_train_state, optimizer_factory
    from xpt_mde_tpu.training.checkpoint import load_pretrained_backbone

    params, stats = convert_efficientnet(keras_b0, "B0")
    pre_path = tmp_path / "EfficientNetB0.msgpack"
    pre_path.write_bytes(flax.serialization.to_bytes(
        {"params": params, "batch_stats": stats}))

    factory = ModelFactory(["image", "intrinsic"],
                           {"depth": "EfficientNetB0",
                            "camera": "PoseNetImproved"}, stereo=False)
    model = factory.get_model()
    feats = {"image5d": jnp.zeros((1, 5, H, W, 3))}
    state = create_train_state(model, feats,
                               optimizer_factory("adam_constant", 1e-4))
    before = np.asarray(
        state.params["depthnet"]["backbone"]["Conv_0"]["kernel"]).copy()
    state, ok = load_pretrained_backbone(state, pre_path)
    assert ok
    after = np.asarray(
        state.params["depthnet"]["backbone"]["Conv_0"]["kernel"])
    assert not np.allclose(before, after)
    # the grafted stem kernel equals the converted keras kernel
    assert np.allclose(after, params["Conv_0"]["kernel"])
