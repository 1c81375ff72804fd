"""Serving export round-trip: export -> deserialize -> call == apply.

The artifact must be standalone (weights baked in, loadable with jax
alone) and produce the exact outputs of the live model at the exported
shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from xpt_mde_tpu.models import ModelFactory
from xpt_mde_tpu.serving import export_predictor, load_predictor

B, S, H, W = 1, 5, 32, 64


def _model_and_batch():
    rng = np.random.RandomState(0)
    feats = {"image5d": jnp.asarray(
        rng.rand(B, S, H, W, 3).astype(np.float32) * 2 - 1)}
    model = ModelFactory(["image", "intrinsic"],
                         {"depth": "DepthNetBasic", "camera": "PoseNetBasic"},
                         stereo=False).get_model()
    variables = model.init(jax.random.PRNGKey(0), feats, train=False)
    return model, variables, feats


def test_export_roundtrip(tmp_path):
    model, variables, feats = _model_and_batch()
    out = export_predictor(model, variables, feats, tmp_path / "art",
                           description="test predictor")
    assert (out / "predict.jaxexport").exists()
    assert (out / "meta.json").exists()

    predictor = load_predictor(out)
    assert predictor.meta["description"] == "test predictor"
    assert predictor.meta["input_spec"]["image5d"]["shape"] == [B, S, H, W, 3]

    got = predictor(feats)
    want = model.apply(variables, feats, train=False)
    np.testing.assert_allclose(np.asarray(got["depth_ms"][0]),
                               np.asarray(want["depth_ms"][0]),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got["pose"]),
                               np.asarray(want["pose"]),
                               atol=1e-6, rtol=1e-6)


def test_export_rejects_wrong_shape(tmp_path):
    model, variables, feats = _model_and_batch()
    out = export_predictor(model, variables, feats, tmp_path / "art")
    predictor = load_predictor(out)
    bad = {"image5d": jnp.zeros((B, S, H, 2 * W, 3), jnp.float32)}
    try:
        predictor(bad)
    except ValueError:
        return
    raise AssertionError("shape mismatch should raise")


def test_export_uint8_input_decodes_in_artifact(tmp_path):
    """Exporting from a raw_images loader batch (uint8 image5d) bakes
    the [-1,1] decode INTO the artifact: serving it with uint8 inputs
    equals serving the float artifact with decoded inputs."""
    from xpt_mde_tpu.training.train_step import decode_image_features

    model, variables, feats = _model_and_batch()
    raw = {"image5d": jnp.asarray(
        np.random.RandomState(1).randint(0, 256, (B, S, H, W, 3)),
        jnp.uint8)}
    out = export_predictor(model, variables, raw, tmp_path / "art_u8")
    predictor = load_predictor(out)
    assert predictor.meta["input_spec"]["image5d"]["dtype"] == "uint8"

    got = predictor(raw)
    want = model.apply(variables, decode_image_features(raw), train=False)
    np.testing.assert_allclose(np.asarray(got["depth_ms"][0]),
                               np.asarray(want["depth_ms"][0]),
                               atol=1e-6, rtol=1e-6)
