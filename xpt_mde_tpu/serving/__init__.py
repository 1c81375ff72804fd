"""Production serving: AOT-exported inference artifacts.

The reference framework has no serving path -- predictions go straight
to npz files inside the evaluation flow
(/root/reference/model/model_main.py:132-160). For TPU production
deployment this package adds a first-class export/load pair built on
``jax.export``: the inference step is traced once at fixed shapes,
lowered to a serialized StableHLO artifact with the weights baked in as
constants, and can be re-loaded and executed with no model code, no
checkpoint plumbing, and no retracing.
"""

from xpt_mde_tpu.serving.export import (ServingPredictor, export_predictor,
                                        load_predictor)

__all__ = ["ServingPredictor", "export_predictor", "load_predictor"]
