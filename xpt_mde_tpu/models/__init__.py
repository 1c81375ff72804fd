from xpt_mde_tpu.models.factory import ModelFactory, VodeModel
