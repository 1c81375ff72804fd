from xpt_mde_tpu.data.synthetic import SyntheticDataset
