"""Vendored minimal Waymo Open Dataset proto schema (see dataset.proto)."""

from xpt_mde_tpu.data.readers.waymo_protos import dataset_pb2

__all__ = ["dataset_pb2"]
