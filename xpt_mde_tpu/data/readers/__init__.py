from xpt_mde_tpu.data.readers.reader_base import DataReaderBase


def data_reader_factory(dataset_name: str, split: str,
                        base_path=None) -> DataReaderBase:
    """Reader registry (mirrors tfrecords/example_maker.py:31-50)."""
    if dataset_name == "kitti_raw":
        from xpt_mde_tpu.data.readers.kitti_reader import KittiRawReader
        return KittiRawReader(split, base_path)
    if dataset_name == "kitti_odom":
        from xpt_mde_tpu.data.readers.kitti_reader import KittiOdomReader
        return KittiOdomReader(split, base_path)
    if dataset_name == "cityscapes":
        from xpt_mde_tpu.data.readers.city_reader import CityscapesReader
        return CityscapesReader(split, base_path)
    if dataset_name == "a2d2":
        from xpt_mde_tpu.data.readers.a2d2_reader import A2D2Reader
        return A2D2Reader(split, base_path)
    if dataset_name == "waymo":
        from xpt_mde_tpu.data.readers.waymo_reader import WaymoReader
        return WaymoReader(split, base_path)
    if dataset_name == "synthetic":
        from xpt_mde_tpu.data.synthetic import SyntheticReader
        return SyntheticReader(split, base_path)
    if dataset_name == "driving_stereo":
        from xpt_mde_tpu.data.readers.driving_reader import DrivingStereoReader
        return DrivingStereoReader(split, base_path)
    raise ValueError(f"unknown dataset: {dataset_name}")
