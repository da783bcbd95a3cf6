from sskd_tpu.data.registry import DATASETS, get_dataset_config
from sskd_tpu.data.demo import generate_demo_dataset

__all__ = ["DATASETS", "get_dataset_config", "generate_demo_dataset"]
