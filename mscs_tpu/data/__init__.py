from mscs_tpu.data.datasets_info import (
    DATASETS_INFO,
    class_names,
    categories,
    has_ignore_class,
    ignore_class,
    num_all_classes,
    num_real_classes,
    remap_lookup,
    to_network_lookup,
)
from mscs_tpu.data.datasets import (
    ADE20K,
    Cityscapes,
    DATASET_REGISTRY,
    DatasetFromDF,
    PascalC,
    SegDataset,
    SyntheticDataset,
    get_cadis_dataframes,
)
from mscs_tpu.data.transforms import apply_transforms, parse_transform_lists
from mscs_tpu.data.loader import DataLoader, device_prefetch
from mscs_tpu.data.sampler import (
    repeat_factor_indices,
    repeat_factors_from_frequencies,
    shuffled_indices,
)
