"""Default config values — mirror of reference ``utils/defaults.py:174-251``
(minus torch/CUDA-specific keys, plus TPU runtime keys)."""

DEFAULT_CONFIG_DICT = {
    "mode": "training",
    "debugging": False,
    "log_every_n_epochs": 100,
    "max_valid_imgs": 10,
    "parallel": False,
    "seed": 0,
    "tta": False,
    "valid_freq": 10,
    "valid_batch_size": 1,
}

DEFAULT_CONFIG_NESTED_DICT = {
    "data": {
        "transforms": [],
        "transforms_val": [],
        "transform_values": {"crop_shape": [512, 1024]},
        "transform_values_val": {},
        "split": 1,
        "batch_size": 10,
        "num_workers": 4,
        "blacklist": True,
        "use_relabeled": False,
        "repeat_factor": [0, 0],
        "repeat_factor_freq_thresh": 0.15,
    },
    "train": {
        "epochs": 50,
        "lr_fct": "exponential",
        "lr_batchwise": False,
        "lr_restarts": [],
        "lr_restart_vals": 1,
        "lr_params": None,
    },
    "loss": {
        "temperature": 0.1,
        "dominant_mode": "all",
        "label_scaling_mode": "nn",
    },
}
