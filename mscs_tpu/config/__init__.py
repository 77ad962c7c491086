from mscs_tpu.config.parser import (
    apply_loss_preset,
    graph_config,
    loss_config,
    parse_config,
)
from mscs_tpu.config.defaults import DEFAULT_CONFIG_DICT, DEFAULT_CONFIG_NESTED_DICT
