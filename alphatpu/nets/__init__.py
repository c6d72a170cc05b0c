from .mlp import (  # noqa: F401
    NetConfig,
    apply_inference,
    apply_training,
    config_for_game,
    init_params,
)
