from .mesh import (  # noqa: F401
    AXIS,
    device_keys,
    make_mesh,
    sharded_duel_fn,
    sharded_selfplay_fn,
    sharded_train_fn,
)
