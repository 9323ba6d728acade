from .mesh import (  # noqa: F401
    make_mesh,
    make_sharded_eval,
    replicate_state,
    shard_batch,
)
