from .mesh import (  # noqa: F401
    audit_tp_sharding,
    make_hybrid_mesh,
    make_mesh,
    make_sharded_eval,
    make_spatial_eval,
    replicate_state,
    shard_batch,
    shard_state_tp,
    tp_shard_tree,
    tp_spec_for_path,
)
