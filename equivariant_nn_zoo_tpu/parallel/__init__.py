from .mesh import make_mesh, replicated_spec, shard_batch_spec, shard_graph_batch

__all__ = [
    "make_mesh",
    "replicated_spec",
    "shard_batch_spec",
    "shard_graph_batch",
]
