from .shard import classify_item_sharded, make_mesh, sharded_bake_step

__all__ = ["classify_item_sharded", "make_mesh", "sharded_bake_step"]
