from .sharding import make_row_mesh, render_frame_sharded, render_batch_sharded

__all__ = ["make_row_mesh", "render_frame_sharded", "render_batch_sharded"]
