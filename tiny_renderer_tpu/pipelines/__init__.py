from .frame import PIPELINES, make_frame_fn

__all__ = ["PIPELINES", "make_frame_fn"]
