from .reference_cpu import render_oracle

__all__ = ["render_oracle"]
