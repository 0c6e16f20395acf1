from .render import render_frame, render_trajectory

__all__ = ["render_frame", "render_trajectory"]
