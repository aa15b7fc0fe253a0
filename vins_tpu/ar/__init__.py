from .overlay import ArOverlay, rasterize_cube  # noqa: F401
