from . import chessboard, intrinsics  # noqa: F401
