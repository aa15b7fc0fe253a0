from . import lie, cameras
