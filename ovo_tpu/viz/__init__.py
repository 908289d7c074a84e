from .visualizer import Visualizer, export_colored_pcd  # noqa: F401
