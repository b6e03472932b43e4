"""ComfyUI package registration (reference: __init__.py).

Copy/symlink this repo into ComfyUI/custom_nodes and rename this file to
__init__.py (the repo root keeps its own module layout for the CLI)."""

from node import NODE_CLASS_MAPPINGS, NODE_DISPLAY_NAME_MAPPINGS

__all__ = ["NODE_CLASS_MAPPINGS", "NODE_DISPLAY_NAME_MAPPINGS"]
