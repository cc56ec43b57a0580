from soundspaces_tpu.utils.registry import registry

__all__ = ["registry"]
