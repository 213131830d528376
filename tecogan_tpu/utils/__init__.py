from . import config, logging_utils, paths, ckpt

__all__ = ["config", "logging_utils", "paths", "ckpt"]
