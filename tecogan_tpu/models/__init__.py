"""Model registry (reference contract: `codes/models/__init__.py:16-26`)."""

from .vsr_model import VSRModel
from .vsrgan_model import VSRGANModel


def define_model(opt, mesh=None):
    name = opt["model"]["name"].lower()
    if name == "frvsr":
        return VSRModel(opt, mesh)
    if name == "tecogan":
        return VSRGANModel(opt, mesh)
    raise ValueError(f"Unrecognized model: {opt['model']['name']}")


__all__ = ["define_model", "VSRModel", "VSRGANModel"]
