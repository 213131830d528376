from .metric_calculator import MetricCalculator, create_metric_calculator
from .model_summary import count_params, profile_frnet, xla_cost
from .ssim import ssim

__all__ = [
    "MetricCalculator",
    "create_metric_calculator",
    "count_params",
    "profile_frnet",
    "xla_cost",
    "ssim",
]
