from .metrics import pearsonr, regression_metrics

__all__ = ["pearsonr", "regression_metrics"]
