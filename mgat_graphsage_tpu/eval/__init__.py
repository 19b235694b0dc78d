from .metrics import pearsonr, regression_metrics
from .predict import (Predictor, load_model_from_checkpoint, predict_csv,
                      predict_dataset)

__all__ = ["pearsonr", "regression_metrics", "Predictor",
           "load_model_from_checkpoint", "predict_csv", "predict_dataset"]
