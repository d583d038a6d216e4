"""The link-prediction engine: metrics, plans, scoring, public API."""
from .api import (
    PlanCache, PredictOptions, PredictResult, predict_links,
    predict_links_multi, top_per_source)
from .metrics import METRICS, TECHNIQUE_NAMES, get_metric
from .plan import TilePlan, build_plan

__all__ = ["PredictOptions", "PredictResult", "predict_links",
           "predict_links_multi", "top_per_source", "PlanCache", "METRICS", "TECHNIQUE_NAMES",
           "get_metric", "TilePlan", "build_plan"]
