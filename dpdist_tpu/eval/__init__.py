from dpdist_tpu.eval.registration import evaluate_registration, accuracy_buckets
from dpdist_tpu.eval.dense import dense_point_to_surface
from dpdist_tpu.eval.comparison import perturbation_sweep, monotonicity
from dpdist_tpu.eval import viz

__all__ = [
    "evaluate_registration",
    "accuracy_buckets",
    "dense_point_to_surface",
    "perturbation_sweep",
    "monotonicity",
    "viz",
]
