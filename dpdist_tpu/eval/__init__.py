from dpdist_tpu.eval.registration import evaluate_registration, accuracy_buckets

__all__ = ["evaluate_registration", "accuracy_buckets"]
