from dpdist_tpu.kernels.threedmfv_pallas import threedmfv_pallas

__all__ = ["threedmfv_pallas"]
