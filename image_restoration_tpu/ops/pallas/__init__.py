from .fused_act_kernel import fused_bias_lrelu_pallas

__all__ = ["fused_bias_lrelu_pallas"]
