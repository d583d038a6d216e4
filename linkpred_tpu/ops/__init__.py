"""linkpred_tpu.ops"""
