"""linkpred_tpu.utils"""
