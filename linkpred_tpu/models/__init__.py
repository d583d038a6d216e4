"""linkpred_tpu.models"""
