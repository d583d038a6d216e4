"""linkpred_tpu.bench"""
