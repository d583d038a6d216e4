"""linkpred_tpu.io"""
