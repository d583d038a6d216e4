"""linkpred_tpu.parallel"""
