"""linkpred_tpu.predict"""
