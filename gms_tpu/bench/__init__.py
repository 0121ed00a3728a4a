"""Benchmark entry points — one module per algorithm, mirroring the
reference's per-algorithm benchmark binaries (gms/algorithms/*/ *.cc).

Run as:  python -m gms_tpu.bench.triangle_count -g kronecker 16 -n 3 -v
"""
