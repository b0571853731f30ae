import bench as B
B.BATCH = 8192
v = B.bench_jax()
print(f"batch 8192: {v:.0f} ex/s")
B.BATCH = 4096
v = B.bench_jax()
print(f"batch 4096: {v:.0f} ex/s")
