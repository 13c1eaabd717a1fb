import jax, sys
d = jax.devices()[0]
try:
    ms = d.memory_stats()
    for k in sorted(ms): print(k, ms[k], file=sys.stderr)
except Exception as e:
    print("no memory_stats:", e, file=sys.stderr)
