import time
def calib():
    n = 256 * (1 << 20) // 4
    x = jnp.asarray(np.random.randint(0, 1 << 30, n, np.uint32).reshape(-1, 128))
    f = jax.jit(lambda x: (x ^ jnp.uint32(123)).astype(jnp.float32).sum())
    warm, dt = timeit(f, x)
    print(f"[calib streamread 256MiB] {dt*1e3:.2f} ms = {256/1024/dt:.0f} GiB/s")
calib()

from sview_fmindex_tpu.ops import stream_join
from sview_fmindex_tpu.models.device_index import IndexMeta

N_TEXT = int(1e9)
sigma = 4
rng = np.random.default_rng(0)
bwt = rng.integers(0, sigma, N_TEXT, dtype=np.uint8)
T = 8192
t0 = time.time()
tbl = stream_join.build_stream_table(sigma, bwt, T)
tbl_dev = jax.device_put(tbl); tbl_dev.block_until_ready()
print(f"[table] built+uploaded {time.time()-t0:.1f}s")
meta = IndexMeta(sigma=sigma, kmer_size=3, sampling_ratio=2, block_len=64,
                 num_planes=3, num_lanes=2, stream_rows=tbl.shape[0], stream_tile=T)
sentinel = jnp.uint32(12345)

for Nq in (1 << 18, 1 << 21):
    pos = jnp.asarray(rng.integers(0, N_TEXT, Nq, dtype=np.uint32))
    sym = jnp.asarray(rng.integers(0, sigma, Nq, dtype=np.int32))
    k = jnp.asarray(rng.integers(0, 1 << 30, Nq, dtype=np.uint32))
    pay = jnp.arange(Nq, dtype=jnp.int32)
    f = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1))
    warm, dt = timeit(f, k, pay)
    print(f"[sort Nq={Nq}] {dt*1e3:.2f} ms")
    for skip in (False, True):
        g = jax.jit(lambda tb, s, p, sy, skip=skip: stream_join.rank_next_sorted(
            meta, tb, s, p, sy, T=T, C=1024, skip_groups=skip))
        warm, dt = timeit(g, tbl_dev, sentinel, pos, sym)
        print(f"[rank Nq={Nq} skip={skip}] {dt*1e3:.2f} ms = {dt*1e9/Nq:.2f} ns/q (warm {warm:.0f}s)")
calib()
print("JOB1 DONE")
