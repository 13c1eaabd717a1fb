# Real 1e9 index: e2e count/locate at B=100k and 1M, stream vs gather.
import time, importlib
os.environ["BENCH_TEXT_SIZE"] = "1e9"
import bench
importlib.reload(bench)
text = bench.get_text()
fm = bench.get_blob(text)
t0 = time.time()
lut = os.path.join(bench.CACHE_DIR, f"dense_lut_{bench.TEXT_SIZE}_{bench.SEED}.npz")
dev = fm.to_device(dense_lut_cache=lut, sa_full=bench.sa_full_path())
print(f"[upload] {time.time()-t0:.1f}s dk={dev.meta.dense_k} sa_full={dev.meta.has_sa_full}")
text_arr = np.frombuffer(text, np.uint8)
rng2 = np.random.default_rng(43)

def make_batch(B):
    starts = rng2.integers(0, len(text_arr) - 20, size=B)
    pats = text_arr[starts[:, None] + np.arange(20)]
    return jnp.asarray(pats), np.full(B, 20, np.int32)

for B in (100_000, 1_000_000):
    pats, lens = make_batch(B)
    for us in (False, True):
        f = lambda p: dev.count(p, lens, use_stream=us)
        warm, dt = timeit(f, pats, reps=6)
        print(f"[count B={B} stream={us}] {dt*1e3:.1f} ms = {B/dt/1e6:.3f} Mq/s (warm {warm:.0f}s)")
    counts = np.asarray(dev.count(pats, lens))
    cap = max(1 << (int(counts.sum()) - 1).bit_length(), 1024)
    for us in (False, True):
        f = lambda p: dev.locate_with_counts(p, lens, capacity=cap, use_stream=us)
        warm, dt = timeit(f, pats, reps=6)
        print(f"[locate B={B} stream={us}] {dt*1e3:.1f} ms = {B/dt/1e6:.3f} Mq/s (warm {warm:.0f}s)")
print("JOB2 DONE")
