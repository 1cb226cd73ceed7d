import multiprocessing as mp, numpy as np, time, sys

def worker(q, seconds):
    a = np.empty(64 * 1024 * 1024, dtype=np.uint8)  # 64 MB
    b = np.empty_like(a)
    a[:] = 1
    n = 0
    t0 = time.time()
    while time.time() - t0 < seconds:
        np.copyto(b, a); np.copyto(a, b)
        n += 2
    q.put(n * a.nbytes / (time.time() - t0))

def run(p, seconds=8):
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(q, seconds)) for _ in range(p)]
    [x.start() for x in ps]
    rates = [q.get() for _ in ps]
    [x.join() for x in ps]
    return sum(rates) / 1e9

if __name__ == "__main__":
    for p in (8, 32, 8, 32):
        gbs = run(p)
        print(f"procs={p}: aggregate {gbs:.1f} GB/s, per-proc {gbs/p:.2f} GB/s", flush=True)
