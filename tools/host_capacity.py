"""Host capacity probe: aggregate throughput of N independent processes
doing (a) pure-CPU register work, (b) 64MB memory-streaming copies."""
import multiprocessing as mp, time, sys
import numpy as np

def cpu_work(dur, q):
    t0 = time.perf_counter(); x = 1; n = 0
    while time.perf_counter() - t0 < dur:
        for _ in range(100000):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        n += 1
    q.put(n)

def mem_work(dur, q):
    a = np.arange(8_000_000, dtype=np.float64)  # 64 MB
    b = np.empty_like(a)
    t0 = time.perf_counter(); n = 0
    while time.perf_counter() - t0 < dur:
        np.copyto(b, a); b *= 1.0000001; n += 1
    q.put(n)

def run(fn, nproc, dur=6.0):
    q = mp.Queue()
    ps = [mp.Process(target=fn, args=(dur, q)) for _ in range(nproc)]
    [p.start() for p in ps]; [p.join() for p in ps]
    return sum(q.get() for _ in ps)

if __name__ == "__main__":
    for name, fn in [("cpu", cpu_work), ("mem", mem_work)]:
        r = {}
        for n in (2, 8):
            r[n] = run(fn, n)
        eff = (r[8] / r[2]) / 4
        print(f"{name}: N=2 {r[2]}  N=8 {r[8]}  2->8 eff {eff:.3f}")
