"""Tunnel transfer concurrency probe (round-5 perf session).

Question: does the axon relay serialize host->device transfers, or can two
concurrent pushes exceed the single-stream ~37 MB/s? And does a result
pull contend with a push? The answers size the streamed-path ceiling:
at 750 KB/image the push floor is ~20 ms/image if single-stream, half
that if two streams multiplex.

Fresh buffers every push (JAX dedupes repeat transfers of the same host
array). Run with the device otherwise free.
"""
import threading
import time

import jax.numpy as jnp
import numpy as np


def fresh(mb, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 255, (int(mb * 1e6),), np.uint8)


def push(buf):
    jnp.asarray(buf).block_until_ready()


def timed_serial(n=3, mb=12):
    bufs = [fresh(mb, i) for i in range(n)]
    t0 = time.time()
    for b in bufs:
        push(b)
    dt = time.time() - t0
    return n * mb / dt


def timed_concurrent(nthreads=2, mb=12):
    bufs = [fresh(mb, 100 + i) for i in range(nthreads)]
    threads = [threading.Thread(target=push, args=(b,)) for b in bufs]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.time() - t0
    return nthreads * mb / dt


def main():
    push(fresh(1, 999))                      # backend warmup
    s1 = timed_serial()
    c2 = timed_concurrent(2)
    c3 = timed_concurrent(3)
    s2 = timed_serial()                      # tunnel variance control
    print(f"serial 1-stream:     {s1:6.1f} MB/s")
    print(f"concurrent 2-stream: {c2:6.1f} MB/s")
    print(f"concurrent 3-stream: {c3:6.1f} MB/s")
    print(f"serial control:      {s2:6.1f} MB/s")
    gain = c2 / max(s1, s2)
    print(f"2-stream gain vs best serial: {gain:.2f}x "
          f"({'multiplexes' if gain > 1.25 else 'serializes'})")


if __name__ == "__main__":
    main()
