"""coreacc_pallas block-geometry sweep (round 3).

Best-of-3 RTT-cancelled at nk=7, n=2048: 128x512 471 / 128x1024 446 /
128x2048 359 / 256x512 397 M pair/s -> the long-standing 128x512 default
stands. A single-trial sweep earlier the same day read 128x1024 at
631 M pair/s — tunnel-window noise (the same config re-measures 446
best-of-3); treat any single-trial figure from this rig as +-30%.
"""
import functools, sys, time, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
from sketchtpu.runtime import enable_compilation_cache
enable_compilation_cache()
from sketchtpu.dist.coreacc_pallas import chunk_major, coreacc_pallas
S64 = 16
W2 = S64 * 14 * 2
KMERS = (17, 21, 25, 29, 31, 33, 37)
N = 2048
stack = jax.random.bits(jax.random.PRNGKey(2), (len(KMERS), N, W2), dtype=jnp.uint32)
ac = chunk_major(stack, S64)
btc = jnp.transpose(ac)
def timeit(chain, inner=5):
    float(chain(jnp.uint32(0), 1)); float(chain(jnp.uint32(0), inner))
    best = float('inf')
    for t in range(3):
        t0=time.perf_counter(); float(chain(jnp.uint32(1+t),1))
        t1=time.perf_counter(); float(chain(jnp.uint32(16+t),inner))
        t2=time.perf_counter(); best=min(best, ((t2-t1)-(t1-t0))/(inner-1))
    return best
for ti, tj in ((128, 512), (128, 1024), (128, 2048), (256, 512)):
    @functools.partial(jax.jit, static_argnames=("inner",))
    def chain(salt, inner, ti=ti, tj=tj):
        def body(_, s):
            r = coreacc_pallas(ac ^ s, btc, S64, KMERS, 1024, ti=ti, tj=tj)
            return (r.sum().astype(jnp.uint32) ^ jnp.uint32(1)) + s * 0
        return jax.lax.fori_loop(0, inner, body, salt)
    try:
        dt = timeit(chain)
        print(f"ti={ti:4d} tj={tj:4d}: {dt*1e3:7.2f} ms -> {N*N/dt/1e6:6.0f} M pair/s", flush=True)
    except Exception as e:
        print(f"ti={ti} tj={tj}: FAIL {str(e).splitlines()[0][:90]}", flush=True)
