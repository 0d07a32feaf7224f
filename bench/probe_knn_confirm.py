"""Head-to-head best-of-3 confirmation of the kNN scan kernel geometry
(one process, same inputs): 512x512 2.79 / 256x1024 2.44 / 512x1024 2.62
G pair/s — the 512x512 default is real, not single-trial tunnel noise
(cf. bench/probe_ca_geometry.py where a 631 reading evaporated)."""
import functools, sys, time, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
from sketchtpu.runtime import enable_compilation_cache
enable_compilation_cache()
from sketchtpu.dist.knn_jax import _knn_scan_block_packed
from sketchtpu.dist.pallas_kernels import chunk_group_major

S64, TR, NB, TC, KNN = 16, 2048, 65536, 8192, 50
W2 = S64 * 14 * 2
a = jax.random.bits(jax.random.PRNGKey(0), (TR, W2), dtype=jnp.uint32)
b = jax.random.bits(jax.random.PRNGKey(1), (NB, W2), dtype=jnp.uint32)
a_cm = chunk_group_major(a, S64)
b_cm_t = chunk_group_major(b, S64).T.copy()

def timeit(chain, inner=5, trials=3):
    float(chain(jnp.uint32(0), 1)); float(chain(jnp.uint32(0), inner))
    best = float('inf')
    for t in range(trials):
        t0=time.perf_counter(); float(chain(jnp.uint32(1+t),1))
        t1=time.perf_counter(); float(chain(jnp.uint32(64+t),inner))
        t2=time.perf_counter(); best=min(best, ((t2-t1)-(t1-t0))/(inner-1))
    return best

for ti, tj in ((512, 512), (256, 1024), (512, 1024)):
    @functools.partial(jax.jit, static_argnames=("inner",))
    def chain(salt, inner, ti=ti, tj=tj):
        def body(_, s):
            v, i = _knn_scan_block_packed(
                a_cm ^ s, b_cm_t, jnp.int32(0), jnp.int32(NB),
                S64, KNN, TC, True, True, ti=ti, tj=tj)
            return ((v.sum() + i.sum()).astype(jnp.uint32) ^ jnp.uint32(1)) + s * 0
        return jax.lax.fori_loop(0, inner, body, salt)
    dt = timeit(chain)
    print(f"full scan ti={ti:3d} tj={tj:4d}: {dt*1e3:6.2f} ms/block -> {TR*NB/dt/1e9:5.2f} G pair/s", flush=True)
