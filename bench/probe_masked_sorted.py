"""Masked scan on species-sorted-like data: candidates cluster near the
diagonal, so most column tiles have no candidate pair and skip."""
import functools, sys, time
import pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp
from sketchtpu.runtime import enable_compilation_cache
enable_compilation_cache()
from sketchtpu.dist.knn_jax import _knn_scan_block_packed
from sketchtpu.dist.pallas_kernels import chunk_group_major

S64, TR, NB, TC, KNN, S = 16, 2048, 65536, 8192, 50, 100
W2 = S64 * 14 * 2
a = jax.random.bits(jax.random.PRNGKey(0), (TR, W2), dtype=jnp.uint32)
b = jax.random.bits(jax.random.PRNGKey(1), (NB, W2), dtype=jnp.uint32)
a_cm = chunk_group_major(a, S64)
b_cm_t = chunk_group_major(b, S64).T.copy()

rng = np.random.default_rng(2)
# species blocks of ~4096 samples; samples only share signs within their
# block (the reference reorders by species for exactly this locality)
blk = 4096
base = rng.integers(0, 1 << 15, (NB // blk, S), dtype=np.int32)
b_sig_np = np.where(rng.random((NB, S)) < 0.3,
                    np.repeat(base, blk, axis=0),
                    rng.integers(1 << 15, 1 << 16, (NB, S), dtype=np.int32) + np.arange(NB)[:, None] % 97 * 0)
# make non-shared signs unique-ish per sample so cross-block pairs share nothing
b_sig_np = np.where(rng.random((NB, S)) < 0.3, np.repeat(base, blk, axis=0),
                    (np.arange(NB)[:, None] * 131 + np.arange(S)[None, :] * 7919) % 50000 + 16384)
a_sig_np = b_sig_np[:TR]  # row block = first species block(s)
a_sig = jnp.asarray(a_sig_np.astype(np.int32))
b_sig = jnp.asarray(b_sig_np.astype(np.int32))

shared_frac = float(((a_sig_np[:64, None, :] == b_sig_np[None, ::997, :]).any(axis=2)).mean())
print(f"sample of pair candidate fraction: {shared_frac:.4f}", flush=True)

@functools.partial(jax.jit, static_argnames=("inner",))
def chain(salt, inner):
    def body(_, s):
        v, i = _knn_scan_block_packed(
            a_cm ^ s, b_cm_t, jnp.int32(0), jnp.int32(NB),
            S64, KNN, TC, True, True, a_sig=a_sig, b_sig=b_sig, masked=True)
        return ((v.sum() + i.sum()).astype(jnp.uint32) ^ jnp.uint32(1)) + s * 0
    return jax.lax.fori_loop(0, inner, body, salt)

def timeit(chain, inner=5):
    float(chain(jnp.uint32(0), 1)); float(chain(jnp.uint32(0), inner))
    best = float('inf')
    for t in range(2):
        t0=time.perf_counter(); float(chain(jnp.uint32(1+t),1))
        t1=time.perf_counter(); float(chain(jnp.uint32(64+t),inner))
        t2=time.perf_counter(); best=min(best, ((t2-t1)-(t1-t0))/(inner-1))
    return best

dt = timeit(chain)
pairs = TR * NB
print(f"masked scan, species-clustered signs: {dt*1e3:.2f} ms/block -> "
      f"{pairs/dt/1e9:.2f} G pair/s (dense-random reference: 2.30)", flush=True)
