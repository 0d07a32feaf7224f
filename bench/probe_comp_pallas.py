"""Transfer-free rate probe for the corrected (completeness) Pallas
core/accessory tile vs the uncorrected one.

validate_chip.py step3 timed `np.asarray(coreacc_pallas(...))`, which
forces the full (na, nb, 2) f32 output across the tunneled device->host
link — that measured the tunnel, not the kernel. This probe chains salted
iterations on device (same protocol as bench.py) so only a scalar crosses
the link.
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

from sketchtpu.runtime import enable_compilation_cache

enable_compilation_cache()

from sketchtpu.dist.coreacc_pallas import chunk_major, coreacc_pallas

s64 = 16
w2 = s64 * 14 * 2
kmers = (17, 21, 25, 29, 31, 33, 37)
na, nb = 1024, 2048

stack_a = jax.random.bits(
    jax.random.PRNGKey(0), (len(kmers), na, w2), dtype=jnp.uint32
)
stack_b = jax.random.bits(
    jax.random.PRNGKey(1), (len(kmers), nb, w2), dtype=jnp.uint32
)
a_cm = chunk_major(stack_a, s64)
bt = jnp.transpose(chunk_major(stack_b, s64))
c1 = jax.random.uniform(jax.random.PRNGKey(2), (na,), jnp.float32, 0.7, 1.0)
c2 = jax.random.uniform(jax.random.PRNGKey(3), (nb,), jnp.float32, 0.7, 1.0)


@functools.partial(jax.jit, static_argnames=("comp", "inner"))
def probe(a, bt, c1, c2, salt, comp, inner):
    def body(_, s):
        if comp:
            r = coreacc_pallas(
                a ^ s, bt, s64, kmers, 1024, ti=128, tj=512,
                c1=c1, c2=c2, cutoff=0.64,
            )
        else:
            r = coreacc_pallas(a ^ s, bt, s64, kmers, 1024, ti=128, tj=512)
        return r.sum().astype(jnp.uint32) ^ jnp.uint32(1)

    return jax.lax.fori_loop(0, inner, body, salt)


for comp in (False, True):
    float(probe(a_cm, bt, c1, c2, jnp.uint32(0), comp, 4))
    t0 = time.time()
    s = jnp.uint32(1)
    for _ in range(3):
        s = probe(a_cm, bt, c1, c2, s, comp, 4)
    float(s)
    dt = (time.time() - t0) / 12
    print(
        f"{'corrected' if comp else 'uncorrected'} pallas: "
        f"{na * nb / dt / 1e6:.0f} M pair/s ({dt * 1e3:.1f} ms/tile)"
    )
