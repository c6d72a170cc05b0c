import time
import jax, jax.numpy as jnp
import numpy as np
from alphatpu.mcts.pallas_kernels import refresh_policies_pallas
from alphatpu.mcts.newton import regularized_policy

A, V, G = 7, 64, 16384
rng = np.random.default_rng(0)
prior = rng.random((A, V, G), dtype=np.float32)
prior[rng.random((A, V, G)) < 0.4] = 0
prior[0] = np.maximum(prior[0], 0.05)
prior /= np.maximum(prior.sum(0, keepdims=True), 1e-30)
q = (rng.random((A, V, G)) * 0.9).astype(np.float32)
visits = rng.integers(0, 20, (A, V, G)).astype(np.float32)
q[visits == 0] = 0; q[prior == 0] = 0; visits[prior == 0] = 0
policy = rng.random((A, V, G), dtype=np.float32)
stale = rng.random((V, G)) < 0.5

args = [jnp.asarray(x) for x in (prior, q, visits, policy)] + [jnp.asarray(stale)]

got = refresh_policies_pallas(*args, cpuct=1.5)
got_np = jax.device_get(got)

@jax.jit
def jnp_ref(prior, q, visits, policy, stale):
    pi = regularized_policy(prior, q, visits, 1.5)
    return jnp.where(stale[None], pi, policy)

want = jax.device_get(jnp_ref(*args))
print("max abs diff:", np.abs(got_np - want).max())

def timeit(name, fn, n=30):
    out = fn(*args); jax.device_get(out[0,0,0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(out[0,0,0])
    print(f"{name}: {(time.time()-t0)/n*1000:.3f} ms")

timeit("pallas", lambda *a: refresh_policies_pallas(*a, cpuct=1.5))
timeit("jnp   ", jnp_ref)
