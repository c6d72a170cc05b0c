"""On-TPU parity + timing for the Pallas backup kernel vs the jnp path."""
import time
import jax, jax.numpy as jnp
import numpy as np
from alphatpu.mcts.pallas_kernels import backup_pallas

A, V, G, D = 7, 64, 16384, 42
rng = np.random.default_rng(0)
q = (rng.random((A, V, G)) * 0.9).astype(np.float32)
visits = rng.integers(0, 20, (A, V, G)).astype(np.float32)
uptodate = np.ones((V, G), bool)
length = rng.integers(1, 12, G).astype(np.int32)
# distinct nodes per depth per game (real paths visit distinct nodes)
perm = np.argsort(rng.random((D, G)), axis=0).astype(np.int32)
nodes = np.where(np.arange(D)[:, None] < length[None, :], perm, -1)
actions = rng.integers(0, A, (D, G)).astype(np.int32)
leaf_value = rng.random(G).astype(np.float32)

args = [jnp.asarray(x) for x in
        (q, visits, uptodate, nodes, actions, length, leaf_value)]


@jax.jit
def jnp_ref(q, visits, uptodate, nodes, actions, length, leaf_value):
    act_ids = jnp.arange(A)[:, None]
    max_len = jnp.max(length)

    def cond(st):
        return st[-1] < max_len

    def body(st):
        q, visits, uptodate, d = st
        nd, ac = nodes[d], actions[d]
        valid = nd >= 0
        k = length - 1 - d
        contrib = jnp.where(k % 2 == 0, 1.0 - leaf_value, leaf_value)
        oh = (jnp.arange(V)[:, None] == nd[None, :]) & valid[None, :]
        edge = (act_ids == ac[None, :])[:, None, :] & oh[None]
        newq = (visits * q + contrib[None, None, :]) / (visits + 1.0)
        q = jnp.where(edge, newq, q)
        visits = jnp.where(edge, visits + 1.0, visits)
        uptodate = uptodate & ~oh
        return q, visits, uptodate, d + 1

    q, visits, uptodate, _ = jax.lax.while_loop(
        cond, body, (q, visits, uptodate, jnp.int32(0)))
    return q, visits, uptodate


got = jax.device_get(backup_pallas(*args))
want = jax.device_get(jnp_ref(*args))
print("q diff:", np.abs(got[0] - want[0]).max(),
      "visits diff:", np.abs(got[1] - want[1]).max(),
      "uptodate equal:", bool((got[2] == want[2]).all()))


def timeit(name, fn, n=30):
    out = fn(*args)
    jax.device_get(out[0][0, 0, 0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(out[0][0, 0, 0])
    print(f"{name}: {(time.time()-t0)/n*1000:.3f} ms")


timeit("pallas backup", lambda *a: backup_pallas(*a))
timeit("jnp backup", jnp_ref)
