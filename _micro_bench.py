"""Micro-bench: backup & gather variants on the real chip."""
import time
import jax, jax.numpy as jnp

A, V, G, D = 7, 64, 16384, 42
key = jax.random.key(0)
ks = jax.random.split(key, 8)
q = jax.random.uniform(ks[0], (A, V, G))
visits = jnp.floor(jax.random.uniform(ks[1], (A, V, G)) * 5)
policy = jax.random.uniform(ks[2], (A, V, G))
length = jax.random.randint(ks[3], (G,), 1, 12)
darange = jnp.arange(D)[:, None]
nodes = jnp.where(darange < length[None, :],
                  jax.random.randint(ks[4], (D, G), 0, V), -1)
actions = jax.random.randint(ks[5], (D, G), 0, A)
leaf_value = jax.random.uniform(ks[6], (G,))
uptodate = jnp.ones((V, G), bool)


def timeit(name, fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1000:8.2f} ms")
    return out


# ---- backup: while_loop (current) ----
def backup_while(q, visits, uptodate):
    act_ids = jnp.arange(A)[:, None]
    max_len = jnp.max(length)

    def cond(st):
        _, _, _, d = st
        return d < max_len

    def body(st):
        q, visits, uptodate, d = st
        nd = nodes[d]
        ac = actions[d]
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


# ---- backup: einsum over depth ----
def backup_einsum(q, visits, uptodate):
    valid = nodes >= 0
    k = length[None, :] - 1 - darange
    contrib = jnp.where(k % 2 == 0, 1.0 - leaf_value[None, :],
                        leaf_value[None, :])
    contrib = jnp.where(valid, contrib, 0.0)
    node_f = ((nodes[:, None, :] == jnp.arange(V)[None, :, None])
              & valid[:, None, :]).astype(jnp.float32)  # [D, V, G]
    act_f = ((actions[:, None, :] == jnp.arange(A)[None, :, None])
             & valid[:, None, :]).astype(jnp.float32)  # [D, A, G]
    hit = jnp.einsum('dvg,dag->avg', node_f, act_f)
    csum = jnp.einsum('dvg,dag->avg', node_f, act_f * contrib[:, None, :])
    edge = hit > 0.5
    newq = (visits * q + csum) / (visits + 1.0)
    q = jnp.where(edge, newq, q)
    visits = visits + hit
    uptodate = uptodate & ~(node_f.any(axis=0) if node_f.dtype == bool
                            else (node_f.sum(0) > 0.5))
    return q, visits, uptodate


# ---- backup: scatter-add ----
def backup_scatter(q, visits, uptodate):
    valid = nodes >= 0
    k = length[None, :] - 1 - darange
    contrib = jnp.where(k % 2 == 0, 1.0 - leaf_value[None, :],
                        leaf_value[None, :])
    contrib = jnp.where(valid, contrib, 0.0)
    gidx = jnp.broadcast_to(jnp.arange(G)[None, :], (D, G))
    nd = jnp.where(valid, nodes, 0)
    hit = jnp.zeros((A, V, G)).at[actions, nd, gidx].add(
        valid.astype(jnp.float32))
    csum = jnp.zeros((A, V, G)).at[actions, nd, gidx].add(contrib)
    edge = hit > 0.5
    newq = (visits * q + csum) / (visits + 1.0)
    q = jnp.where(edge, newq, q)
    visits = visits + hit
    upd = jnp.zeros((V, G), bool).at[nd, gidx].set(valid, mode="drop")
    uptodate = uptodate & ~upd
    return q, visits, uptodate


r1 = timeit("backup while_loop", jax.jit(backup_while), q, visits, uptodate)
r2 = timeit("backup einsum", jax.jit(backup_einsum), q, visits, uptodate)
r3 = timeit("backup scatter-add", jax.jit(backup_scatter), q, visits, uptodate)
for nm, r in (("einsum", r2), ("scatter", r3)):
    ok = all(bool(jnp.allclose(a, b, atol=1e-5)) for a, b in
             [(r1[0], r[0]), (r1[1], r[1])]) and bool(jnp.all(r1[2] == r[2]))
    print(f"  {nm} matches while_loop: {ok}")

# ---- gather variants: policy at per-game node ----
node = jax.random.randint(ks[7], (G,), 0, V)


def gather_onehot(policy, node):
    oh = jnp.arange(V)[:, None] == node[None, :]
    return jnp.where(oh[None], policy, 0).sum(axis=1)


def gather_take(policy, node):
    return jnp.take_along_axis(policy, node[None, None, :], axis=1)[:, 0, :]


g1 = timeit("gather one-hot [A,V,G]->[A,G]", jax.jit(gather_onehot), policy, node)
g2 = timeit("gather take_along_axis", jax.jit(gather_take), policy, node)
print("  gathers match:", bool(jnp.allclose(g1, g2)))

# one-hot matmul gather: [A,V,G] x onehot -> einsum 'avg,vg->ag'
def gather_mm(policy, node):
    oh = (jnp.arange(V)[:, None] == node[None, :]).astype(jnp.float32)
    return jnp.einsum('avg,vg->ag', policy, oh)

g3 = timeit("gather einsum", jax.jit(gather_mm), policy, node)
print("  gathers match:", bool(jnp.allclose(g1, g3)))
