#!/usr/bin/env python
"""Microbenchmark: AoS (O, di, dj) einsums vs SoA (di*dj, O) lane-major ops.

Methodology for the remote axon backend: per-call dispatch is ~23 ms and
block_until_ready can return early, so each candidate op chain is iterated
REPS times inside one jitted lax.fori_loop and completion is forced by
fetching a scalar. Reported time = (t_total - t_dispatch_floor) / REPS.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

O = 226304 * 3  # ladybug-1723 scale
REPS = 50
rng = np.random.default_rng(0)


def timeit_loop(body, init, n=5):
    """body: carry -> carry, iterated REPS times inside one jit."""

    @jax.jit
    def run(carry):
        def f(_, c):
            return body(c)
        out = jax.lax.fori_loop(0, REPS, f, carry)
        return jax.tree.map(lambda x: jnp.sum(x) if x.ndim else x, out)

    _ = jax.tree.map(float, run(init))  # compile + warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        _ = jax.tree.map(float, run(init))
        best = min(best, time.perf_counter() - t0)
    return best / REPS


# --- AoS: W (O,6,3), x (O,6), u (O,3)
W_aos = jnp.asarray(rng.standard_normal((O, 6, 3)), jnp.float32)
x_aos = jnp.asarray(rng.standard_normal((O, 6)), jnp.float32)
u_aos = jnp.asarray(rng.standard_normal((O, 3)), jnp.float32)


def aos_body(c):
    W, x, u = c
    t = jnp.einsum("oij,oi->oj", W, x)
    z = jnp.einsum("oij,oj->oi", W, u + t)
    # feed result back so the loop can't be collapsed
    return (W, x + z[:, :2].sum(-1, keepdims=True), u + t * 0.001)


t_aos = timeit_loop(aos_body, (W_aos, x_aos, u_aos))

# --- SoA: W (18, O) rows = W[i,j]; x (6, O); u (3, O)
W_soa = jnp.asarray(np.asarray(W_aos).transpose(1, 2, 0).reshape(18, O))
x_soa = jnp.asarray(np.asarray(x_aos).T)
u_soa = jnp.asarray(np.asarray(u_aos).T)


def soa_body(c):
    W, x, u = c
    Wr = W.reshape(6, 3, O)
    t = jnp.einsum("ijo,io->jo", Wr, x)
    z = jnp.einsum("ijo,jo->io", Wr, u + t)
    return (W, x + z[:2].sum(0, keepdims=True), u + t * 0.001)


t_soa = timeit_loop(soa_body, (W_soa, x_soa, u_soa))

# --- gathers
C = 1723
cam_idx = jnp.asarray(np.sort(rng.integers(0, C, O)).astype(np.int32))
tab_aos = jnp.asarray(rng.standard_normal((C, 6)), jnp.float32)
tab_soa = jnp.asarray(np.asarray(tab_aos).T)


def g_aos_body(c):
    tab, acc = c
    g = tab[cam_idx]                      # (O, 6)
    return (tab + acc[:1, :1] * 1e-9, g[:C])


def g_soa_body(c):
    tab, acc = c
    g = tab[:, cam_idx]                   # (6, O)
    return (tab + acc[:1, :1] * 1e-9, g[:, :C])


t_g_aos = timeit_loop(g_aos_body, (tab_aos, jnp.zeros((C, 6))))
t_g_soa = timeit_loop(g_soa_body, (tab_soa, jnp.zeros((6, C))))

# --- segment-sum style: jax segsum AoS vs SoA orientation
P = 156502
pt_idx = jnp.asarray(np.sort(rng.integers(0, P, O)).astype(np.int32))


def ss_aos_body(c):
    v, acc = c
    s = jax.ops.segment_sum(v, pt_idx, P, indices_are_sorted=True)
    return (v + acc[:1, :1] * 1e-9, s)


t_ss_aos = timeit_loop(ss_aos_body, (u_aos, jnp.zeros((P, 3))))

print(f"O={O} REPS={REPS}")
print(f"einsum chain per-rep  AoS: {t_aos*1e3:7.3f} ms   SoA: {t_soa*1e3:7.3f} ms   speedup {t_aos/max(t_soa,1e-12):5.1f}x")
print(f"gather       per-rep  AoS: {t_g_aos*1e3:7.3f} ms   SoA: {t_g_soa*1e3:7.3f} ms")
print(f"segsum(P)    per-rep  AoS: {t_ss_aos*1e3:7.3f} ms")
