#!/usr/bin/env python
"""Measure XLA gather/scatter/segment_sum rates at the shapes the explicit
Schur-complement path needs (ladybug-1723 scale):

  g1: gather (Np=2.9M, 18) rows from an (O=680k, 18) table  [pair L/R fetch]
  g2: gather (Nd=0.8M, 6) rows from a (C=1723, 6) table     [per-CG x fetch]
  s1: scatter-set unique sorted (Nd, 36) rows into (C^2, 36) [densify S]
  ss: segment_sum (Np, 36) -> Nd, sorted keys                [pair reduce]
  mv: dense (6C, 6C) @ (6C,) matvec                          [per-CG matvec]
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 20
rng = np.random.default_rng(0)

O, Np, Nd, C = 678912, 2_900_000, 800_000, 1723
Np = (Np // 2048) * 2048
Nd = (Nd // 2048) * 2048


def timeit_loop(body, carry, n=4):
    @jax.jit
    def run(carry):
        out = jax.lax.fori_loop(0, REPS, lambda _, c: body(c), carry)
        return jax.tree.map(lambda x: jnp.sum(x) if hasattr(x, "ndim") and x.ndim else x, out)

    _ = jax.tree.map(float, run(carry))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        _ = jax.tree.map(float, run(carry))
        best = min(best, time.perf_counter() - t0)
    return best / REPS


tab18 = jnp.asarray(rng.standard_normal((O, 18)), jnp.float32)
idx_np = jnp.asarray(rng.integers(0, O, Np).astype(np.int32))


def g1(c):
    tab, acc = c
    g = tab[idx_np]
    return (tab, acc + g[:1, :1])


t = timeit_loop(g1, (tab18, jnp.zeros((1, 1))))
print(f"g1 gather (Np,18)<-(O,18): {t*1e3:7.2f} ms  ({Np*18*4/t/1e9:6.1f} GB/s)")

tabC = jnp.asarray(rng.standard_normal((C, 6)), jnp.float32)
idx_nd = jnp.asarray(np.sort(rng.integers(0, C, Nd)).astype(np.int32))


def g2(c):
    tab, acc = c
    g = tab[idx_nd]
    return (tab, acc + g[:1, :1])


t = timeit_loop(g2, (tabC, jnp.zeros((1, 1))))
print(f"g2 gather (Nd,6)<-(C,6):   {t*1e3:7.2f} ms  ({Nd*6*4/t/1e9:6.1f} GB/s)")

# densify: scatter-set with unique sorted indices
keys = np.sort(rng.choice(C * C, Nd, replace=False)).astype(np.int32)
keys_j = jnp.asarray(keys)
vals = jnp.asarray(rng.standard_normal((Nd, 36)), jnp.float32)
Sflat = jnp.zeros((C * C, 36), jnp.float32)


def s1(c):
    v, acc = c
    S = jnp.zeros((C * C, 36), jnp.float32).at[keys_j].set(
        v, indices_are_sorted=True, unique_indices=True)
    return (v, acc + S[:1, :1])


t = timeit_loop(s1, (vals, jnp.zeros((1, 1))), n=3)
print(f"s1 densify set (C^2,36):   {t*1e3:7.2f} ms  ({C*C*36*4/t/1e9:6.1f} GB/s write)")

# segment_sum pairs->distinct, sorted keys, avg run ~3.6
seg = np.sort(rng.integers(0, Nd, Np)).astype(np.int32)
seg_j = jnp.asarray(seg)
pv = jnp.asarray(rng.standard_normal((Np, 36)), jnp.float32)


def ss(c):
    v, acc = c
    s = jax.ops.segment_sum(v, seg_j, Nd, indices_are_sorted=True)
    return (v, acc + s[:1, :1])


t = timeit_loop(ss, (pv, jnp.zeros((1, 1))), n=3)
print(f"ss segsum (Np,36)->Nd:     {t*1e3:7.2f} ms")

# dense matvec
n = 6 * C
S = jnp.asarray(rng.standard_normal((n, n)) * 0.01, jnp.float32)


def mv(c):
    S, x, acc = c
    y = S @ x
    return (S, y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30), acc)


t = timeit_loop(mv, (S, jnp.ones((n,)), jnp.zeros((1, 1))))
print(f"mv dense ({n},{n})@vec:    {t*1e3:7.2f} ms  ({n*n*4/t/1e9:6.1f} GB/s)")

# batched 6x6 block einsum at Nd scale (matvec alternative on compact blocks)
blk = jnp.asarray(rng.standard_normal((Nd, 6, 6)), jnp.float32)
xg = jnp.asarray(rng.standard_normal((Nd, 6)), jnp.float32)


def be(c):
    x, acc = c
    y = jnp.einsum("kij,kj->ki", blk, x)
    return (x + y * 1e-9, acc)


t = timeit_loop(be, (xg, jnp.zeros((1, 1))))
print(f"be einsum (Nd,6,6)@(Nd,6): {t*1e3:7.2f} ms  ({Nd*36*4/t/1e9:6.1f} GB/s)")
