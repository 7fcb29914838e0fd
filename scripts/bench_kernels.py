"""Micro-benchmark: fused Pallas attention vs pure-XLA attention.

Times forward and forward+backward across the shapes that occur in VAESNe
towers (bottleneck cross-attention, light-curve grids, 982-token spectra
decoder self-attention). Run on a real TPU:

  python scripts/bench_kernels.py

Prints a table; large-grid rows are where the kernel wins (the XLA path
materializes [B,H,Lq,Lk] probabilities in HBM).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vaesne_tpu.ops import attention_reference, fused_attention
from vaesne_tpu.ops.attention import pack_heads

SHAPES = [
    # (name, B, H, Lq, Lk, Dh)
    ("bottleneck-enc (8q x 983k)", 256, 4, 8, 983, 8),
    ("LC decoder     (60q x 60k)", 256, 4, 60, 60, 8),
    ("spec dec self (982q x 982k)", 256, 4, 982, 982, 8),
    ("spec dec self, K*B=1024", 1024, 4, 982, 982, 8),
]


def _sync(out):
    # honest device sync: read a value that depends on the computation
    # (block_until_ready returns early on the axon tunnel; BASELINE.md)
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.ravel(leaf)[0])


def timeit(fn, *args, iters=8):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    print(f"backend: {jax.default_backend()}  device: {jax.devices()[0]}")
    header = f"{'shape':30s} {'xla fwd':>10s} {'pallas fwd':>11s} {'xla f+b':>10s} {'pallas f+b':>11s}"
    print(header)
    print("-" * len(header))
    for name, B, H, Lq, Lk, Dh in SHAPES:
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 4)
        q = jax.random.normal(ks[0], (B, H, Lq, Dh), jnp.float32)
        k = jax.random.normal(ks[1], (B, H, Lk, Dh), jnp.float32)
        v = jax.random.normal(ks[2], (B, H, Lk, Dh), jnp.float32)
        bias = jnp.where(jax.random.uniform(ks[3], (B, Lk)) < 0.2, -1e9, 0.0)
        qp, kp, vp = pack_heads(q), pack_heads(k), pack_heads(v)

        xla_fwd = jax.jit(lambda q, k, v: attention_reference(q, k, v, bias))
        pls_fwd = jax.jit(
            lambda q, k, v: fused_attention(q, k, v, bias, H, 0.0, False))
        xla_fb = jax.jit(jax.grad(
            lambda q, k, v: jnp.sum(attention_reference(q, k, v, bias) ** 2),
            argnums=(0, 1, 2)))
        pls_fb = jax.jit(jax.grad(
            lambda q, k, v: jnp.sum(fused_attention(q, k, v, bias, H, 0.0,
                                                    False) ** 2),
            argnums=(0, 1, 2)))

        def safe(fn, *args):
            try:
                return timeit(fn, *args)
            except Exception:
                return float("nan")

        tx = safe(xla_fwd, q, k, v)
        tp = safe(pls_fwd, qp, kp, vp)
        txb = safe(xla_fb, q, k, v)
        tpb = safe(pls_fb, qp, kp, vp)
        print(f"{name:30s} {tx * 1e3:9.2f}ms {tp * 1e3:10.2f}ms "
              f"{txb * 1e3:9.2f}ms {tpb * 1e3:10.2f}ms")


if __name__ == "__main__":
    main()
