"""Microbench: the XLA seg-head chain (fwd+bwd) vs its matmul-only floor.

Measures the WHOLE head standalone at the flagship shape: B=64 (Siamese
dup), N=2048, inputs 1088 (global+cat, broadcast) + 192 (stage concat),
head 256/256/128 -> 50 logits, dropout keep (0.6, 0.6, None), BN training
semantics, bf16 compute, grad wrt params, rbg dropout stream. Run under
axon (PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_head.py).
Conclusion (docs/kernels.md "Fused seg head"): the head is bound by its
intermediates' HBM round trips, not BN/convert fusions — a whole-head
Pallas block was rejected on these numbers.
"""
import time

import jax
import jax.numpy as jnp

from weaksuppointcloudseg_tpu.models import layers

B, N = 64, 2048
CG, CP = 1088, 192
HEAD = (256, 256, 128)
OUT = 50
KEEP = (0.6, 0.6, None)
DISPATCH_MS = 0.385


def init():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    params, state = {}, {}
    p, s = layers.init_conv(ks[0], CG + CP, HEAD[0])
    params["c1"], state["c1"] = p, s
    p, s = layers.init_conv(ks[1], HEAD[0], HEAD[1])
    params["c2"], state["c2"] = p, s
    p, s = layers.init_conv(ks[2], HEAD[1], HEAD[2])
    params["c3"], state["c3"] = p, s
    p, s = layers.init_conv(ks[3], HEAD[2], OUT, bn=False)
    params["out"], state["out"] = p, s
    return params, state


def head(params, state, g, cp, rng, *, bn=True):
    kw = dict(training=True, bn_decay=0.9, bn=bn)
    if bn:
        h, _ = layers.apply_conv_bcast(params["c1"], state["c1"], g, cp,
                                       training=True, bn_decay=0.9)
    else:
        w = params["c1"]["w"]
        yg = jnp.einsum("bi,io->bo", g, w[:CG].astype(g.dtype),
                        preferred_element_type=jnp.float32)
        yp = jnp.einsum("bni,io->bno", cp, w[CG:].astype(cp.dtype),
                        preferred_element_type=jnp.float32)
        h = jax.nn.relu(yg[:, None, :] + yp + params["c1"]["b"]).astype(cp.dtype)
    rngs = jax.random.split(rng, 2)
    h = layers.dropout(h, rngs[0], KEEP[0], training=True)
    h, _ = layers.apply_conv(params["c2"], state["c2"], h, **kw)
    h = layers.dropout(h, rngs[1], KEEP[1], training=True)
    h, _ = layers.apply_conv(params["c3"], state["c3"], h, **kw)
    logits, _ = layers.apply_conv(params["out"], {}, h, training=True,
                                  bn_decay=None, bn=False, relu=False)
    return logits.astype(jnp.float32)


def loss_fn(params, state, g, cp, y, rng, *, bn=True):
    logits = head(params, state, g, cp, rng, bn=bn)
    lse = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.sum(jax.nn.one_hot(y, OUT) * lse, -1))


def bench(fn, args, reps=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaf = out[0] if isinstance(out, tuple) else out
    leaf = jax.tree_util.tree_leaves(leaf)[0]
    _ = float(jnp.sum(leaf))
    dt = (time.perf_counter() - t0) / reps * 1e3
    return dt - DISPATCH_MS


def main():
    params, state = init()
    dt = jnp.bfloat16
    g = jax.random.normal(jax.random.PRNGKey(1), (B, CG), dt)
    cp = jax.random.normal(jax.random.PRNGKey(2), (B, N, CP), dt)
    y = jax.random.randint(jax.random.PRNGKey(3), (B, N), 0, OUT)
    rng = jax.random.key(4, impl="rbg")

    grad_bn = jax.jit(jax.grad(lambda p: loss_fn(p, state, g, cp, y, rng, bn=True)))
    grad_nobn = jax.jit(jax.grad(lambda p: loss_fn(p, state, g, cp, y, rng, bn=False)))
    fwd_bn = jax.jit(lambda p: loss_fn(p, state, g, cp, y, rng, bn=True))
    fwd_nobn = jax.jit(lambda p: loss_fn(p, state, g, cp, y, rng, bn=False))

    print("fwd  bn   :", round(bench(fwd_bn, (params,)), 3), "ms")
    print("fwd  nobn :", round(bench(fwd_nobn, (params,)), 3), "ms")
    print("f+b  bn   :", round(bench(grad_bn, (params,)), 3), "ms")
    print("f+b  nobn :", round(bench(grad_nobn, (params,)), 3), "ms")


if __name__ == "__main__":
    main()
