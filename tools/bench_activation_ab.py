"""A/B: activation cost in the shipped U-FNO depth-1 train step.

Round-3 finding (BASELINE.md "Roofline + activation probe"): 127 ms (22%)
of the 581 ms step was exact-erf GELU transcendental time on the VPU,
hidden inside the loop fusions and misread as a bandwidth floor. Measured
here by swapping the activation in the otherwise-identical shipped step:

    mode=base         exact-erf GELU (torch-default semantics)  27.5 samples/s
    mode=relu         ReLU (upper bound, NOT semantics)          35.2
    mode=tanh_approx  tanh-approx GELU (jax.nn.gelu default)     34.4

Run one mode per invocation (each non-base mode is a fresh ~20 min remote
compile): python tools/bench_activation_ab.py [base|relu|tanh_approx|micro]

`micro` instead times isolated activation passes on the hot fusion operand
shape bf16[16,132,132,388], chaining K applications inside one jit so the
axon per-dispatch cost (~2.4 ms) cancels.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def full_step(mode):
    import nps_tpu.models.activations as acts

    # the flagship now ships GELUTanh, so patch BOTH activation classes —
    # 'base' re-measures exact erf on today's model; historical note: the
    # round-3 A/B that found the erf cost patched GELU when the model
    # still held GELU instances
    def set_act(fn):
        acts.GELU.__call__ = lambda self, x: fn(x)
        acts.GELUTanh.__call__ = lambda self, x: fn(x)

    import jax

    if mode == "relu":
        set_act(jax.nn.relu)
    elif mode == "tanh_approx":
        set_act(lambda x: jax.nn.gelu(x, approximate=True))
    elif mode == "base":
        set_act(lambda x: jax.nn.gelu(x, approximate=False))

    from bench import build_trainer, bench_depth
    trainer, device_batch = build_trainer()
    sps, flops, dt = bench_depth(trainer, device_batch, 1, n_steps=10)
    print(json.dumps({"mode": mode, "samples_per_sec": round(sps, 2),
                      "ms_per_step": round(dt * 1e3, 1)}), flush=True)


def micro():
    import jax
    import jax.numpy as jnp

    shape = (16, 132, 132, 388)
    n_elem = 1
    for s in shape:
        n_elem *= s
    nbytes = 2 * n_elem * 2  # read + write per pass, bf16

    ops = {
        "scale": lambda v: v * jnp.bfloat16(1.0009765625),
        "relu": lambda v: jax.nn.relu(v) + jnp.bfloat16(0.125),
        "gelu_exact": lambda v: jax.nn.gelu(v, approximate=False),
        "gelu_tanh": lambda v: jax.nn.gelu(v, approximate=True),
    }

    def chain(op, k):
        @jax.jit
        def f(v):
            for _ in range(k):
                v = op(v)
            return jnp.sum(v, dtype=jnp.float32)
        return f

    def timeit(fn, x, n=10):
        float(fn(x))  # compile; host readback forces completion on axon
        t0 = time.perf_counter()
        for _ in range(n):
            float(fn(x))
        return (time.perf_counter() - t0) / n

    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
    k = 33
    out = {}
    for name, op in ops.items():
        t1, tk = timeit(chain(op, 1), x), timeit(chain(op, k), x)
        per_pass = (tk - t1) / (k - 1)
        out[name] = {"ms_per_pass": round(per_pass * 1e3, 3),
                     "GBps": round(nbytes / per_pass / 1e9, 1)}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "base"
    if mode == "micro":
        micro()
    else:
        full_step(mode)
