"""Isolate per-iteration overhead of chained fori_loop timing on axon TPU."""

from __future__ import annotations

import json
import time


def main():
    import jax
    import jax.numpy as jnp

    from l3ster_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    n = 202612
    r = {}

    def run(name, K, make):
        f = jax.jit(make(K))
        x = jnp.ones((n,), jnp.float32)
        float(jnp.sum(f(x)))
        t0 = time.perf_counter()
        s = float(jnp.sum(f(x)))
        r[name] = round((time.perf_counter() - t0) / K * 1e3, 5)

    def scale_loop(K):
        def f(x):
            def body(i, v):
                return v * 1.0000001 + 1e-9

            return jax.lax.fori_loop(0, K, body, x)

        return f

    def axpy_sum_loop(K):
        def f(x):
            def body(i, v):
                out = v * 1.5 + 0.5 * v
                return v + 1e-30 * jnp.sum(out)

            return jax.lax.fori_loop(0, K, body, x)

        return f

    def axpy_nosum_loop(K):
        def f(x):
            def body(i, v):
                return v * 1.0000001 + 0.0000001 * v

            return jax.lax.fori_loop(0, K, body, x)

        return f

    def sum_only_loop(K):
        def f(x):
            def body(i, v):
                return v + 1e-30 * jnp.sum(v)

            return jax.lax.fori_loop(0, K, body, x)

        return f

    run("scale K=1000", 1000, scale_loop)
    run("axpy+sum K=200", 200, axpy_sum_loop)
    run("axpy nosum K=1000", 1000, axpy_nosum_loop)
    run("sum only K=200", 200, sum_only_loop)
    run("sum only K=1000", 1000, sum_only_loop)
    print(json.dumps(r, indent=1))


if __name__ == "__main__":
    main()
