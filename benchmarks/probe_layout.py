"""Microbench: physical-layout costs of vector ops and the entry transpose.

Times (chained-in-one-jit, scalar readback) on the flagship sizes:
  n_dofs=202612, n_rows=50653, c=4, lattice (37,37,37)
"""

from __future__ import annotations

import json
import time


def timed(fn, args, K=200):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(*a):
        def body(i, carry):
            out = fn(*((carry,) + a[1:]))
            return carry + 1e-30 * jnp.sum(out)

        return jnp.sum(jax.lax.fori_loop(0, K, body, a[0]))

    float(chained(*args))
    t0 = time.perf_counter()
    float(chained(*args))
    return (time.perf_counter() - t0) / K * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from l3ster_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    n_rows, c = 50653, 4
    n = n_rows * c
    r = {}

    x1 = jnp.ones((n, 1), jnp.float32)
    m1 = jnp.ones((n, 1), jnp.float32)
    r["axpy (n,1)"] = timed(lambda v, m: v * m + 0.5 * v, (x1, m1))

    xf = jnp.ones((n,), jnp.float32)
    mf = jnp.ones((n,), jnp.float32)
    r["axpy (n,)"] = timed(lambda v, m: v * m + 0.5 * v, (xf, mf))

    xr = jnp.ones((n_rows, c), jnp.float32)
    r["axpy (n_rows,c)"] = timed(lambda v: v * 1.5 + 0.5 * v, (xr,))

    xc = jnp.ones((c, n_rows), jnp.float32)
    r["axpy (c,n_rows)"] = timed(lambda v: v * 1.5 + 0.5 * v, (xc,))

    # entry transpose variants -> (c, 37, 37, 37)
    r["T: (n,1)->rows.T->field"] = timed(
        lambda v: v.reshape(n_rows, c).T.reshape(c, 37, 37, 37) * 1.0, (x1,)
    )
    r["T: (n,)->rows.T->field"] = timed(
        lambda v: v.reshape(n_rows, c).T.reshape(c, 37, 37, 37) * 1.0, (xf,)
    )
    r["T: (n,)->(z,y,x,c)->moveaxis"] = timed(
        lambda v: jnp.moveaxis(v.reshape(37, 37, 37, c), -1, 0) * 1.0, (xf,)
    )
    xfield = jnp.ones((c, 37, 37, 37), jnp.float32)
    r["T back: field->(n,)"] = timed(
        lambda v: v.reshape(c, n_rows).T.reshape(-1) * 1.0, (xfield,)
    )
    r["axpy field (c,z,y,x)"] = timed(lambda v: v * 1.5 + 0.5 * v, (xfield,))
    r["dot field"] = timed(lambda v: v * jnp.sum(v * v), (xfield,))
    r["dot (n,)"] = timed(lambda v: v * jnp.sum(v * v), (xf,))
    r["dot (n,1)"] = timed(lambda v: v * jnp.sum(v * v), (x1,))

    # x-stage einsum from resident field layout
    NxT = jnp.ones((37, 42), jnp.float32)
    from l3ster_tpu.ops.lattice_sumfact import _PREC

    r["einsum czyx,xQ (resident)"] = timed(
        lambda v, t: jnp.einsum("czyx,xQ->czyQ", v, t, precision=_PREC), (xfield, NxT)
    )
    r["einsum x2 czyx,xQ (resident)"] = timed(
        lambda v, t: jnp.einsum("czyx,xQ->czyQ", v, t, precision=_PREC)
        + jnp.einsum("czyx,xQ->czyQ", v, t * 2.0, precision=_PREC),
        (xfield, NxT),
    )
    # y-stage from resident (c,z,y,Q)
    xq = jnp.ones((c, 37, 37, 42), jnp.float32)
    r["einsum y czyQ,yR->zcRQ"] = timed(
        lambda v, t: jnp.einsum("czyQ,yR->zcRQ", v, jnp.ones((37, 42), v.dtype), precision=_PREC),
        (xq, NxT),
    )
    print(json.dumps(r, indent=1))


if __name__ == "__main__":
    main()
