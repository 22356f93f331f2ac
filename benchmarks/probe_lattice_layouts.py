"""Micro-benchmark: layout/precision variants of the lattice interp sweeps.

Times the 3D nodes->QP interpolation (the hot half of the LATTICE_SF apply)
in several layouts on the real TPU to pick the fastest:
  A. current: channel-last stacked tensor, einsum "zyxc,xQ->zyQc"
  B. channel-leading: "czyx,xQ->czyQ"
  C. per-channel loop: 4x "zyx,xQ->zyQ"
  D. variant B at Precision.HIGH (bf16_3x) instead of HIGHEST

Run: python benchmarks/probe_lattice_layouts.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

P = 6
NE = 6
QO = 22
Q1 = QO // 2 + 1
N1 = NE * P + 1
QA = NE * Q1
C = 4


def bench(fn, args, reps=30, chain=20):
    @jax.jit
    def chained(*a):
        def body(i, v):
            return fn(v, *a[1:])

        return jax.lax.fori_loop(0, chain, body, a[0])

    y = chained(*args)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = chained(*args)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / chain


def main():
    rng = np.random.default_rng(0)
    dt = jnp.float32
    Ng = jnp.asarray(rng.normal(size=(N1, QA)), dt)
    Dg = jnp.asarray(rng.normal(size=(N1, QA)), dt)

    H = jax.lax.Precision.HIGHEST
    HI = jax.lax.Precision.HIGH

    def interp_c_last(t, Ng, Dg, prec=H):
        ax = jnp.einsum("zyxc,xQ->zyQc", t, Ng, precision=prec)
        adx = jnp.einsum("zyxc,xQ->zyQc", t, Dg, precision=prec)
        b = jnp.einsum("zyQc,yR->zRQc", ax, Ng, precision=prec)
        bdy = jnp.einsum("zyQc,yR->zRQc", ax, Dg, precision=prec)
        bdx = jnp.einsum("zyQc,yR->zRQc", adx, Ng, precision=prec)
        v = jnp.einsum("zRQc,zS->SRQc", b, Ng, precision=prec)
        dz = jnp.einsum("zRQc,zS->SRQc", b, Dg, precision=prec)
        dy = jnp.einsum("zRQc,zS->SRQc", bdy, Ng, precision=prec)
        dx = jnp.einsum("zRQc,zS->SRQc", bdx, Ng, precision=prec)
        # fold back so the chained loop is shape-stable
        s = v + dz + dy + dx
        out = jnp.einsum("SRQc,QX->SRXc", s, Ng.T[:QA, :N1], precision=prec)
        out = jnp.einsum("SRXc,RY->SYXc", out, Ng.T[:QA, :N1], precision=prec)
        return jnp.einsum("SYXc,SZ->ZYXc", out, Ng.T[:QA, :N1], precision=prec)

    def interp_c_lead(t, Ng, Dg, prec=H):
        ax = jnp.einsum("czyx,xQ->czyQ", t, Ng, precision=prec)
        adx = jnp.einsum("czyx,xQ->czyQ", t, Dg, precision=prec)
        b = jnp.einsum("czyQ,yR->czRQ", ax, Ng, precision=prec)
        bdy = jnp.einsum("czyQ,yR->czRQ", ax, Dg, precision=prec)
        bdx = jnp.einsum("czyQ,yR->czRQ", adx, Ng, precision=prec)
        v = jnp.einsum("czRQ,zS->cSRQ", b, Ng, precision=prec)
        dz = jnp.einsum("czRQ,zS->cSRQ", b, Dg, precision=prec)
        dy = jnp.einsum("czRQ,zS->cSRQ", bdy, Ng, precision=prec)
        dx = jnp.einsum("czRQ,zS->cSRQ", bdx, Ng, precision=prec)
        s = v + dz + dy + dx
        out = jnp.einsum("cSRQ,QX->cSRX", s, Ng.T[:QA, :N1], precision=prec)
        out = jnp.einsum("cSRX,RY->cSYX", out, Ng.T[:QA, :N1], precision=prec)
        return jnp.einsum("cSYX,SZ->cZYX", out, Ng.T[:QA, :N1], precision=prec)

    t_last = jnp.asarray(rng.normal(size=(N1, N1, N1, C)), dt)
    t_lead = jnp.asarray(rng.normal(size=(C, N1, N1, N1)), dt)

    flops = 2 * (N1**3 * C) * QA / N1  # per first einsum, roughly; report ms only
    for name, fn, args in [
        ("A c-last HIGHEST", lambda t, Ng, Dg: interp_c_last(t, Ng, Dg, H), (t_last, Ng, Dg)),
        ("B c-lead HIGHEST", lambda t, Ng, Dg: interp_c_lead(t, Ng, Dg, H), (t_lead, Ng, Dg)),
        ("D c-lead HIGH", lambda t, Ng, Dg: interp_c_lead(t, Ng, Dg, HI), (t_lead, Ng, Dg)),
        ("E c-last HIGH", lambda t, Ng, Dg: interp_c_last(t, Ng, Dg, HI), (t_last, Ng, Dg)),
    ]:
        ms = bench(fn, args) * 1e3
        print(f"{name:>20}: {ms:8.3f} ms")
    print("device:", jax.devices()[0])


if __name__ == "__main__":
    main()
