"""Phase-field crystal (6th-order) in mixed form — parity with
demo/PhaseFieldCrystal/Mixed222Stable.c: the PFC equation

  φ_t = Δμ,   μ = φ³ + (1-ε)φ + 2Δφ + Δ²φ

split into a dof=2 mixed system on C¹ periodic splines (the 4th-order
term handled by the symmetric ∫ΔN Δφ form)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.axis import Axis
from ..core.space import Space
from ..solve.ts import AlphaStepper, integrate

__all__ = ["ifunction", "make_space", "initial_condition", "run"]


def ifunction(pt, shift, Ve, t, Ue, ctx):
    eps = ctx.get("epsilon", 0.1)
    vals = pt.value(Ue)  # (φ, μ)
    phi, mu = vals
    phi_t = pt.value(Ve)[0]
    gphi = pt.grad(Ue)[0]
    gmu = pt.grad(Ue)[1]
    lap_phi = pt.del2(Ue)[0]
    N0, N1 = pt.shape0, pt.shape1
    lapN = jnp.trace(pt.shape2, axis1=-2, axis2=-1)
    # φ_t = Δμ  (weak: N φ_t + ∇N·∇μ = 0)
    R1 = N0 * phi_t + N1 @ gmu
    # μ = φ³ + (1-ε)φ + 2Δφ + Δ²φ
    # weak: N μ - N(φ³+(1-ε)φ) + 2∇N·∇φ - ΔN Δφ = 0
    R2 = (
        N0 * (mu - phi**3 - (1 - eps) * phi)
        + 2 * (N1 @ gphi)
        - lapN * lap_phi
    )
    return jnp.stack([R1, R2], axis=-1)


def make_space(nel=24, L=16 * np.pi, dtype=jnp.float64) -> Space:
    axes = [
        Axis.uniform(p=2, nel=nel, u0=0.0, u1=L, periodic=True)
        for _ in range(2)
    ]
    return Space(axes, dof=2, dtype=dtype, order=2)


def initial_condition(space, phibar=0.07, noise=0.02, seed=0):
    rng = np.random.default_rng(seed)
    phi = phibar + noise * (rng.random((space.nnodes, 1)) - 0.5)
    mu = np.zeros_like(phi)
    return jnp.asarray(np.concatenate([phi, mu], axis=1), space.dtype)


def run(space, U0, *, dt=0.1, nsteps=3, epsilon=0.25, newton_kw=None):
    st = AlphaStepper(
        space, ifunction, ctx={"epsilon": epsilon},
        newton_kw=newton_kw or dict(rtol=1e-6, linear_solver="bicgstab",
                                    maxit=15),
    )
    U, V = integrate(st, U0, 0.0, dt, nsteps)
    return U
