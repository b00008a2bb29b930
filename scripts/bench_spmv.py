"""Compare XLA slot-loop SpMV vs Pallas stencil kernel on TPU (64^3 p=2)."""
import time, json
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from petiga_tpu.models.poisson import make_space, poisson_system
from petiga_tpu.assembly.assemble import assemble_system, stencil_of
from petiga_tpu.sparse.stencil import StencilMatrix
from petiga_tpu.sparse.pallas_spmv import PallasStencilOperator

NEL, P = 64, 2
sp = make_space(3, p=P, nel=NEL, dtype=jnp.float32)
st = stencil_of(sp)
def _asm():
    A, b = assemble_system(sp, poisson_system, {"c": 0.0, "k": 1.0}, chunk=32768)
    return A.data
A = StencilMatrix(st, jax.block_until_ready(jax.jit(_asm)()))
nnz = st.nnodes * st.K * 1.0

def timeit(f, x, n=50):
    @jax.jit
    def loop(x):
        def body(i, x):
            y = f(x)
            return y / jnp.sqrt(jnp.vdot(y, y))
        return jax.lax.fori_loop(0, n, body, x)
    jax.block_until_ready(loop(x))
    t0 = time.time(); jax.block_until_ready(loop(x)); return (time.time() - t0) / n

x = jnp.ones((st.nnodes, 1), jnp.float32)
t_xla = timeit(A.matvec, x)
op = PallasStencilOperator(A)
t_pal = timeit(op.matvec, x)
sol = nnz * 4 / 819e9
print(json.dumps({
    "t_xla_us": round(t_xla*1e6,1), "t_pallas_us": round(t_pal*1e6,1),
    "xla_roofline": round(sol/t_xla,3), "pallas_roofline": round(sol/t_pal,3),
    "xla_gflops": round(2*nnz/t_xla/1e9,1), "pallas_gflops": round(2*nnz/t_pal/1e9,1),
}))

# --- block (BSR) SpMV: 3D elasticity-style dof=3, p=1 (K=27, 243 planes)
from petiga_tpu.core.axis import Axis
from petiga_tpu.core.space import Space

spb = Space([Axis.uniform(p=1, nel=NEL) for _ in range(3)], dof=3,
            dtype=jnp.float32)

def block_form(pt, ctx):
    K = pt.shape1 @ pt.shape1.T
    C = jnp.eye(3) * 2.0 + 0.3
    return jnp.einsum("ij,ab->iajb", K, C), jnp.zeros((pt.nen, 3), jnp.float32)

def _asmb():
    Ab, _ = assemble_system(spb, block_form, apply_fix=False, chunk=32768)
    return Ab.data
Ab = StencilMatrix(stencil_of(spb), jax.block_until_ready(jax.jit(_asmb)()))
nnzb = Ab.stencil.nnodes * Ab.stencil.K * 9.0
xb = jnp.ones((Ab.stencil.nnodes, 3), jnp.float32)
tb_xla = timeit(Ab.matvec, xb)
opb = PallasStencilOperator(Ab)
assert opb.ok
tb_pal = timeit(opb.matvec, xb)
solb = nnzb * 4 / 819e9
print(json.dumps({
    "block": "dof3_p1", "t_xla_us": round(tb_xla*1e6,1),
    "t_pallas_us": round(tb_pal*1e6,1),
    "xla_roofline": round(solb/tb_xla,3),
    "pallas_roofline": round(solb/tb_pal,3),
    "pallas_gflops": round(2*nnzb/tb_pal/1e9,1),
}))
