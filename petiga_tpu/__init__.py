"""petiga_tpu — a TPU-native isogeometric-analysis framework.

The public API surface (the analog of the reference's ``petiga.h``,
include/petiga.h:1-60): function spaces (:class:`Axis`, :class:`Space`),
assembly drivers, stencil operators and their Pallas fast path, Krylov /
Newton / time-stepping solvers, preconditioners, distributed spaces over
a device mesh, I/O, and post-processing.

Quickstart::

    import jax.numpy as jnp
    from petiga_tpu import Axis, Space, assemble_system, cg

    sp = Space([Axis.uniform(p=2, nel=32)] * 2, dtype=jnp.float32)
    sp.set_boundary_value(0, 0, 0, 0.0)   # x-min face, field 0

    def laplace(pt, ctx):
        return pt.shape1 @ pt.shape1.T, pt.shape0

    A, b = assemble_system(sp, laplace)
    x, iters, res = cg(A.fast_operator(), b)
"""

from .core.axis import Axis
from .core.quadrature import Rule, gauss_legendre, gauss_lobatto
from .core.space import Space, BoundaryCondition
from .config import Options, bind_cli, print_info

from .assembly.assemble import (
    assemble_system,
    assemble_system_planes,
    assemble_separable_planes,
    assemble_matrix,
    assemble_vector,
    assemble_function,
    assemble_jacobian,
    compute_scalar,
    compute_error_norm,
    dirichlet_post_fix,
    stencil_of,
)
from .assembly.collocation import (
    assemble_collocation,
    assemble_collocation_function,
    assemble_collocation_jacobian,
)
from .assembly.point import Point
from .assembly.tabulation import validate_geometry

from .sparse.stencil import (
    Stencil,
    StencilMatrix,
    SymmetricStencilMatrix,
    stencil_apply,
)
from .sparse.pallas_spmv import PallasStencilOperator, pallas_matvec
from .sparse.matfree import MatFreeOperator, JacobianFreeOperator

from .solve.krylov import (
    cg,
    bicgstab,
    gmres,
    jacobi_preconditioner,
    block_jacobi_preconditioner,
)
from .solve.newton import newton, NewtonResult
from .solve.ts import (
    ThetaStepper,
    AlphaStepper,
    Alpha2Stepper,
    ExplicitStepper,
    integrate,
    integrate_adaptive,
)
from .solve.blockpc import ebe_preconditioner, bbb_preconditioner
from .solve.schwarz import (
    schwarz_preconditioner,
    schwarz_local_preconditioner,
)
from .solve.multigrid import (
    MGHierarchy,
    mg_preconditioner,
    mg_local_preconditioner,
)
from .solve.fieldsplit import (
    field_split,
    fieldsplit_preconditioner,
    fieldsplit_local_preconditioner,
)

from .parallel.dist import DistSpace, DistThetaStepper, DistAlphaStepper
from .parallel.partition import factor_grid

from .io.checkpoint import write_space, read_space, write_vec, read_vec
from .io.sharded import save_sharded, load_sharded
from .post.probe import Probe
from .post.sample import sample_grid, write_vts

from .utils import profiling

__all__ = [
    # spaces
    "Axis", "Rule", "gauss_legendre", "gauss_lobatto", "Space",
    "BoundaryCondition", "Options", "bind_cli", "print_info",
    # assembly
    "assemble_system", "assemble_system_planes",
    "assemble_separable_planes", "assemble_matrix", "assemble_vector",
    "assemble_function", "assemble_jacobian", "compute_scalar",
    "compute_error_norm", "dirichlet_post_fix", "stencil_of",
    "assemble_collocation",
    "assemble_collocation_function", "assemble_collocation_jacobian",
    "Point", "validate_geometry",
    # operators
    "Stencil", "StencilMatrix", "SymmetricStencilMatrix", "stencil_apply",
    "PallasStencilOperator", "pallas_matvec", "MatFreeOperator",
    "JacobianFreeOperator",
    # solvers
    "cg", "bicgstab", "gmres", "jacobi_preconditioner",
    "block_jacobi_preconditioner", "newton", "NewtonResult",
    "ThetaStepper", "AlphaStepper", "Alpha2Stepper", "ExplicitStepper",
    "integrate", "integrate_adaptive", "ebe_preconditioner",
    "bbb_preconditioner", "schwarz_preconditioner",
    "schwarz_local_preconditioner", "MGHierarchy",
    "mg_preconditioner", "mg_local_preconditioner", "field_split",
    "fieldsplit_preconditioner", "fieldsplit_local_preconditioner",
    # distributed
    "DistSpace", "DistThetaStepper", "DistAlphaStepper", "factor_grid",
    # io / post / utils
    "write_space", "read_space", "write_vec", "read_vec",
    "save_sharded", "load_sharded", "Probe",
    "sample_grid", "write_vts", "profiling",
]

__version__ = "0.2.0"
