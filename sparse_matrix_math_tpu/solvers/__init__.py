from .api import SolverConfig, solve
from .bicg_symmetric import bicg_symmetric
from .block import MultiSolveResult, cg_multi
from .bicgstab import bicgstab
from .cg import cg, conjugate_gradient
from .cgs import cgs, conjugate_gradient_squared
from .chebyshev import chebyshev, lanczos_extremal
from .deflated import deflated_cg, lanczos_deflation_basis
from .df64 import DfSolveResult, bicgstab_df64, cg_df64
from .ir_df64 import bicgstab_ir_df64, cg_ir_df64
from .gmres import gmres
from .implicit import cg_solve
from .multigrid import PoissonMultigrid
from .pipelined import cg_pipelined
from .types import SolveResult, SolverStatus, resolve_max_iterations
