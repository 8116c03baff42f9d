from .btridiag import (block_tridiag_cholesky, block_tridiag_logdet,
                       block_tridiag_solve, block_tridiag_solve_factored)
from .gp_prior import (gp_Q_inv, gp_prior_terms, gp_transition,
                       sample_gp_prior_trajs, straight_line_trajs)
from .gpmp2 import (GPMP2Params, GPMP2Result, gpmp2_init_trajs, gpmp2_solve,
                    gpmp2_solve_adaptive, gpmp2_solve_restarts, gpmp2_step)
from .chomp import CHOMPParams, CHOMPResult, chomp_solve
from .sampling import SGPMPParams, SGPMPResult, sgpmp_solve
from .mpc import MPCParams, MPCState, mpc_init, mpc_rollout, mpc_step
from .rrt import RRTConnectParams, rrt_connect
from .ee_goal import make_ee_goal_terms
from .btridiag_lanes import block_tridiag_solve_lanes
from .mpot import MPOTParams, MPOTResult, mpot_solve
from .hybrid import plan_hybrid
from .ilqr import ILQRParams, ILQRResult, ilqr_solve
