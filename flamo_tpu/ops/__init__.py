from flamo_tpu.ops.solve import gauss_solve, closed_loop_solve
from flamo_tpu.ops.pallas_solve import (
    pallas_fdn_solve, pallas_fdn_tf, pallas_fdn_tf_mse, pallas_gauss_solve,
)
