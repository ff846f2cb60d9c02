from flamo_tpu.ops.solve import gauss_solve, closed_loop_solve
