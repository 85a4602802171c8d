"""TPU ops: on-device ODE solver and Pallas kernels."""
