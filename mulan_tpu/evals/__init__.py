from mulan_tpu.evals.vlb import eval_bpd_dense, eval_bpd_sparse
from mulan_tpu.evals.nll_ode import (eval_bpd_ode, make_ode_likelihood_fn,
                                     make_ode_sample_fn)

__all__ = ['eval_bpd_sparse', 'eval_bpd_dense', 'eval_bpd_ode',
           'make_ode_likelihood_fn', 'make_ode_sample_fn']
