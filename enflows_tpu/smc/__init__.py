from .smc import (
    SMCState, SMCInfo, smc_sample, systematic_resample, log_ess,
    make_compute_next_beta, make_reweight_resample_mutate, make_tempered,
)
from .flow_transport import make_transport_fitter, default_template

__all__ = [
    "SMCState", "SMCInfo", "smc_sample", "systematic_resample", "log_ess",
    "make_compute_next_beta", "make_reweight_resample_mutate",
    "make_tempered",
    "make_transport_fitter", "default_template",
]
